"""Collinearity / outlier diagnostics over merged feature tables —
the Spark recast of ``pliers/diagnostics/base.py:12-214``
(``correlation_matrix``, ``variance_inflation_factors``,
``mahalanobis_distances``, ``variances``).

Design: the feature count K is small (tens), the row count is huge
(10^12), so every diagnostic reduces to K² streaming aggregates
(corr/avg/stddev — one pass, map-side partial agg) followed by O(K³)
closed-form algebra. For K ≤ 3 the matrix algebra is inlined as column
expressions (fully JVM, DuckDB-oracle-able); for general K the K×K
moment matrix is collected (K² scalars — driver-trivial) and inverted
with numpy, then the per-row quadratic form is a column expression
again. Nothing per-row ever leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def feature_variances(df: DataFrame, feature_cols: list[str]) -> DataFrame:
    """Sample variance per feature column (diagnostics ``variances``) —
    single-row frame, one pass."""
    return df.agg(
        *[F.round(F.var_samp(c), 6).alias(f"var_{c}") for c in feature_cols]
    )


def vif3(df: DataFrame, c1: str, c2: str, c3: str) -> DataFrame:
    """Variance inflation factors for three features, closed form from
    the pairwise correlations: with correlation matrix R,
    VIF_i = R⁻¹[i,i]; for K=3,
    det(R) = 1 + 2·r12·r13·r23 − r12² − r13² − r23² and
    VIF_1 = (1 − r23²)/det (cyclic for the others). One streaming pass,
    no matrix library in the loop (``pliers/diagnostics``
    variance_inflation_factors parity)."""
    stats = df.agg(
        F.corr(c1, c2).alias("r12"),
        F.corr(c1, c3).alias("r13"),
        F.corr(c2, c3).alias("r23"),
    )
    r12, r13, r23 = F.col("r12"), F.col("r13"), F.col("r23")
    det = (
        F.lit(1.0)
        + F.lit(2.0) * r12 * r13 * r23
        - r12 * r12
        - r13 * r13
        - r23 * r23
    )
    return stats.select(
        F.round((F.lit(1.0) - r23 * r23) / det, 6).alias(f"vif_{c1}"),
        F.round((F.lit(1.0) - r13 * r13) / det, 6).alias(f"vif_{c2}"),
        F.round((F.lit(1.0) - r12 * r12) / det, 6).alias(f"vif_{c3}"),
    )


def eigen_diagnostics(spark, df: DataFrame, feature_cols: list[str]) -> DataFrame:
    """Eigenvalues of the feature correlation matrix + condition indices
    (``pliers/diagnostics/base.py:25-46`` ``eigenvalues`` /
    ``condition_indices`` — the reference's ``np.corrcoef`` +
    ``np.linalg.eigvals`` over the whole merged table).

    Scale shape: the row side is reduced to K·(K−1)/2 corr scalars in ONE
    streaming pass (map-side partial aggregation — no shuffle of rows,
    just a K²-scalar reduce); the K×K symmetric eigendecomposition is
    O(K³) driver-side numpy, which is the right split at 10^12 rows
    because K is tens. Output: K rows (rank, eigenvalue,
    condition_index), eigenvalues descending, condition index
    sqrt(λmax/λi) per the reference."""
    import numpy as np

    k = len(feature_cols)
    aggs = [
        F.corr(feature_cols[i], feature_cols[j]).alias(f"_r_{i}_{j}")
        for i in range(k)
        for j in range(i + 1, k)
    ]
    row = df.agg(*aggs).first()
    R = np.eye(k)
    for i in range(k):
        for j in range(i + 1, k):
            R[i, j] = R[j, i] = row[f"_r_{i}_{j}"]
    eig = np.linalg.eigvalsh(R)[::-1]
    emax = float(eig[0])
    rows = [
        (i + 1, round(float(e), 6), round(float(np.sqrt(emax / float(e))), 6))
        for i, e in enumerate(eig)
    ]
    return spark.createDataFrame(
        rows, "rank bigint, eigenvalue double, condition_index double"
    )


def mahalanobis2(
    df: DataFrame, key_cols: list[str], c1: str, c2: str, out_col: str = "mahalanobis"
) -> DataFrame:
    """Per-row Mahalanobis distance for a bivariate feature pair,
    closed form: with z_i = (x_i − μ_i)/σ_i and r = corr(x1, x2),
    d² = (z1² − 2·r·z1·z2 + z2²)/(1 − r²).

    Physical plan: one aggregate pass → 5 scalars → broadcast cross
    join (a 1-row build side) → per-row column expression. The
    reference collects the whole matrix into numpy
    (``pliers/diagnostics/base.py`` mahalanobis_distances); here the
    row side never moves."""
    stats = df.agg(
        F.avg(c1).alias("_m1"),
        F.stddev_samp(c1).alias("_s1"),
        F.avg(c2).alias("_m2"),
        F.stddev_samp(c2).alias("_s2"),
        F.corr(c1, c2).alias("_r"),
    )
    joined = df.crossJoin(F.broadcast(stats))
    z1 = (F.col(c1) - F.col("_m1")) / F.col("_s1")
    z2 = (F.col(c2) - F.col("_m2")) / F.col("_s2")
    r = F.col("_r")
    d2 = (z1 * z1 - F.lit(2.0) * r * z1 * z2 + z2 * z2) / (F.lit(1.0) - r * r)
    return joined.select(*key_cols, F.round(F.sqrt(d2), 6).alias(out_col))


def flag_features(
    df: DataFrame,
    feature_cols: list[str],
    var_threshold: float = 1e-6,
    corr_threshold: float = 0.95,
) -> DataFrame:
    """``Diagnostics.flag`` / ``flag_all`` (pliers/diagnostics/base.py:
    150-214): one row per feature with its sample variance, its max
    |correlation| against every other feature, and boolean flags
    (near-zero variance / collinear). One streaming pass computes all
    K + K·(K-1)/2 aggregates map-side; the K-row result is reshaped
    JVM-side with a stack() — no collect, no second scan."""
    aggs = [F.var_samp(c).alias(f"v_{c}") for c in feature_cols]
    pairs: dict[str, list[str]] = {c: [] for c in feature_cols}
    for i, a in enumerate(feature_cols):
        for b in feature_cols[i + 1 :]:
            # corr spelled as covar/(σa·σb) with try_divide: ANSI-safe
            # when a feature is constant (NULL, ignored by greatest)
            aggs.append(
                F.try_divide(
                    F.covar_samp(a, b), F.stddev_samp(a) * F.stddev_samp(b)
                ).alias(f"c_{a}__{b}")
            )
            pairs[a].append(f"c_{a}__{b}")
            pairs[b].append(f"c_{a}__{b}")
    stats = df.agg(*aggs)
    rows = []
    for c in feature_cols:
        max_corr = F.greatest(*[F.abs(F.col(p)) for p in pairs[c]]) if pairs[c] else F.lit(0.0)
        rows.append(
            F.struct(
                F.lit(c).alias("feature"),
                F.round(F.col(f"v_{c}"), 6).alias("variance"),
                F.round(max_corr, 6).alias("max_abs_corr"),
                (F.col(f"v_{c}") < var_threshold).alias("low_variance"),
                (max_corr > corr_threshold).alias("collinear"),
            )
        )
    return stats.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
