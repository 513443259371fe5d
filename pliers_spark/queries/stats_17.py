"""Registry module (split from the former queries.py monolith; same
@query/ORACLES contract as every sibling).

Queries: sign_test, ancova_adjusted, readability_panel, pacf_levinson,
    tail_dependence, rolling_regression, kalman_local_level, morans_i,
    dirichlet_mom, umass_coherence, shift_share, erlang_c,
    degroot_consensus, rbp_at_k, wig_qpp, map_at_k, rdd_sharp,
    event_study, poisson_mixture_em, harrells_c, ks_separation
"""
from __future__ import annotations

from ._registry import F, T, Window, _docs, _events, load_table, query
from pliers_spark.operators.census import census_collect
from .stats_09 import _dsg_graph_sql
from .stats_15 import _LL_GAP_S
from .stats_16 import _lnfact_spine_sql, _sign_sql



@query("sign_test", _sign_sql())
def q_sign_test(spark, sf_dir):
    """Exact sign test on week-over-week volume changes (Arbuthnott
    1710 — the oldest significance test; Conover §3.4): under no
    trend, positive and negative changes are Bin(n,½); the two-sided
    p sums all outcomes no more probable than the observed count —
    the assumption-free floor under `wilcoxon_signed` (which adds
    magnitude ranks) and `record_highs` (which tests a different
    exchangeability consequence). Binomial pmf values come from the
    shared ln-factorial spine quantized at 1e-12 so the ≤-observed
    tail is an exact integer selection; zero-differences drop per the
    classical procedure."""
    ev = _events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts")).cast("date")
    wi = F.floor(F.datediff(day, F.lit("2024-01-01").cast("date")) / 7).cast("long")
    wk = ev.groupBy(wi.alias("wi")).agg(F.count(F.lit(1)).cast("long").alias("x"))
    d = wk.select((F.col("x") - F.lag("x").over(Window.orderBy("wi"))).alias("dx")).where(
        F.col("dx").isNotNull()
    )
    s = d.agg(
        F.sum((F.col("dx") > 0).cast("int")).cast("long").alias("pos"),
        F.sum((F.col("dx") != 0).cast("int")).cast("long").alias("n"),
    ).collect()[0]
    n, pos = s.n, s.pos
    import math as _m

    def rnd(v):
        return int(_m.floor(v + 0.5)) if v >= 0 else -int(_m.floor(-v + 0.5))

    spine = spark.range(1, n + 1).select(F.col("id").alias("k"))
    lnf_df = spine.select(
        F.col("k").alias("x"),
        F.sum(F.log(F.col("k").cast("double"))).over(
            Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
        ).alias("lnf"),
    )
    lnf = {0: 0.0}
    for row in census_collect(lnf_df, 200_000, "ln-factorial spine (sign-change day grain)"):
        lnf[row.x] = row.lnf
    pmf = {
        k: rnd(1e12 * _m.exp(lnf[n] - lnf[k] - lnf[n - k] - n * _m.log(2.0)))
        for k in range(0, n + 1)
    }
    pa = pmf[pos]
    psum = sum(p for p in pmf.values() if p <= pa)
    return spark.createDataFrame(
        [(n, pos, round(psum / 1e12, 6))],
        "n_nonzero long, n_positive long, p_two_sided double",
    )



@query(
    "ancova_adjusted",
    """WITH u AS (
         SELECT (user_id % 2)::INT AS g,
                sum((event_type = 'click')::INT)::BIGINT AS x,
                sum((event_type = 'purchase')::INT)::BIGINT AS y
         FROM events GROUP BY user_id),
       gm AS (
         SELECT g, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                sum(x * x)::BIGINT AS sxx, sum(x * y)::BIGINT AS sxy,
                sum(y * y)::BIGINT AS syy
         FROM u GROUP BY g),
       w AS (
         SELECT sum(sxx - sx::DOUBLE * sx / n) AS wxx,
                sum(sxy - sx::DOUBLE * sy / n) AS wxy,
                sum(syy - sy::DOUBLE * sy / n) AS wyy,
                sum(n)::BIGINT AS nt, sum(sx)::BIGINT AS tx, sum(sy)::BIGINT AS ty,
                count(*)::BIGINT AS k
         FROM gm),
       b AS (SELECT wxy / wxx AS beta, nt, tx, ty, k, wyy, wxy, wxx FROM w),
       adj AS (
         SELECT gm.g, gm.n,
                round(gm.sy::DOUBLE / gm.n
                      - b.beta * (gm.sx::DOUBLE / gm.n - b.tx::DOUBLE / b.nt), 6) AS adj_mean,
                round(gm.sy::DOUBLE / gm.n, 6) AS raw_mean
         FROM gm, b),
       f AS (
         SELECT b.k, b.nt,
                ((SELECT sum(round(1e9 * gm.n
                     * ((gm.sy::DOUBLE / gm.n - b.ty::DOUBLE / b.nt)
                        - b.beta * (gm.sx::DOUBLE / gm.n - b.tx::DOUBLE / b.nt))
                     * ((gm.sy::DOUBLE / gm.n - b.ty::DOUBLE / b.nt)
                        - b.beta * (gm.sx::DOUBLE / gm.n - b.tx::DOUBLE / b.nt)), 0)::BIGINT)
                  FROM gm) / 1e9) AS ss_adj_between,
                (b.wyy - b.wxy * b.wxy / b.wxx) AS ss_within_adj
         FROM b)
       SELECT a.g AS grp, a.n, a.raw_mean, a.adj_mean,
              round((f.ss_adj_between / (f.k - 1))
                    / (f.ss_within_adj / (f.nt - f.k - 1)), 6) AS f_stat
       FROM adj a, f ORDER BY a.g""",
)
def q_ancova_adjusted(spark, sf_dir):
    """One-covariate ANCOVA of purchases by parity group adjusting for
    clicks (Fisher 1932; Huitema 2011): the pooled WITHIN-group slope
    removes the covariate's share of the group difference, reporting
    covariate-adjusted means alongside raw ones and the F for the
    adjusted group effect — the parametric regression-adjustment twin
    of `cuped_adjustment` (same algebra, CUPED frames it as variance
    reduction) and the honest version of comparing raw group means
    when covariates are imbalanced. Within-group sums of squares come
    from exact BIGINT moments; the adjusted between-group SS is
    1e-9-quantized per group. One census, 2-row tail."""
    ev = _events(spark, sf_dir)
    u = ev.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "click").cast("int")).cast("long").alias("x"),
        F.sum((F.col("event_type") == "purchase").cast("int")).cast("long").alias("y"),
    ).select((F.col("user_id") % 2).cast("int").alias("g"), "x", "y")
    gm = u.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    ).stableCheckpoint(eager=True)
    w = gm.agg(
        F.sum(F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / F.col("n")).alias("wxx"),
        F.sum(F.col("sxy") - F.col("sx").cast("double") * F.col("sy") / F.col("n")).alias("wxy"),
        F.sum(F.col("syy") - F.col("sy").cast("double") * F.col("sy") / F.col("n")).alias("wyy"),
        F.sum("n").cast("long").alias("nt"),
        F.sum("sx").cast("long").alias("tx"),
        F.sum("sy").cast("long").alias("ty"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    b = w.select((F.col("wxy") / F.col("wxx")).alias("beta"), "nt", "tx", "ty", "k", "wyy", "wxy", "wxx")
    gmb = gm.crossJoin(F.broadcast(b))
    dev = (
        (F.col("sy").cast("double") / F.col("n") - F.col("ty").cast("double") / F.col("nt"))
        - F.col("beta") * (F.col("sx").cast("double") / F.col("n") - F.col("tx").cast("double") / F.col("nt"))
    )
    ssb = gmb.agg(
        F.sum(F.round(F.lit(1e9) * F.col("n") * dev * dev, 0).cast("long")).cast("long").alias("ssb_fp")
    )
    adj = gmb.select(
        "g", "n",
        F.round(F.col("sy").cast("double") / F.col("n"), 6).alias("raw_mean"),
        F.round(
            F.col("sy").cast("double") / F.col("n")
            - F.col("beta") * (F.col("sx").cast("double") / F.col("n") - F.col("tx").cast("double") / F.col("nt")),
            6,
        ).alias("adj_mean"),
    )
    fstat = b.crossJoin(ssb).select(
        (
            (F.col("ssb_fp") / F.lit(1e9) / (F.col("k") - 1))
            / ((F.col("wyy") - F.col("wxy") * F.col("wxy") / F.col("wxx")) / (F.col("nt") - F.col("k") - 1))
        ).alias("f")
    )
    return adj.crossJoin(F.broadcast(fstat)).select(
        F.col("g").alias("grp"), "n", "raw_mean", "adj_mean",
        F.round(F.col("f"), 6).alias("f_stat"),
    ).orderBy("grp")



@query(
    "readability_panel",
    """WITH s AS (
         SELECT doc_id,
                length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 AS words,
                length(replace(trim(text), ' ', '')) AS chars,
                greatest(length(trim(text)) - length(replace(trim(text), 'the', 'th')), 1) AS sents_raw,
                len(list_filter(string_split(trim(text), ' '), t -> length(t) > 6)) AS longw
         FROM documents),
       m AS (
         SELECT doc_id, words::BIGINT AS w, chars::BIGINT AS c,
                (sents_raw)::BIGINT AS sents, longw::BIGINT AS lw
         FROM s WHERE words > 0)
       SELECT doc_id,
              round(4.71 * c / w + 0.5 * w / sents - 21.43, 6) AS ari,
              round(5.88 * (c::DOUBLE / w) - 29.6 * (sents::DOUBLE / w) - 15.8, 6) AS coleman_liau,
              round(w::DOUBLE / sents + 100.0 * lw / w, 6) AS lix
       FROM m""",
)
def q_readability_panel(spark, sf_dir):
    """Readability formula panel per document — ARI (Senter & Smith
    1967), Coleman-Liau (1975) and LIX (Björnsson 1968): three
    syllable-FREE indices (characters/word, words/sentence, long-word
    share) that complement the Flesch-Kincaid-style `readability`
    query without inheriting its syllable heuristic — on this corpus
    their DISAGREEMENT pattern is the diagnostic, since all three see
    the same two ratios through different weights. Sentence count
    reuses the deterministic 'the'-boundary convention (occurrences
    of 'the' + the final fragment); every input is an exact integer
    census column, each formula one rounded expression. Single
    codegen'd map over the corpus — no shuffle at all."""
    d = _docs(spark, sf_dir)
    txt = F.trim(F.col("text"))
    words = F.size(T.tokenize(F.col("text"))).cast("long")
    chars = F.length(F.regexp_replace(txt, " ", "")).cast("long")
    sents = F.greatest(
        F.length(txt) - F.length(F.regexp_replace(txt, "the", "th")), F.lit(1)
    ).cast("long")
    longw = F.size(F.filter(T.tokenize(F.col("text")), lambda t: F.length(t) > 6)).cast("long")
    m = d.select("doc_id", words.alias("w"), chars.alias("c"), sents.alias("sents"), longw.alias("lw")).where(
        F.col("w") > 0
    )
    return m.select(
        "doc_id",
        F.round(F.lit(4.71) * F.col("c") / F.col("w") + F.lit(0.5) * F.col("w") / F.col("sents") - F.lit(21.43), 6).alias("ari"),
        F.round(
            F.lit(5.88) * (F.col("c").cast("double") / F.col("w"))
            - F.lit(29.6) * (F.col("sents").cast("double") / F.col("w"))
            - F.lit(15.8),
            6,
        ).alias("coleman_liau"),
        F.round(F.col("w").cast("double") / F.col("sents") + F.lit(100.0) * F.col("lw") / F.col("w"), 6).alias("lix"),
    )



_PACF_MAXLAG = 5



def _pacf_dl_sql() -> str:
    # acf values r1..r5 (exact integer numerators over the common
    # denominator), then unrolled Durbin-Levinson with 1e-9 requantized
    # phi at every step
    acf_cols = ", ".join(
        f"""(SELECT round(sum((a.x * m.n - m.s1) * (b.x * m.n - m.s1))::DOUBLE
                   / (m.s2 * m.n - m.s1 * m.s1), 9)
            FROM idx a JOIN idx b ON b.t = a.t + {k}, mo m GROUP BY m.s2, m.n, m.s1) AS r{k}"""
        for k in range(1, _PACF_MAXLAG + 1)
    )
    # Durbin-Levinson unrolled via python-generated scalar expressions is
    # lengthy in SQL; instead each level is one CTE with phi columns.
    lines = [f"acf AS (SELECT {acf_cols})"]
    lines.append("""p1 AS (SELECT round(r1, 9) AS f11 FROM acf)""")
    # level 2
    lines.append("""p2 AS (
         SELECT round((acf.r2 - p1.f11 * acf.r1) / (1 - p1.f11 * acf.r1), 9) AS f22,
                round(p1.f11 - round((acf.r2 - p1.f11 * acf.r1)
                                     / (1 - p1.f11 * acf.r1), 9) * p1.f11, 9) AS f21
         FROM acf, p1)""")
    lines.append("""p3 AS (
         SELECT round((acf.r3 - (p2.f21 * acf.r2 + p2.f22 * acf.r1))
                      / (1 - (p2.f21 * acf.r1 + p2.f22 * acf.r2)), 9) AS f33,
                round(p2.f21 - round((acf.r3 - (p2.f21 * acf.r2 + p2.f22 * acf.r1))
                      / (1 - (p2.f21 * acf.r1 + p2.f22 * acf.r2)), 9) * p2.f22, 9) AS f31,
                round(p2.f22 - round((acf.r3 - (p2.f21 * acf.r2 + p2.f22 * acf.r1))
                      / (1 - (p2.f21 * acf.r1 + p2.f22 * acf.r2)), 9) * p2.f21, 9) AS f32
         FROM acf, p2)""")
    lines.append("""p4 AS (
         SELECT round((acf.r4 - (p3.f31 * acf.r3 + p3.f32 * acf.r2 + p3.f33 * acf.r1))
                      / (1 - (p3.f31 * acf.r1 + p3.f32 * acf.r2 + p3.f33 * acf.r3)), 9) AS f44,
                round(p3.f31 - round((acf.r4 - (p3.f31 * acf.r3 + p3.f32 * acf.r2 + p3.f33 * acf.r1))
                      / (1 - (p3.f31 * acf.r1 + p3.f32 * acf.r2 + p3.f33 * acf.r3)), 9) * p3.f33, 9) AS f41,
                round(p3.f32 - round((acf.r4 - (p3.f31 * acf.r3 + p3.f32 * acf.r2 + p3.f33 * acf.r1))
                      / (1 - (p3.f31 * acf.r1 + p3.f32 * acf.r2 + p3.f33 * acf.r3)), 9) * p3.f32, 9) AS f42,
                round(p3.f33 - round((acf.r4 - (p3.f31 * acf.r3 + p3.f32 * acf.r2 + p3.f33 * acf.r1))
                      / (1 - (p3.f31 * acf.r1 + p3.f32 * acf.r2 + p3.f33 * acf.r3)), 9) * p3.f31, 9) AS f43
         FROM acf, p3)""")
    lines.append("""p5 AS (
         SELECT round((acf.r5 - (p4.f41 * acf.r4 + p4.f42 * acf.r3 + p4.f43 * acf.r2 + p4.f44 * acf.r1))
                      / (1 - (p4.f41 * acf.r1 + p4.f42 * acf.r2 + p4.f43 * acf.r3 + p4.f44 * acf.r4)), 9) AS f55
         FROM acf, p4)""")
    joined = ",\n       ".join(lines)
    return f"""WITH daily AS (
         SELECT datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE)::BIGINT AS dd,
                count(*)::BIGINT AS x
         FROM events GROUP BY dd),
       idx AS (SELECT row_number() OVER (ORDER BY dd)::BIGINT AS t, x FROM daily),
       mo AS (
         SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS s1, sum(x * x)::BIGINT AS s2
         FROM idx),
       {joined}
       SELECT 1::BIGINT AS lag, round(p1.f11, 6) AS pacf FROM p1
       UNION ALL SELECT 2, round(p2.f22, 6) FROM p2
       UNION ALL SELECT 3, round(p3.f33, 6) FROM p3
       UNION ALL SELECT 4, round(p4.f44, 6) FROM p4
       UNION ALL SELECT 5, round(p5.f55, 6) FROM p5
       ORDER BY lag"""



@query("pacf_levinson", _pacf_dl_sql())
def q_pacf_levinson(spark, sf_dir):
    """Partial autocorrelations at lags 1-5 by the Durbin-Levinson
    recursion (Durbin, Biometrika 1960): φ_kk = (r_k − Σφ_{k−1,j}
    r_{k−j})/(1 − Σφ_{k−1,j} r_j) with coefficient downdating — the
    AR-order diagnostic (last significant PACF lag ≈ AR order) that
    extends `pacf_lag2`'s closed form to the depth `acf_bartlett`
    covers for the plain ACF. Inputs are the exact n-scaled acf
    ratios rounded ONCE to 9 dp; every Levinson iterate is
    re-rounded to 9 dp after each division/downdate, so both engines
    walk one decimal trajectory (the oracle unrolls all five levels
    as single-row CTEs; Spark runs the same recursion driver-side on
    the aggregate-grain acf row, like `holt_linear`). Day census,
    5-lag join, constant tail."""
    ev = _events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts")).cast("date")
    dd = F.datediff(day, F.lit("2024-01-01").cast("date")).cast("long")
    daily = ev.groupBy(dd.alias("dd")).agg(F.count(F.lit(1)).cast("long").alias("x"))
    idx = daily.select(F.row_number().over(Window.orderBy("dd")).cast("long").alias("t"), "x").stableCheckpoint(eager=True)
    mo = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"),
    ).collect()[0]
    n, s1, s2 = mo.n, mo.s1, mo.s2
    a, b = idx.alias("a"), idx.alias("b")
    rs = {}
    for k in range(1, _PACF_MAXLAG + 1):
        num = (
            a.join(b, F.col("b.t") == F.col("a.t") + k)
            .agg(F.sum((F.col("a.x") * n - s1) * (F.col("b.x") * n - s1)).cast("long").alias("sxy"))
            .collect()[0].sxy
        )
        rs[k] = round(num / (s2 * n - s1 * s1), 9)
    phi = {1: {1: round(rs[1], 9)}}
    for k in range(2, _PACF_MAXLAG + 1):
        num = rs[k] - sum(phi[k - 1][j] * rs[k - j] for j in range(1, k))
        den = 1 - sum(phi[k - 1][j] * rs[j] for j in range(1, k))
        fkk = round(num / den, 9)
        phi[k] = {k: fkk}
        for j in range(1, k):
            phi[k][j] = round(phi[k - 1][j] - fkk * phi[k - 1][k - j], 9)
    rows = [(k, round(phi[k][k], 6)) for k in range(1, _PACF_MAXLAG + 1)]
    return spark.createDataFrame(rows, "lag long, pacf double").orderBy("lag")



@query(
    "tail_dependence",
    """WITH u AS (
         SELECT user_id,
                sum((event_type = 'click')::INT)::BIGINT AS x,
                sum((event_type = 'purchase')::INT)::BIGINT AS y
         FROM events GROUP BY user_id),
       qx AS (
         SELECT x AS q FROM (
           SELECT x, row_number() OVER (ORDER BY x, user_id) AS rn, count(*) OVER () AS n
           FROM u) WHERE rn = (9 * n + 9) // 10),
       qy AS (
         SELECT y AS q FROM (
           SELECT y, row_number() OVER (ORDER BY y, user_id) AS rn, count(*) OVER () AS n
           FROM u) WHERE rn = (9 * n + 9) // 10),
       c AS (
         SELECT count(*)::BIGINT AS n,
                sum((x > (SELECT q FROM qx))::INT)::BIGINT AS nx,
                sum((y > (SELECT q FROM qy))::INT)::BIGINT AS ny,
                sum((x > (SELECT q FROM qx) AND y > (SELECT q FROM qy))::INT)::BIGINT AS nboth,
                sum((x <= (SELECT q FROM qx) AND y <= (SELECT q FROM qy))::INT)::BIGINT AS nneither
         FROM u)
       SELECT n AS n_users, nx, ny, nboth,
              round(nboth::DOUBLE / nx, 6) AS lambda_upper,
              round(nboth::DOUBLE / (nx::DOUBLE * ny / n), 6) AS lift_vs_independent,
              round(2.0 - (1.0 - nneither::DOUBLE / n) / (1.0 - 0.9), 6) AS lambda_u_copula
       FROM c""",
)
def q_tail_dependence(spark, sf_dir):
    """Empirical upper-tail dependence between per-user clicks and
    purchases at the P90 thresholds (Joe, 'Multivariate Models' 1997
    §2.1.10): λ_U ≈ P(Y>q_y | X>q_x), its lift against independence,
    and the copula-form estimator 2 − (1−C(u,u))/(1−u) at u=0.9 —
    the EXTREME-co-movement question that correlation-family
    measures (`blomqvist_beta` at the median, `spearman_rho` overall)
    cannot answer: whether heavy CLICK users are also heavy BUYERS in
    the tail specifically. Thresholds are deterministic order
    statistics; the quadrant census is one exact integer pass."""
    ev = _events(spark, sf_dir)
    u = ev.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "click").cast("int")).cast("long").alias("x"),
        F.sum((F.col("event_type") == "purchase").cast("int")).cast("long").alias("y"),
    ).stableCheckpoint(eager=True)

    # CENSUS GRAIN (r4): the p90 order statistic is the least census
    # value whose cumulative count reaches ⌊(9n+9)/10⌋
    # (operators/census.py) — no global rank window over users.
    from pliers_spark.operators.census import with_census_ranks

    un = u.agg(F.count(F.lit(1)).alias("n"))

    def q90(col):
        cells = with_census_ranks(
            u.groupBy(col).agg(F.count(F.lit(1)).alias("cnt")), col, le="cum_le"
        )
        return (
            cells.crossJoin(F.broadcast(un))
            .where(F.col("cum_le") >= F.floor((9 * F.col("n") + 9) / 10))
            .agg(F.min(col).alias(f"q{col}"))
        )

    c = (
        u.crossJoin(F.broadcast(q90("x")))
        .crossJoin(F.broadcast(q90("y")))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum((F.col("x") > F.col("qx")).cast("int")).cast("long").alias("nx"),
            F.sum((F.col("y") > F.col("qy")).cast("int")).cast("long").alias("ny"),
            F.sum(((F.col("x") > F.col("qx")) & (F.col("y") > F.col("qy"))).cast("int")).cast("long").alias("nboth"),
            F.sum(((F.col("x") <= F.col("qx")) & (F.col("y") <= F.col("qy"))).cast("int")).cast("long").alias("nneither"),
        )
    )
    return c.select(
        F.col("n").alias("n_users"), "nx", "ny", "nboth",
        F.round(F.col("nboth").cast("double") / F.col("nx"), 6).alias("lambda_upper"),
        F.round(F.col("nboth").cast("double") / (F.col("nx").cast("double") * F.col("ny") / F.col("n")), 6).alias("lift_vs_independent"),
        F.round(F.lit(2.0) - (F.lit(1.0) - F.col("nneither").cast("double") / F.col("n")) / F.lit(0.1), 6).alias("lambda_u_copula"),
    )



_ROLLREG_W = 14



@query(
    "rolling_regression",
    f"""WITH daily AS (
         SELECT datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE)::BIGINT AS dd,
                sum((event_type = 'click')::INT)::BIGINT AS x,
                sum((event_type = 'purchase')::INT)::BIGINT AS y
         FROM events GROUP BY dd),
       w AS (
         SELECT dd, x, y,
                count(*) OVER win::BIGINT AS n,
                sum(x) OVER win::BIGINT AS sx, sum(y) OVER win::BIGINT AS sy,
                sum(x * y) OVER win::BIGINT AS sxy, sum(x * x) OVER win::BIGINT AS sxx
         FROM daily
         WINDOW win AS (ORDER BY dd ROWS BETWEEN {_ROLLREG_W - 1} PRECEDING AND CURRENT ROW))
       SELECT dd, n AS window_days,
              round((n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx), 6) AS beta,
              round((sy::DOUBLE - (n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx) * sx) / n, 6)
                + 0.0 AS alpha
       FROM w WHERE n = {_ROLLREG_W} AND n * sxx - sx * sx != 0
       ORDER BY dd""",
)
def q_rolling_regression(spark, sf_dir):
    """Rolling 14-day OLS of daily purchases on daily clicks — the
    time-varying-coefficient view (per-window beta/alpha) that a
    single global slope (`trend_slope`, `granger_lag1`) averages
    away: conversion-efficiency DRIFT is the feature, and this is the
    standard features-over-windows shape of the north rule (lag/lead,
    rolling) applied to a model coefficient rather than a moment. All
    five regression sums ride ONE window specification (full windows
    only, degenerate-variance windows excluded identically on both
    engines), so each day's slope is a closed form of exact int64
    window sums; signed-zero intercepts normalize via +0.0. Day
    census, one windowed pass."""
    ev = _events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts")).cast("date")
    dd = F.datediff(day, F.lit("2024-01-01").cast("date")).cast("long")
    daily = ev.groupBy(dd.alias("dd")).agg(
        F.sum((F.col("event_type") == "click").cast("int")).cast("long").alias("x"),
        F.sum((F.col("event_type") == "purchase").cast("int")).cast("long").alias("y"),
    )
    win = Window.orderBy("dd").rowsBetween(-(_ROLLREG_W - 1), 0)
    w = daily.select(
        "dd",
        F.count(F.lit(1)).over(win).cast("long").alias("n"),
        F.sum("x").over(win).cast("long").alias("sx"),
        F.sum("y").over(win).cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(win).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(win).cast("long").alias("sxx"),
    )
    beta = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return (
        w.where((F.col("n") == _ROLLREG_W) & (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") != 0))
        .select(
            "dd", F.col("n").alias("window_days"),
            F.round(beta, 6).alias("beta"),
            (F.round((F.col("sy").cast("double") - beta * F.col("sx")) / F.col("n"), 6) + F.lit(0.0)).alias("alpha"),
        )
        .orderBy("dd")
    )



_KAL_Q = 100.0   # process noise (counts^2/day)

_KAL_R = 2500.0  # observation noise



def _kalman_sql() -> str:
    q, r = _KAL_Q, _KAL_R
    return f"""WITH daily AS (
         SELECT datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE)::BIGINT AS dd,
                count(*)::BIGINT AS y
         FROM events GROUP BY dd),
       s AS (
         SELECT row_number() OVER (ORDER BY dd)::BIGINT AS t, dd, y,
                count(*) OVER () AS n
         FROM daily),
       rec AS (
         WITH RECURSIVE kf(t, xf, pf) AS (
           SELECT 1::BIGINT,
                  (SELECT y * 1000000 FROM s WHERE t = 1),
                  CAST({r} * 1000000 AS BIGINT)
           UNION ALL
           SELECT kf.t + 1,
                  CAST(round(kf.xf + (kf.pf + {q}e6) / (kf.pf + {q}e6 + {r}e6)
                             * (sx.y * 1000000 - kf.xf)) AS BIGINT),
                  CAST(round((kf.pf + {q}e6) * {r}e6 / (kf.pf + {q}e6 + {r}e6)) AS BIGINT)
           FROM kf JOIN s sx ON sx.t = kf.t + 1
           WHERE kf.t < (SELECT max(n) FROM s))
         SELECT * FROM kf)
       SELECT s.dd, s.y,
              round(rec.xf / 1e6, 6) AS level,
              round(rec.pf / 1e6, 6) AS variance,
              round((rec.pf / 1e6 + {q}) / (rec.pf / 1e6 + {q} + {r}), 6) AS next_gain
       FROM rec JOIN s ON s.t = rec.t
       ORDER BY s.dd"""



@query("kalman_local_level", _kalman_sql())
def q_kalman_local_level(spark, sf_dir):
    """Kalman filter for the local-level model on daily volume (Kalman
    1960; Durbin & Koopman §2.2): x̂_t = x̂ + K_t(y_t − x̂) with the
    gain K = (P+q)/(P+q+r) adapting as the state variance P converges
    to its Riccati fixed point — the OPTIMALLY-weighted version of the
    constant-gain smoothers (`ewma_smooth` is this filter with K
    frozen; `holt_linear` adds a trend state but fixes both gains).
    Fixed q/r in micro-units, state and variance micro-int-rounded
    every step, so the recursion is bit-identical between the Spark
    driver DP over the aggregate-grain day series and the oracle's
    recursive CTE. Emits the filtered level, variance, and the
    converging gain."""
    import math as _m

    ev = _events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts")).cast("date")
    dd = F.datediff(day, F.lit("2024-01-01").cast("date")).cast("long")
    daily = ev.groupBy(dd.alias("dd")).agg(F.count(F.lit(1)).cast("long").alias("y"))
    rows = sorted(census_collect(daily, 200_000, "daily census"), key=lambda r: r.dd)

    def rnd(v):
        return int(_m.floor(v + 0.5)) if v >= 0 else -int(_m.floor(-v + 0.5))

    q6, r6 = _KAL_Q * 1e6, _KAL_R * 1e6
    out = []
    xf = rows[0].y * 1000000
    pf = int(_KAL_R * 1e6)
    out.append((rows[0].dd, rows[0].y, round(xf / 1e6, 6), round(pf / 1e6, 6),
                round((pf / 1e6 + _KAL_Q) / (pf / 1e6 + _KAL_Q + _KAL_R), 6)))
    for rrow in rows[1:]:
        gain = (pf + q6) / (pf + q6 + r6)
        xf = rnd(xf + gain * (rrow.y * 1000000 - xf))
        pf = rnd((pf + q6) * r6 / (pf + q6 + r6))
        out.append((rrow.dd, rrow.y, round(xf / 1e6, 6), round(pf / 1e6, 6),
                    round((pf / 1e6 + _KAL_Q) / (pf / 1e6 + _KAL_Q + _KAL_R), 6)))
    return spark.createDataFrame(
        out, "dd long, y long, level double, variance double, next_gain double"
    ).orderBy("dd")



@query(
    "morans_i",
    """WITH grid AS (
         SELECT (datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE) % 7)::BIGINT AS wd,
                (datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE) // 7)::BIGINT AS wi,
                count(*)::BIGINT AS x
         FROM events GROUP BY wd, wi),
       mo AS (
         SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS s1, sum(x * x)::BIGINT AS s2
         FROM grid),
       e AS (
         SELECT a.x AS xa, b.x AS xb
         FROM grid a JOIN grid b
           ON abs(a.wd - b.wd) + abs(a.wi - b.wi) = 1),
       cross_t AS (
         SELECT count(*)::BIGINT AS w,
                sum((xa * m.n - m.s1) * (xb * m.n - m.s1))::BIGINT AS sc,
                sum((xa - xb) * (xa - xb))::BIGINT AS sg
         FROM e, mo m GROUP BY m.n, m.s1)
       SELECT m.n AS n_cells, c.w AS n_joins,
              round(m.n::DOUBLE * c.sc
                    / (c.w::DOUBLE * (m.s2 * m.n - m.s1 * m.s1)), 6) AS morans_i,
              round(-1.0 / (m.n - 1), 6) AS e_i,
              round((m.n - 1.0) * m.n * c.sg
                    / (2.0 * c.w * (m.s2 * m.n - m.s1 * m.s1) / m.n), 6) AS gearys_c
       FROM mo m, cross_t c""",
)
def q_morans_i(spark, sf_dir):
    """Moran's I and Geary's C spatial autocorrelation on the
    weekday × week grid with rook adjacency (Moran, Biometrika 1950;
    Geary 1954): I measures global co-variation of neighboring cells
    (adjacent weekday same week, same weekday adjacent week) around
    E[I] = −1/(n−1), while C is locally dominated — their divergence
    flags hot-spot vs gradient structure, the 2-D counterpart of what
    `autocorr_lag1` and `weekly_user_overlap` each see in one
    dimension only. Centering uses the n-scaled integer identity
    (x·n − Σx), so both cross-product sums are exact int64 over the
    symmetric rook join; each statistic is one closed ratio. Day
    census, then the ≤4-neighbor grid join."""
    ev = _events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts")).cast("date")
    dd = F.datediff(day, F.lit("2024-01-01").cast("date")).cast("long")
    grid = ev.groupBy((dd % 7).alias("wd"), F.floor(dd / 7).cast("long").alias("wi")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    ).stableCheckpoint(eager=True)
    mo = grid.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"),
    )
    a, b = grid.alias("a"), grid.alias("b")
    e = a.join(
        b,
        F.abs(F.col("a.wd") - F.col("b.wd")) + F.abs(F.col("a.wi") - F.col("b.wi")) == 1,
    ).select(F.col("a.x").alias("xa"), F.col("b.x").alias("xb"))
    ct = e.crossJoin(F.broadcast(mo)).groupBy("n", "s1").agg(
        F.count(F.lit(1)).cast("long").alias("w"),
        F.sum((F.col("xa") * F.col("n") - F.col("s1")) * (F.col("xb") * F.col("n") - F.col("s1"))).cast("long").alias("sc"),
        F.sum((F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))).cast("long").alias("sg"),
    )
    return ct.crossJoin(F.broadcast(mo.select("s2"))).select(
        F.col("n").alias("n_cells"), F.col("w").alias("n_joins"),
        F.round(
            F.col("n").cast("double") * F.col("sc")
            / (F.col("w").cast("double") * (F.col("s2") * F.col("n") - F.col("s1") * F.col("s1"))),
            6,
        ).alias("morans_i"),
        F.round(F.lit(-1.0) / (F.col("n") - 1), 6).alias("e_i"),
        F.round(
            (F.col("n") - F.lit(1.0)) * F.col("n") * F.col("sg")
            / (F.lit(2.0) * F.col("w") * (F.col("s2") * F.col("n") - F.col("s1") * F.col("s1")) / F.col("n")),
            6,
        ).alias("gearys_c"),
    )



@query(
    "dirichlet_mom",
    """WITH u AS (
         SELECT user_id, event_type, count(*)::BIGINT AS c,
                sum(count(*)) OVER (PARTITION BY user_id)::BIGINT AS tot
         FROM events GROUP BY user_id, event_type),
       sh AS (
         SELECT event_type,
                count(*)::BIGINT AS n,
                sum(round(1e9 * c::DOUBLE / tot, 0)::BIGINT)::BIGINT AS sp_fp,
                sum(round(1e9 * (c::DOUBLE / tot) * (c::DOUBLE / tot), 0)::BIGINT)::BIGINT AS sp2_fp
         FROM u GROUP BY event_type),
       m AS (
         SELECT event_type, n,
                sp_fp::DOUBLE / (n * 1e9) AS p,
                (sp2_fp::DOUBLE / 1e9 - (sp_fp::DOUBLE / 1e9) * sp_fp / (n * 1e9)) / (n - 1) AS v
         FROM sh),
       a0 AS (
         SELECT sum(round(1e9 * (p * (1 - p) / v - 1), 0)::BIGINT)::BIGINT AS sa_fp,
                count(*)::BIGINT AS k
         FROM m WHERE v > 0)
       SELECT m.event_type, m.n AS n_users,
              round(m.p, 6) AS mean_share,
              round(m.v, 6) AS share_variance,
              round((SELECT sa_fp::DOUBLE / (k * 1e9) FROM a0), 6) AS alpha0,
              round(m.p * (SELECT sa_fp::DOUBLE / (k * 1e9) FROM a0), 6) AS alpha_k
       FROM m ORDER BY m.event_type""",
)
def q_dirichlet_mom(spark, sf_dir):
    """Dirichlet-multinomial fit of per-user event-type mixes by the
    method of moments (Mosimann, Biometrika 1962): each type's
    cross-user share variance implies a concentration α₀ via
    Var(p) = p(1−p)/(α₀+1), averaged over types, giving the
    overdispersion verdict a plain multinomial can't express — small
    α₀ = users have strongly INDIVIDUAL mixes (the personalization
    signal), large α₀ = everyone samples one global mix; α_k = p̄_k·α₀
    are the pseudo-count priors `dictionary_lookup`-style smoothing
    would use. Per-user shares and their squares are 1e-9-quantized
    before cross-user sums, so moments are exact int64; α₀ averages
    the per-type estimates with positive variance."""
    ev = _events(spark, sf_dir)
    wt = Window.partitionBy("user_id")
    u = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).cast("long").alias("c")).select(
        "user_id", "event_type", "c", F.sum("c").over(wt).cast("long").alias("tot")
    )
    p = F.col("c").cast("double") / F.col("tot")
    sh = u.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.lit(1e9) * p, 0).cast("long")).cast("long").alias("sp_fp"),
        F.sum(F.round(F.lit(1e9) * p * p, 0).cast("long")).cast("long").alias("sp2_fp"),
    )
    m = sh.select(
        "event_type", "n",
        (F.col("sp_fp").cast("double") / (F.col("n") * F.lit(1e9))).alias("p"),
        (
            (F.col("sp2_fp").cast("double") / F.lit(1e9) - (F.col("sp_fp").cast("double") / F.lit(1e9)) * F.col("sp_fp") / (F.col("n") * F.lit(1e9)))
            / (F.col("n") - 1)
        ).alias("v"),
    ).stableCheckpoint(eager=True)
    a0 = m.where(F.col("v") > 0).agg(
        F.sum(F.round(F.lit(1e9) * (F.col("p") * (1 - F.col("p")) / F.col("v") - 1), 0).cast("long")).cast("long").alias("sa_fp"),
        F.count(F.lit(1)).cast("long").alias("k"),
    ).select((F.col("sa_fp").cast("double") / (F.col("k") * F.lit(1e9))).alias("alpha0"))
    return m.crossJoin(F.broadcast(a0)).select(
        "event_type", F.col("n").alias("n_users"),
        F.round(F.col("p"), 6).alias("mean_share"),
        F.round(F.col("v"), 6).alias("share_variance"),
        F.round(F.col("alpha0"), 6).alias("alpha0"),
        F.round(F.col("p") * F.col("alpha0"), 6).alias("alpha_k"),
    ).orderBy("event_type")



_UMASS_TOPN = 10



def _umass_sql(top_n: int = _UMASS_TOPN) -> str:
    return f"""WITH dt AS (
         SELECT DISTINCT doc_id, t AS token
         FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM documents)),
       df AS (SELECT token, count(*)::BIGINT AS d FROM dt GROUP BY token),
       st AS (
         SELECT d.source, dt.token, count(*)::BIGINT AS c
         FROM dt JOIN documents d USING (doc_id) GROUP BY 1, 2),
       topn AS (
         SELECT source, token, rn FROM (
           SELECT source, token, row_number() OVER (
             PARTITION BY source ORDER BY c DESC, token) AS rn
           FROM st) WHERE rn <= {top_n}),
       co AS (
         SELECT a.source, a.token AS wi, b.token AS wj,
                (SELECT count(*) FROM
                  (SELECT doc_id FROM dt WHERE token = a.token
                   INTERSECT
                   SELECT doc_id FROM dt WHERE token = b.token))::BIGINT AS dij
         FROM topn a JOIN topn b
           ON a.source = b.source AND a.rn < b.rn),
       terms AS (
         SELECT co.source,
                round(1e9 * ln((co.dij + 1.0) / df.d), 0)::BIGINT AS t_fp
         FROM co JOIN df ON df.token = co.wj)
       SELECT source, count(*)::BIGINT AS n_pairs,
              round(sum(t_fp) / (count(*) * 1e9), 6) AS umass_coherence
       FROM terms GROUP BY source ORDER BY source"""



@query("umass_coherence", _umass_sql())
def q_umass_coherence(spark, sf_dir):
    """UMass topic coherence of each source's top-10 terms (Mimno et
    al., EMNLP 2011): mean over ordered term pairs of
    ln((D(w_i,w_j)+1)/D(w_j)) — the intrinsic does-this-term-set-
    hang-together score that made LDA evaluation tractable, here
    scoring the per-source term profiles that `ctfidf_terms` /
    `dunning_keyness` extract (incoherent top terms = the source is a
    topical mixture). Document frequencies and co-document counts are
    exact censuses over the distinct (doc, token) incidence; each
    pair's log ratio is 1e-9-quantized before the per-source mean.
    Pair counting joins the 10-term lists against the incidence list
    — the corpus is scanned once."""
    d = _docs(spark, sf_dir)
    dt = d.select("doc_id", F.explode(T.tokenize(F.col("text"))).alias("token")).distinct().stableCheckpoint(eager=True)
    df_ = dt.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("d"))
    st = dt.join(d.select("doc_id", "source"), "doc_id").groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wtop = Window.partitionBy("source").orderBy(F.col("c").desc(), "token")
    topn = st.select("source", "token", F.row_number().over(wtop).alias("rn")).where(
        F.col("rn") <= _UMASS_TOPN
    ).stableCheckpoint(eager=True)
    a = topn.select("source", F.col("token").alias("wi"), F.col("rn").alias("ri"))
    b = topn.select(F.col("source").alias("sb"), F.col("token").alias("wj"), F.col("rn").alias("rj"))
    pairs = a.join(b, (F.col("source") == F.col("sb")) & (F.col("ri") < F.col("rj"))).select(
        "source", "wi", "wj"
    )
    dti = dt.select(F.col("doc_id").alias("di"), F.col("token").alias("wi"))
    dtj = dt.select(F.col("doc_id").alias("dj"), F.col("token").alias("wj"))
    co = (
        pairs.join(dti, "wi")
        .join(dtj, (F.col("dj") == F.col("di")) & (dtj["wj"] == pairs["wj"]))
        .groupBy("source", "wi", pairs["wj"].alias("wj"))
        .agg(F.count(F.lit(1)).cast("long").alias("dij"))
    )
    co_full = pairs.join(co, ["source", "wi", "wj"], "left").select(
        "source", "wj", F.coalesce(F.col("dij"), F.lit(0)).cast("long").alias("dij")
    )
    terms = co_full.join(df_.withColumnRenamed("token", "wj"), "wj").select(
        "source",
        F.round(F.lit(1e9) * F.log((F.col("dij") + F.lit(1.0)) / F.col("d")), 0).cast("long").alias("t_fp"),
    )
    return terms.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.sum("t_fp") / (F.count(F.lit(1)) * F.lit(1e9)), 6).alias("umass_coherence"),
    ).orderBy("source")



@query(
    "shift_share",
    """WITH bounds AS (
         SELECT (min(datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE))
                 + max(datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE)) + 1) // 2 AS mid
         FROM events),
       cell AS (
         SELECT d.source,
                sum((datediff('day', DATE '2024-01-01', date_trunc('day', e.ts)::DATE)
                     < (SELECT mid FROM bounds))::INT)::BIGINT AS e0,
                sum((datediff('day', DATE '2024-01-01', date_trunc('day', e.ts)::DATE)
                     >= (SELECT mid FROM bounds))::INT)::BIGINT AS e1
         FROM events e JOIN documents d ON d.doc_id = e.event_id % (SELECT count(*) FROM documents)
         GROUP BY d.source),
       tot AS (SELECT sum(e0)::BIGINT AS t0, sum(e1)::BIGINT AS t1 FROM cell)
       SELECT c.source, c.e0, c.e1,
              (c.e1 - c.e0)::BIGINT AS actual_change,
              round(c.e0 * (t.t1 - t.t0)::DOUBLE / t.t0, 6) AS national_effect,
              round(c.e1 - c.e0 - c.e0 * (t.t1 - t.t0)::DOUBLE / t.t0, 6) AS competitive_effect
       FROM cell c, tot t ORDER BY c.source""",
)
def q_shift_share(spark, sf_dir):
    """Shift-share decomposition of first-half → second-half volume
    change per source (Dunn, Papers Reg. Sci. 1960): each slice's
    actual change splits into the NATIONAL effect (what it would have
    gained growing at the overall rate) and the COMPETITIVE residual
    (its own out/under-performance) — the attribution arithmetic
    behind every 'which segment drove the change' dashboard, and the
    additive complement of `share_shift` (which reports mix shares,
    not growth attribution). The source dimension attaches through
    the deterministic event→doc hash used across the curation
    queries; counts are exact, the two effects closed forms that sum
    to the actual change by construction."""
    ev = _events(spark, sf_dir)
    d = _docs(spark, sf_dir)
    n_docs = d.count()
    day = F.date_trunc("day", F.col("ts")).cast("date")
    dd = F.datediff(day, F.lit("2024-01-01").cast("date")).cast("long")
    bounds = ev.agg(F.floor((F.min(dd) + F.max(dd) + 1) / 2).cast("long").alias("mid"))
    cell = (
        ev.crossJoin(F.broadcast(bounds))
        .join(d.select("doc_id", "source"), F.col("doc_id") == F.col("event_id") % n_docs)
        .groupBy("source")
        .agg(
            F.sum((dd < F.col("mid")).cast("int")).cast("long").alias("e0"),
            F.sum((dd >= F.col("mid")).cast("int")).cast("long").alias("e1"),
        )
    )
    tot = cell.agg(F.sum("e0").cast("long").alias("t0"), F.sum("e1").cast("long").alias("t1"))
    nat = F.col("e0") * (F.col("t1") - F.col("t0")).cast("double") / F.col("t0")
    return cell.crossJoin(F.broadcast(tot)).select(
        "source", "e0", "e1",
        (F.col("e1") - F.col("e0")).cast("long").alias("actual_change"),
        F.round(nat, 6).alias("national_effect"),
        F.round(F.col("e1") - F.col("e0") - nat, 6).alias("competitive_effect"),
    ).orderBy("source")



def _erlang_sql() -> str:
    return f"""WITH e AS (
         SELECT user_id, ts, epoch_us(ts)::BIGINT AS us,
                CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts) > {_LL_GAP_S} * 1000000
                     OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                     THEN 1 ELSE 0 END AS new_s
         FROM events),
       sess AS (
         SELECT user_id,
                sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid, us
         FROM e),
       spans AS (
         SELECT min(us)::BIGINT AS t0, max(us)::BIGINT AS t1
         FROM sess GROUP BY user_id, sid),
       par AS (
         SELECT count(*)::BIGINT AS n, sum(t1 - t0)::BIGINT AS dur,
                (SELECT max(t1) - min(t0) FROM spans)::BIGINT AS span
         FROM spans),
       load AS (
         SELECT n, dur::DOUBLE / span AS a,
                (floor(dur::DOUBLE / span)::BIGINT + 2) AS c
         FROM par),
       {_lnfact_spine_sql("(SELECT c FROM load)")},
       terms AS (
         SELECT k, round(1e12 * exp(k * ln((SELECT a FROM load))
                         - (SELECT lnf FROM lnf WHERE x = k)), 0)::BIGINT AS t_fp
         FROM (SELECT unnest(range(0, (SELECT c FROM load))) AS k)),
       ec AS (
         SELECT l.n, l.a, l.c,
                round(1e12 * exp(l.c * ln(l.a) - (SELECT lnf FROM lnf WHERE x = l.c))
                      * l.c / (l.c - l.a), 0)::BIGINT AS top_fp,
                (SELECT sum(t_fp) FROM terms)::BIGINT AS sum_fp
         FROM load l)
       SELECT n AS n_sessions, round(a, 6) AS offered_load, c AS servers,
              round(top_fp::DOUBLE / (sum_fp + top_fp), 6) AS p_wait,
              round((top_fp::DOUBLE / (sum_fp + top_fp)) / (c - a), 6)
                AS mean_wait_per_service
       FROM ec"""



@query("erlang_c", _erlang_sql())
def q_erlang_c(spark, sf_dir):
    """Erlang C delay probability for the measured session workload
    (Erlang 1917): offered load a = λW read off the same sessionized
    census as `littles_law_audit` (a = total busy time / span), staffed
    with c = ⌊a⌋+2 servers, P(wait) = (aᶜ/c!)·(c/(c−a)) / (Σ aᵏ/k! +
    that term) — the capacity-planning curve answering 'how many
    concurrent workers keep queueing negligible', with the mean wait
    in service units via the standard c−a scaling. Powers/factorials
    evaluate in log space from the shared ln-factorial spine, each
    term 1e-12-quantized so the Erlang sum is exact int64. The
    session census is the only input-sized stage."""
    ev = _events(spark, sf_dir)
    wu = Window.partitionBy("user_id").orderBy("ts")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz")).cast("long")
    e = ev.select(
        "user_id", "ts", us.alias("us"),
        F.when(
            (us - F.lag(us).over(wu) > _LL_GAP_S * 1000000) | F.lag("ts").over(wu).isNull(), 1
        ).otherwise(0).alias("new_s"),
    )
    sess = e.select(
        "user_id", "us",
        F.sum("new_s").over(wu.rowsBetween(Window.unboundedPreceding, 0)).alias("sid"),
    )
    spans = sess.groupBy("user_id", "sid").agg(
        F.min("us").alias("t0"), F.max("us").alias("t1")
    )
    par = spans.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("t1") - F.col("t0")).cast("long").alias("dur"),
        (F.max("t1") - F.min("t0")).cast("long").alias("span"),
    ).collect()[0]
    import math as _m

    def rnd(v):
        return int(_m.floor(v + 0.5)) if v >= 0 else -int(_m.floor(-v + 0.5))

    a = par.dur / par.span
    c = int(_m.floor(a)) + 2
    spine = spark.range(1, c + 1).select(F.col("id").alias("k"))
    lnf_rows = spine.select(
        F.col("k").alias("x"),
        F.sum(F.log(F.col("k").cast("double"))).over(
            Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
        ).alias("lnf"),
    )
    lnf_rows = census_collect(lnf_rows, 10_000, "ln-factorial spine (duty-cycle constant grain)")
    lnf = {0: 0.0}
    for row in lnf_rows:
        lnf[row.x] = row.lnf
    sum_fp = sum(rnd(1e12 * _m.exp(k * _m.log(a) - lnf[k])) for k in range(0, c))
    top_fp = rnd(1e12 * _m.exp(c * _m.log(a) - lnf[c]) * c / (c - a))
    p_wait = top_fp / (sum_fp + top_fp)
    return spark.createDataFrame(
        [(par.n, round(a, 6), c, round(p_wait, 6), round(p_wait / (c - a), 6))],
        "n_sessions long, offered_load double, servers long, p_wait double, mean_wait_per_service double",
    )



_DEGROOT_ROUNDS = 10



def _degroot_sql(rounds: int = _DEGROOT_ROUNDS) -> str:
    parts = [
        _dsg_graph_sql(),
        """sym AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
       deg AS MATERIALIZED (SELECT u, count(*)::BIGINT AS d FROM sym GROUP BY u),
       x0 AS MATERIALIZED (
         SELECT u AS node, (u % 1000) * 1000::BIGINT AS x FROM deg)""",
    ]
    prev = "x0"
    for r in range(1, rounds + 1):
        parts.append(f"""x{r} AS MATERIALIZED (
         SELECT s.u AS node,
                round(sum(xp.x)::DOUBLE / d.d, 0)::BIGINT AS x
         FROM sym s JOIN {prev} xp ON xp.node = s.v
         JOIN deg d ON d.u = s.u
         GROUP BY s.u, d.d)""")
        prev = f"x{r}"
    return (
        "WITH " + ",\n       ".join(parts)
        + f"""
       SELECT f.node, round(i.x / 1e3, 6) AS initial,
              round(f.x / 1e3, 6) AS final,
              round((SELECT max(x) - min(x) FROM {prev}) / 1e3, 6) AS spread
       FROM {prev} f JOIN x0 i USING (node)
       ORDER BY f.node LIMIT 25"""
    )



@query("degroot_consensus", _degroot_sql())
def q_degroot_consensus(spark, sf_dir):
    """DeGroot consensus dynamics on the part co-purchase graph
    (DeGroot, JASA 1974): opinions x ← (row-normalized A)·x for 10
    rounds from deterministic initial values (node id mod 1000) —
    the averaging process whose convergence RATE is governed by the
    same spectral gap `eigenvector_centrality` estimates and whose
    fixed point weights opinions by degree; the remaining SPREAD
    after 10 rounds is the mixing diagnostic (a crawl scheduler reads
    it as information-propagation depth). Each round re-quantizes the
    milli-unit opinions after one degree-normalized neighbor average
    — the CC/WL shuffle shape — so both engines walk one integer
    trajectory (unrolled MATERIALIZED oracle). First 25 nodes +
    global spread."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    sized = (
        op.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("bs"))
        .where((F.col("bs") >= 2) & (F.col("bs") <= 20)).select("l_orderkey")
    )
    bb = op.join(sized, "l_orderkey")
    e = (
        bb.alias("x").join(bb.alias("y"), "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("u"), F.col("y.l_partkey").alias("v"))
        .distinct()
    )
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).stableCheckpoint(eager=True)
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d")).stableCheckpoint(eager=True)
    x0 = deg.select(F.col("u").alias("node"), ((F.col("u") % 1000) * 1000).cast("long").alias("x"))
    x = x0
    for _ in range(_DEGROOT_ROUNDS):
        x = (
            sym.join(x.withColumnRenamed("node", "v"), "v")
            .groupBy(F.col("u").alias("node"))
            .agg(F.sum("x").cast("long").alias("sx"))
            .join(deg.withColumnRenamed("u", "node"), "node")
            .select("node", F.round(F.col("sx").cast("double") / F.col("d"), 0).cast("long").alias("x"))
            .stableCheckpoint(eager=True)
        )
    spread = x.agg(((F.max("x") - F.min("x")) / F.lit(1e3)).alias("spr"))
    return (
        x.join(x0.select(F.col("node"), F.col("x").alias("xi")), "node")
        .crossJoin(F.broadcast(spread))
        .select(
            "node",
            F.round(F.col("xi") / F.lit(1e3), 6).alias("initial"),
            F.round(F.col("x") / F.lit(1e3), 6).alias("final"),
            F.round(F.col("spr"), 6).alias("spread"),
        )
        .orderBy("node")
        .limit(25)
    )



# RBP persistence 0.8 → weights (1-p)p^(r-1) pre-rounded to integer ppb,
# shared verbatim by both engines (the _NDCG_W discipline)
_RBP_W = {1: 200000000, 2: 160000000, 3: 128000000, 4: 102400000, 5: 81920000}



def _rbp_sql(k: int = 5) -> str:
    from pliers_spark.operators.ir import bm25_topk_sql

    w_case = " ".join(f"WHEN {r} THEN {w}" for r, w in _RBP_W.items())
    tail = f""", rel AS (
  SELECT b.q_id, b.rank,
         (count(tf.term) > 0)::INT AS rel
  FROM bm25 b
  JOIN qt ON qt.q_id = b.q_id
  LEFT JOIN tf ON tf.doc_id = b.doc_id AND tf.term = qt.term
  GROUP BY b.q_id, b.doc_id, b.rank),
agg AS (
  SELECT q_id, sum(rel * (CASE rank {w_case} END))::BIGINT AS rbp_fp,
         sum(rel)::BIGINT AS n_rel
  FROM rel GROUP BY q_id)
SELECT q_id, n_rel, round(rbp_fp / 1e9, 6) AS rbp
FROM agg"""
    return f"""WITH seeds AS (
         SELECT doc_id, string_split(trim(text), ' ') AS t
         FROM documents ORDER BY doc_id LIMIT 8),
       queries AS (
         SELECT doc_id AS q_id, unnest(t[1:6]) AS term FROM seeds),
       {bm25_topk_sql(k=k, tail=tail)}"""



@query("rbp_at_k", _rbp_sql())
def q_rbp_at_k(spark, sf_dir):
    """Rank-biased precision @5 (Moffat & Zobel, TOIS 2008): RBP =
    (1−p)Σp^{{r−1}}·rel_r with persistence p=0.8 — the ranking metric
    with a USER MODEL knob (p = probability of continuing down the
    list) and, unlike `ndcg_at_k`/`err_at_k`, no dependence on an
    ideal ranking or total recall, so it stays comparable when the
    judged pool is incomplete. Binary relevance = candidate shares a
    query term; geometric weights enter as ONCE-rounded integer ppb
    shared verbatim by both engines, so per-query RBP is an exact
    int64 sum. Same BM25 candidate machinery as the rest of the eval
    family."""
    from pliers_spark.operators.ir import bm25_topk

    docs = _docs(spark, sf_dir)
    seeds = (
        docs.orderBy("doc_id").limit(8)
        .select(F.col("doc_id").alias("q_id"),
                F.explode(F.slice(T.tokenize(F.col("text")), 1, 6)).alias("term"))
    )
    cand = bm25_topk(docs, seeds, k=5).stableCheckpoint(eager=True)
    qt = seeds.distinct().stableCheckpoint(eager=True)
    cand_docs = cand.select("doc_id").distinct()
    doc_terms = (
        docs.join(F.broadcast(cand_docs), "doc_id")
        .select("doc_id", F.explode(T.tokenize(F.col("text"))).alias("term"))
        .distinct()
    )
    matched = (
        doc_terms.join(F.broadcast(qt), "term")
        .groupBy("q_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    wmap = F.create_map(*[F.lit(x) for kv in _RBP_W.items() for x in kv])
    rel = cand.join(matched, ["q_id", "doc_id"], "left").select(
        "q_id", "rank",
        (F.coalesce(F.col("hits"), F.lit(0)) > 0).cast("int").alias("rel"),
    )
    agg = rel.groupBy("q_id").agg(
        F.sum(F.col("rel") * wmap[F.col("rank")].cast("long")).cast("long").alias("rbp_fp"),
        F.sum("rel").cast("long").alias("n_rel"),
    )
    return agg.select("q_id", "n_rel", F.round(F.col("rbp_fp") / F.lit(1e9), 6).alias("rbp"))



def _wig_sql(k: int = 5) -> str:
    from pliers_spark.operators.ir import bm25_topk_sql

    # tail sees per_q (ALL scored candidates) and bm25 (top-k) from the
    # shared BM25 body — no extra corpus pass
    tail = f""", mu AS (
  SELECT q_id, avg(score_fp) AS mu_fp FROM per_q GROUP BY q_id),
agg AS (
  SELECT b.q_id, count(*)::BIGINT AS k,
         avg(b.score_fp) AS mt_fp
  FROM bm25 b GROUP BY b.q_id)
SELECT a.q_id,
       round(round(a.mt_fp - m.mu_fp, 0) / (1e6 * sqrt(a.k)), 6) AS wig
FROM agg a JOIN mu m USING (q_id)"""
    return f"""WITH seeds AS (
         SELECT doc_id, string_split(trim(text), ' ') AS t
         FROM documents ORDER BY doc_id LIMIT 8),
       queries AS (
         SELECT doc_id AS q_id, unnest(t[1:6]) AS term FROM seeds),
       {bm25_topk_sql(k=k, tail=tail)}"""



@query("wig_qpp", _wig_sql())
def q_wig_qpp(spark, sf_dir):
    """Weighted Information Gain query-performance prediction (Zhou &
    Croft, SIGIR 2007, simplified corpus-baseline form): WIG =
    (mean top-k BM25 score − mean all-candidates score)/√k — the
    POST-retrieval difficulty signal (low WIG = the top documents
    barely beat the corpus background = the query will perform badly)
    that complements `clarity_score`'s language-model version with a
    score-space one. Both means ride the same scored-candidates CTE
    the BM25 ranking already produced — zero extra corpus passes; the
    gap is 1e-6-quantized before the √k normalization."""
    from pliers_spark.operators.ir import bm25_topk

    docs = _docs(spark, sf_dir)
    seeds = (
        docs.orderBy("doc_id").limit(8)
        .select(F.col("doc_id").alias("q_id"),
                F.explode(F.slice(T.tokenize(F.col("text")), 1, 6)).alias("term"))
    )
    # k unbounded → the full scored candidate set (per_q grain), ranked
    scored = bm25_topk(docs, seeds, k=1 << 60).stableCheckpoint(eager=True)
    mu = scored.groupBy("q_id").agg(F.avg("score_fp").alias("mu_fp"))
    agg = scored.where(F.col("rank") <= 5).groupBy("q_id").agg(
        F.count(F.lit(1)).cast("long").alias("k"), F.avg("score_fp").alias("mt_fp")
    ).join(mu, "q_id")
    return agg.select(
        "q_id",
        F.round(
            F.round(F.col("mt_fp") - F.col("mu_fp"), 0)
            / (F.lit(1e6) * F.sqrt(F.col("k").cast("double"))),
            6,
        ).alias("wig"),
    )



def _map_sql(k: int = 5) -> str:
    from pliers_spark.operators.ir import bm25_topk_sql

    tail = f""", rel AS (
  SELECT b.q_id, b.rank, (count(tf.term) > 0)::INT AS rel
  FROM bm25 b
  JOIN qt ON qt.q_id = b.q_id
  LEFT JOIN tf ON tf.doc_id = b.doc_id AND tf.term = qt.term
  GROUP BY b.q_id, b.doc_id, b.rank),
pr AS (
  SELECT q_id, rank, rel,
         sum(rel) OVER (PARTITION BY q_id ORDER BY rank
                        ROWS UNBOUNDED PRECEDING) AS cum_rel
  FROM rel),
ap AS (
  SELECT q_id,
         sum(rel)::BIGINT AS n_rel,
         coalesce(sum(CASE WHEN rel = 1
                  THEN round(1e9 * cum_rel::DOUBLE / rank, 0)::BIGINT END), 0)::BIGINT AS ap_fp
  FROM pr GROUP BY q_id)
SELECT q_id, n_rel,
       CASE WHEN n_rel = 0 THEN 0.0
            ELSE round(ap_fp / (n_rel * 1e9), 6) END AS average_precision
FROM ap"""
    return f"""WITH seeds AS (
         SELECT doc_id, string_split(trim(text), ' ') AS t
         FROM documents ORDER BY doc_id LIMIT 8),
       queries AS (
         SELECT doc_id AS q_id, unnest(t[1:6]) AS term FROM seeds),
       {bm25_topk_sql(k=k, tail=tail)}"""



@query("map_at_k", _map_sql())
def q_map_at_k(spark, sf_dir):
    """Average precision @5 per query (the building block of MAP, the
    TREC standard): AP = (1/R)Σ_{{hits}} P@rank — precision evaluated
    exactly where relevant documents surface, the metric that rewards
    FRONT-loading where `mrr_recall` sees only the first hit and
    `ndcg_at_k` needs graded labels. Binary relevance as in
    `rbp_at_k`; the running-hit precision at each hit rank is
    1e-9-quantized so per-query AP is an exact int64 sum divided by
    the recall base. Completes the eval shelf: MRR, NDCG, ERR, RBP,
    MAP."""
    from pliers_spark.operators.ir import bm25_topk

    docs = _docs(spark, sf_dir)
    seeds = (
        docs.orderBy("doc_id").limit(8)
        .select(F.col("doc_id").alias("q_id"),
                F.explode(F.slice(T.tokenize(F.col("text")), 1, 6)).alias("term"))
    )
    cand = bm25_topk(docs, seeds, k=5).stableCheckpoint(eager=True)
    qt = seeds.distinct().stableCheckpoint(eager=True)
    cand_docs = cand.select("doc_id").distinct()
    doc_terms = (
        docs.join(F.broadcast(cand_docs), "doc_id")
        .select("doc_id", F.explode(T.tokenize(F.col("text"))).alias("term"))
        .distinct()
    )
    matched = (
        doc_terms.join(F.broadcast(qt), "term")
        .groupBy("q_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    rel = cand.join(matched, ["q_id", "doc_id"], "left").select(
        "q_id", "rank",
        (F.coalesce(F.col("hits"), F.lit(0)) > 0).cast("int").alias("rel"),
    )
    wc = Window.partitionBy("q_id").orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    pr = rel.select("q_id", "rank", "rel", F.sum("rel").over(wc).alias("cum_rel"))
    ap = pr.groupBy("q_id").agg(
        F.sum("rel").cast("long").alias("n_rel"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("rel") == 1,
                    F.round(F.lit(1e9) * F.col("cum_rel").cast("double") / F.col("rank"), 0).cast("long"),
                )
            ),
            F.lit(0),
        ).cast("long").alias("ap_fp"),
    )
    return ap.select(
        "q_id", "n_rel",
        F.when(F.col("n_rel") == 0, F.lit(0.0))
        .otherwise(F.round(F.col("ap_fp") / (F.col("n_rel") * F.lit(1e9)), 6))
        .alias("average_precision"),
    )



_RDD_BW = 10  # bandwidth in clicks around the cutoff



@query(
    "rdd_sharp",
    f"""WITH u AS (
         SELECT user_id,
                sum((event_type = 'click')::INT)::BIGINT AS x,
                max((event_type = 'purchase')::INT)::BIGINT AS y
         FROM events GROUP BY user_id),
       cut AS (
         SELECT x AS c FROM (
           SELECT x, row_number() OVER (ORDER BY x, user_id) AS rn, count(*) OVER () AS n
           FROM u) WHERE rn = (n + 1) // 2),
       loc AS (
         SELECT (x >= (SELECT c FROM cut))::INT AS side,
                (x - (SELECT c FROM cut))::BIGINT AS r, y
         FROM u
         WHERE abs(x - (SELECT c FROM cut)) <= {_RDD_BW}),
       mo AS (
         SELECT side, count(*)::BIGINT AS n, sum(r)::BIGINT AS sr, sum(y)::BIGINT AS sy,
                sum(r * r)::BIGINT AS srr, sum(r * y)::BIGINT AS sry
         FROM loc GROUP BY side),
       fit AS (
         SELECT side, n,
                (sy::DOUBLE - (n * sry - sr * sy)::DOUBLE / (n * srr - sr * sr) * sr) / n
                  AS intercept,
                (n * sry - sr * sy)::DOUBLE / (n * srr - sr * sr) AS slope
         FROM mo WHERE n * srr - sr * sr != 0)
       SELECT (SELECT c FROM cut) AS cutoff,
              max(CASE WHEN side = 0 THEN n END) AS n_left,
              max(CASE WHEN side = 1 THEN n END) AS n_right,
              round(max(CASE WHEN side = 0 THEN intercept END), 6) AS y0_at_cutoff,
              round(max(CASE WHEN side = 1 THEN intercept END), 6) AS y1_at_cutoff,
              round(max(CASE WHEN side = 1 THEN intercept END)
                    - max(CASE WHEN side = 0 THEN intercept END), 6) AS rd_estimate
       FROM fit""",
)
def q_rdd_sharp(spark, sf_dir):
    """Sharp regression discontinuity at the median click count
    (Thistlethwaite & Campbell 1960; Imbens & Lemieux, JoE 2008):
    local linear fits on each side within a ±10-click bandwidth, the
    treatment-effect estimate being the jump between the two
    intercepts AT the cutoff — the quasi-experimental design that
    identifies an effect from the DISCONTINUITY itself, completing
    the causal shelf (`diff_in_diff` needs parallel trends,
    `propensity_match` conditional ignorability, RD only local
    continuity). Cutoff = deterministic median order statistic; each
    side's OLS comes from exact BIGINT moments of the centered
    running variable; degenerate sides are excluded identically.
    One census, two 5-number fits."""
    ev = _events(spark, sf_dir)
    u = ev.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "click").cast("int")).cast("long").alias("x"),
        F.max((F.col("event_type") == "purchase").cast("int")).cast("long").alias("y"),
    ).stableCheckpoint(eager=True)
    # CENSUS GRAIN (r4): the median cutoff is the least census value
    # whose cumulative count reaches ⌊(n+1)/2⌋ (operators/census.py) —
    # no global rank window over the (unbounded) user grain.
    from pliers_spark.operators.census import with_census_ranks

    ucells = with_census_ranks(
        u.groupBy("x").agg(F.count(F.lit(1)).alias("cnt")), "x", le="cum_le"
    )
    un = u.agg(F.count(F.lit(1)).alias("n"))
    cut = (
        ucells.crossJoin(F.broadcast(un))
        .where(F.col("cum_le") >= F.floor((F.col("n") + 1) / 2))
        .agg(F.min("x").alias("c"))
    )
    loc = (
        u.crossJoin(F.broadcast(cut))
        .where(F.abs(F.col("x") - F.col("c")) <= _RDD_BW)
        .select(
            (F.col("x") >= F.col("c")).cast("int").alias("side"),
            (F.col("x") - F.col("c")).cast("long").alias("r"), "y", "c",
        )
    )
    mo = loc.groupBy("side", "c").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r").cast("long").alias("sr"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("r") * F.col("r")).cast("long").alias("srr"),
        F.sum(F.col("r") * F.col("y")).cast("long").alias("sry"),
    )
    slope = (F.col("n") * F.col("sry") - F.col("sr") * F.col("sy")).cast("double") / (
        F.col("n") * F.col("srr") - F.col("sr") * F.col("sr")
    )
    fit = mo.where(F.col("n") * F.col("srr") - F.col("sr") * F.col("sr") != 0).select(
        "side", "n", "c",
        ((F.col("sy").cast("double") - slope * F.col("sr")) / F.col("n")).alias("intercept"),
    )
    return fit.groupBy("c").agg(
        F.max(F.when(F.col("side") == 0, F.col("n"))).alias("n_left"),
        F.max(F.when(F.col("side") == 1, F.col("n"))).alias("n_right"),
        F.round(F.max(F.when(F.col("side") == 0, F.col("intercept"))), 6).alias("y0_at_cutoff"),
        F.round(F.max(F.when(F.col("side") == 1, F.col("intercept"))), 6).alias("y1_at_cutoff"),
        F.round(
            F.max(F.when(F.col("side") == 1, F.col("intercept")))
            - F.max(F.when(F.col("side") == 0, F.col("intercept"))),
            6,
        ).alias("rd_estimate"),
    ).select(F.col("c").alias("cutoff"), "n_left", "n_right", "y0_at_cutoff", "y1_at_cutoff", "rd_estimate")



@query(
    "event_study",
    """WITH fp AS (
         SELECT user_id,
                min(CASE WHEN event_type = 'purchase'
                         THEN datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE) // 7
                    END)::BIGINT AS w0
         FROM events GROUP BY user_id
         HAVING min(CASE WHEN event_type = 'purchase'
                         THEN datediff('day', DATE '2024-01-01', date_trunc('day', ts)::DATE) // 7
                    END) IS NOT NULL),
       uw AS (
         SELECT e.user_id, fp.w0,
                (datediff('day', DATE '2024-01-01', date_trunc('day', e.ts)::DATE) // 7)::BIGINT
                  - fp.w0 AS rel_w,
                sum((e.event_type = 'click')::INT)::BIGINT AS clicks
         FROM events e JOIN fp ON fp.user_id = e.user_id
         GROUP BY 1, 2, 3)
       SELECT rel_w AS relative_week,
              count(DISTINCT user_id)::BIGINT AS n_users,
              sum(clicks)::BIGINT AS total_clicks,
              round(sum(clicks)::DOUBLE / count(DISTINCT user_id), 6) AS clicks_per_user
       FROM uw WHERE rel_w BETWEEN -3 AND 3
       GROUP BY rel_w ORDER BY rel_w""",
)
def q_event_study(spark, sf_dir):
    """Event-study profile around each user's FIRST purchase (the
    staggered-adoption event-study plot of Jacobson-LaLonde-Sullivan,
    AER 1993): click volume per user-week re-indexed to event time
    (week 0 = first-purchase week, window −3..+3) — the
    pre-trend/post-effect picture whose flat LEFT side validates the
    designs `diff_in_diff` and `attribution` assume, with each user
    serving as their own control. Event weeks are one min-census
    (never-purchasers drop via HAVING); the relative-week census is
    exact, the per-week rate one division. The calendar-vs-event-time
    re-index is the north rule's as-of/alignment machinery in causal
    clothing."""
    ev = _events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts")).cast("date")
    wk = F.floor(F.datediff(day, F.lit("2024-01-01").cast("date")) / 7).cast("long")
    fp = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "purchase", wk)).cast("long").alias("w0")
    ).where(F.col("w0").isNotNull())
    uw = (
        ev.join(fp, "user_id")
        .groupBy("user_id", "w0", (wk - F.col("w0")).alias("rel_w"))
        .agg(F.sum((F.col("event_type") == "click").cast("int")).cast("long").alias("clicks"))
    )
    return (
        uw.where(F.col("rel_w").between(-3, 3))
        .groupBy(F.col("rel_w").alias("relative_week"))
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum("clicks").cast("long").alias("total_clicks"),
            F.round(F.sum("clicks").cast("double") / F.countDistinct("user_id"), 6).alias("clicks_per_user"),
        )
        .orderBy("relative_week")
    )



_PMIX_ROUNDS = 5



def _pmix_sql() -> str:
    parts = ["""u AS MATERIALIZED (
         SELECT user_id, count(*)::BIGINT AS x FROM events GROUP BY user_id),
       h AS MATERIALIZED (SELECT x, count(*)::BIGINT AS c FROM u GROUP BY x),
       q0 AS MATERIALIZED (
         SELECT x AS ql FROM (
           SELECT x, row_number() OVER (ORDER BY x) AS rn, count(*) OVER () AS n
           FROM (SELECT x FROM u)) WHERE rn = (n + 3) // 4),
       q1 AS MATERIALIZED (
         SELECT x AS qh FROM (
           SELECT x, row_number() OVER (ORDER BY x) AS rn, count(*) OVER () AS n
           FROM (SELECT x FROM u)) WHERE rn = (3 * n + 3) // 4),
       p0 AS MATERIALIZED (
         SELECT (SELECT ql FROM q0)::DOUBLE AS l1,
                (SELECT qh FROM q1)::DOUBLE AS l2, 0.5::DOUBLE AS pi)"""]
    prev = "p0"
    for r in range(1, _PMIX_ROUNDS + 1):
        parts.append(f"""e{r} AS MATERIALIZED (
         SELECT h.x, h.c,
                round(1e9 / (1.0 + (1 - p.pi) / p.pi
                      * exp(h.x * (ln(p.l2) - ln(p.l1)) - (p.l2 - p.l1))), 0)::BIGINT AS g_fp
         FROM h, {prev} p),
       p{r} AS MATERIALIZED (
         SELECT sum(c * x * g_fp)::DOUBLE / sum(c * g_fp) AS l1,
                sum(c * x * (1000000000 - g_fp))::DOUBLE
                  / sum(c * (1000000000 - g_fp)) AS l2,
                sum(c * g_fp)::DOUBLE / (sum(c) * 1e9) AS pi
         FROM e{r})""")
        prev = f"p{r}"
    return (
        "WITH " + ",\n       ".join(parts)
        + f"""
       SELECT round(l1, 6) AS lambda_low, round(l2, 6) AS lambda_high,
              round(pi, 6) AS weight_low
       FROM {prev}"""
    )



@query("poisson_mixture_em", _pmix_sql())
def q_poisson_mixture_em(spark, sf_dir):
    """Two-component Poisson mixture on per-user activity by 5 EM
    rounds (Dempster-Laird-Rubin 1977), initialized from the Q1/Q3
    order statistics: the discrete-count twin of `gmm_em_1d` and the
    model-based version of `kmeans_1d_optimal`'s hard split — casual
    vs power users as latent classes with soft responsibilities.
    E-step responsibilities evaluate on the count HISTOGRAM grain
    (one row per distinct activity level, the census-grain EM
    discipline) and re-quantize to integer ppb, so the M-step's
    count-weighted sums are exact int64 combinations; λ gaps enter
    through one shared exp/ln expression. All rounds unrolled; the
    input-sized work is one census."""
    ev = _events(spark, sf_dir)
    u = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("x"))
    h = u.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("c")).stableCheckpoint(eager=True)
    wq = Window.orderBy("x")
    ranked = u.select("x", F.row_number().over(wq).alias("rn"),
                      F.count(F.lit(1)).over(Window.partitionBy()).alias("n"))
    ql = ranked.where(F.col("rn") == F.floor((F.col("n") + 3) / 4)).select(
        F.col("x").cast("double").alias("l1")
    )
    qh = ranked.where(F.col("rn") == F.floor((3 * F.col("n") + 3) / 4)).select(
        F.col("x").cast("double").alias("l2")
    )
    p = ql.crossJoin(qh).select("l1", "l2", F.lit(0.5).alias("pi")).stableCheckpoint(eager=True)
    for _ in range(_PMIX_ROUNDS):
        e = h.crossJoin(F.broadcast(p)).select(
            "x", "c",
            F.round(
                F.lit(1e9)
                / (
                    F.lit(1.0)
                    + (1 - F.col("pi")) / F.col("pi")
                    * F.exp(F.col("x") * (F.log("l2") - F.log("l1")) - (F.col("l2") - F.col("l1")))
                ),
                0,
            ).cast("long").alias("g_fp"),
        )
        p = e.agg(
            (F.sum(F.col("c") * F.col("x") * F.col("g_fp")).cast("double") / F.sum(F.col("c") * F.col("g_fp"))).alias("l1"),
            (
                F.sum(F.col("c") * F.col("x") * (F.lit(1000000000) - F.col("g_fp"))).cast("double")
                / F.sum(F.col("c") * (F.lit(1000000000) - F.col("g_fp")))
            ).alias("l2"),
            (F.sum(F.col("c") * F.col("g_fp")).cast("double") / (F.sum("c") * F.lit(1e9))).alias("pi"),
        ).stableCheckpoint(eager=True)
    return p.select(
        F.round("l1", 6).alias("lambda_low"),
        F.round("l2", 6).alias("lambda_high"),
        F.round("pi", 6).alias("weight_low"),
    )



def _cindex_from_cells(pdf):
    """Harrell's C from (t, score, ev, n) census cells in ONE pass:
    process t groups in descending order keeping a Fenwick tree over
    compressed score ranks of all strictly-later users — O(C log C) on
    census-sized data (C ≤ distinct days × distinct scores × 2; at any
    corpus size the cells table is the bounded contraction, never the
    user table). All counts are exact python ints."""
    import numpy as np
    import pandas as pd

    scores = np.sort(pdf["s"].unique())
    S = len(scores)
    rank = {int(v): i + 1 for i, v in enumerate(scores)}
    bit = [0] * (S + 1)

    def upd(i, v):
        while i <= S:
            bit[i] += v
            i += i & -i

    def qry(i):
        r = 0
        while i > 0:
            r += bit[i]
            i -= i & -i
        return r

    usable = conc = ties = 0
    total_later = 0
    for t, g in sorted(pdf.groupby("t", sort=False), key=lambda kv: -kv[0]):
        evg = g[g["ev"] == 1]
        cen = g[g["ev"] == 0]
        # cross-time pairs: event user a at t vs every user with t_b > t
        for s_a, n_a in zip(evg["s"], evg["n"]):
            n_a = int(n_a)
            r = rank[int(s_a)]
            lt = qry(r - 1)
            eq = qry(r) - lt
            usable += n_a * total_later
            conc += n_a * lt
            ties += n_a * eq
        # same-time pairs: event a vs censored b at the identical t
        if len(cen) and len(evg):
            cs = np.sort(cen["s"].values)
            cn = cen.sort_values("s")["n"].astype("int64").values
            ccum = np.cumsum(cn)
            ctot = int(ccum[-1])
            for s_a, n_a in zip(evg["s"], evg["n"]):
                n_a = int(n_a)
                i_lt = int(np.searchsorted(cs, s_a, side="left"))
                i_le = int(np.searchsorted(cs, s_a, side="right"))
                lt = int(ccum[i_lt - 1]) if i_lt else 0
                le = int(ccum[i_le - 1]) if i_le else 0
                usable += n_a * ctot
                conc += n_a * lt
                ties += n_a * (le - lt)
        for s_b, n_b in zip(g["s"], g["n"]):
            upd(rank[int(s_b)], int(n_b))
        total_later += int(g["n"].sum())
    c = round((conc + 0.5 * ties) / usable, 6) if usable else None
    return pd.DataFrame(
        {"n_usable_pairs": [usable], "n_concordant": [conc],
         "n_tied": [ties], "harrells_c": [c]}
    )


@query(
    "harrells_c",
    """WITH u AS (
         SELECT e.user_id,
                sum((e.event_type = 'click')::INT)::BIGINT AS score,
                min(CASE WHEN e.event_type = 'purchase'
                         THEN datediff('day', DATE '2024-01-01', date_trunc('day', e.ts)::DATE)
                    END)::BIGINT AS t_event,
                max(datediff('day', DATE '2024-01-01', date_trunc('day', e.ts)::DATE))::BIGINT AS t_last
         FROM events e GROUP BY e.user_id),
       s AS (
         SELECT user_id, score,
                coalesce(t_event, t_last) AS t,
                (t_event IS NOT NULL)::INT AS ev
         FROM u),
       cells AS (
         SELECT t, score, ev, count(*)::BIGINT AS n
         FROM s GROUP BY t, score, ev),
       pairs AS (
         SELECT sum(a.n * b.n * (a.score > b.score)::INT)::BIGINT AS conc,
                sum(a.n * b.n * (a.score = b.score)::INT)::BIGINT AS ties,
                sum(a.n * b.n)::BIGINT AS usable
         FROM cells a JOIN cells b
           ON a.ev = 1
          AND (a.t < b.t OR (a.t = b.t AND b.ev = 0)))
       SELECT usable AS n_usable_pairs, conc AS n_concordant, ties AS n_tied,
              round((conc + 0.5e0 * ties) / usable::DOUBLE, 6) AS harrells_c
       FROM pairs""",
)
def q_harrells_c(spark, sf_dir):
    """Harrell's concordance index for time-to-first-purchase against
    the click-count risk score (Harrell et al., JAMA 1982): over
    usable pairs — the earlier event-time member must have the event,
    the comparator a later time or censoring — the share where the
    earlier converter also has the higher score (ties 0.5) — the
    survival-analysis generalization of `roc_auc` (C = AUC with no
    censoring) that grades `cox_regression`'s linear predictor.
    Censoring = no purchase by each user's last observed day
    (exactly the `kaplan_meier` convention).

    Round-3 rewrite (VERDICT r2 item 4): the former O(U²) non-equi
    pair self-join (BroadcastNestedLoopJoin over all user pairs) is
    replaced by the census-grain contraction — users aggregate to
    (day, score, ev) cells with one map-side-combined shuffle, and C
    comes from a single bounded :func:`_cindex_from_cells` pass
    (descending-time sweep + Fenwick tree over score ranks, exactly
    the time-sorted inversion count). No nested-loop join remains
    (gated in tests/test_plans.py); the oracle uses the same cell
    grain with count products."""
    ev = _events(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts")).cast("date")
    dd = F.datediff(day, F.lit("2024-01-01").cast("date")).cast("long")
    u = ev.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "click").cast("int")).cast("long").alias("score"),
        F.min(F.when(F.col("event_type") == "purchase", dd)).cast("long").alias("t_event"),
        F.max(dd).cast("long").alias("t_last"),
    )
    cells = (
        u.select(
            F.coalesce(F.col("t_event"), F.col("t_last")).alias("t"),
            F.col("score").alias("s"),
            F.col("t_event").isNotNull().cast("int").alias("ev"),
        )
        .groupBy("t", "s", "ev")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return cells.groupBy(F.lit(1).alias("_g")).applyInPandas(
        lambda pdf: _cindex_from_cells(pdf),
        "n_usable_pairs long, n_concordant long, n_tied long, harrells_c double",
    )



@query(
    "ks_separation",
    """WITH u AS (
         SELECT user_id,
                sum((event_type = 'click')::INT)::BIGINT AS score,
                (sum((event_type = 'purchase')::INT)
                 > sum((event_type = 'click')::INT))::INT AS y
         FROM events GROUP BY user_id),
       tots AS (
         SELECT sum(y)::BIGINT AS np, sum(1 - y)::BIGINT AS nn FROM u),
       grid AS (
         SELECT score,
                sum(y)::BIGINT AS p, sum(1 - y)::BIGINT AS n
         FROM u GROUP BY score),
       cum AS (
         SELECT score,
                sum(p) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING)::BIGINT AS cp,
                sum(n) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING)::BIGINT AS cn
         FROM grid),
       d AS (
         SELECT score,
                abs(cp * (SELECT nn FROM tots) - cn * (SELECT np FROM tots))::BIGINT AS gap_x
         FROM cum),
       best AS (
         SELECT score, gap_x,
                row_number() OVER (ORDER BY gap_x DESC, score) AS rn
         FROM d)
       SELECT (SELECT np FROM tots) AS n_pos, (SELECT nn FROM tots) AS n_neg,
              score AS ks_threshold,
              round(gap_x::DOUBLE / ((SELECT np FROM tots)::DOUBLE * (SELECT nn FROM tots)), 6) AS ks_stat
       FROM best WHERE rn = 1""",
)
def q_ks_separation(spark, sf_dir):
    """Kolmogorov-Smirnov separation of the click score between
    purchase-dominant and other users — the credit-scoring 'KS'
    (max CDF gap between the two class-conditional score
    distributions, with its argmax threshold): the single-cut
    discrimination summary that complements `roc_auc` (integral) and
    `youden_threshold` (J = same gap read on the ROC); KS and Youden
    coincide in value but this query reports the scoring-industry
    framing with the gap maximized over the exact score grid. The
    CDF gap is kept as the exact integer cross-product
    |cp·N⁻ − cn·N⁺| (no rational CDFs until the final division);
    argmax ties break on the threshold. One census, one cumulative
    window."""
    ev = _events(spark, sf_dir)
    u = ev.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "click").cast("int")).cast("long").alias("score"),
        (
            F.sum((F.col("event_type") == "purchase").cast("int"))
            > F.sum((F.col("event_type") == "click").cast("int"))
        ).cast("int").alias("y"),
    )
    tots = u.agg(
        F.sum("y").cast("long").alias("np"), F.sum(1 - F.col("y")).cast("long").alias("nn")
    )
    grid = u.groupBy("score").agg(
        F.sum("y").cast("long").alias("p"), F.sum(1 - F.col("y")).cast("long").alias("n")
    )
    wc = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    cum = grid.select(
        "score",
        F.sum("p").over(wc).cast("long").alias("cp"),
        F.sum("n").over(wc).cast("long").alias("cn"),
    )
    d = cum.crossJoin(F.broadcast(tots)).select(
        "score", "np", "nn",
        F.abs(F.col("cp") * F.col("nn") - F.col("cn") * F.col("np")).cast("long").alias("gap_x"),
    )
    best = d.select(
        "score", "np", "nn", "gap_x",
        F.row_number().over(Window.orderBy(F.col("gap_x").desc(), "score")).alias("rn"),
    ).where(F.col("rn") == 1)
    return best.select(
        F.col("np").alias("n_pos"), F.col("nn").alias("n_neg"),
        F.col("score").alias("ks_threshold"),
        F.round(F.col("gap_x").cast("double") / (F.col("np").cast("double") * F.col("nn")), 6).alias("ks_stat"),
    )
