"""Batch 27: ARI/NMI clustering agreement, triangle counting, SMD balance."""

import math
import os
from datetime import datetime


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


def test_ari_nmi_perfect_agreement(spark, tmp_path):
    """Labels identical to the k-means assignment -> ARI = NMI = 1."""
    from pliers_spark.queries import QUERIES

    rows = []
    for c in range(8):
        anchor = [0.0] * 8
        anchor[c] = 10.0
        rows.append((c, [float(x) for x in anchor], c))        # seed vec
        for j in range(1, 4):                                   # 3 exact copies
            rows.append((c * 100 + 8 + j, [float(x) for x in anchor], c))
    sf = _write(spark, tmp_path, "embeddings", rows,
                "vec_id long, embedding array<float>, label int")
    r = QUERIES["ari_nmi"](spark, sf).collect()[0]
    assert r.ari == 1.0 and r.nmi == 1.0
    assert r.pair_agree == r.pairs_pred == r.pairs_true == 8 * (4 * 3 // 2)
    assert r.n == 32


def test_triangle_hand_graph(spark, tmp_path):
    """Basket {1,2,3} forms one triangle; basket {3,4} adds a dangling
    edge. Coefficients: nodes 1,2 -> 1.0; node 3 -> 1/3; node 4 -> 0."""
    from pliers_spark.queries import QUERIES

    rows = [(10, 1), (10, 2), (10, 3), (20, 3), (20, 4)]
    sf = _write(spark, tmp_path, "lineitem", rows, "l_orderkey long, l_partkey long")
    out = {r.part_id: r for r in QUERIES["triangle_coeffs"](spark, sf).collect()}
    assert out[1].triangles == out[2].triangles == out[3].triangles == 1
    assert out[4].triangles == 0
    assert out[1].clustering_coeff == out[2].clustering_coeff == 1.0
    assert out[3].degree == 3 and out[3].clustering_coeff == round(2 / 6, 6)
    assert out[4].clustering_coeff == 0.0


def test_smd_matches_hand_formula(spark, tmp_path):
    """SMD computed from planted group means/variances; shift-invariance
    of the date covariates gives smd 0 when both groups share dates."""
    from pliers_spark.queries import QUERIES

    rows = []
    # urgent: prices 100..119; rest: prices 200..239 (same single date)
    for i in range(20):
        rows.append((i, i, "O", 100.0 + i, datetime(2024, 3, 5), "1-URGENT"))
    for i in range(40):
        rows.append((100 + i, i, "O", 200.0 + i, datetime(2024, 3, 5), "3-MEDIUM"))
    sf = _write(
        spark, tmp_path, "orders", rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    out = {r.covariate: r for r in QUERIES["covariate_balance"](spark, sf).collect()}
    p1 = [round((100.0 + i) * 100) for i in range(20)]
    p0 = [round((200.0 + i) * 100) for i in range(40)]
    m1, m0 = sum(p1) / 20, sum(p0) / 40
    v1 = sum(x * x for x in p1) / 20 - m1 * m1
    v0 = sum(x * x for x in p0) / 40 - m0 * m0
    want = round((m1 - m0) / math.sqrt((v1 + v0) / 2), 6)
    assert out["price_fp"].smd == want and want < -0.1  # badly unbalanced
    assert out["dow"].n1 == 20 and out["dow"].n0 == 40
    assert out["dow"].smd is None  # constant covariate -> NULL, not 0/0
