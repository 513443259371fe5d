"""Batch 79: Lin's CCC, Ljung-Box portmanteau, l-diversity audit."""

import math
import os
from datetime import datetime, timedelta


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


DOCS = "doc_id long, text string, lang string, source string, n_chars long"
EVENTS = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_lin_ccc_perfect_agreement(spark, tmp_path):
    """y == x exactly (text with n_chars tokens): CCC = 1 = Pearson."""
    from pliers_spark.queries import QUERIES

    rows = [(i, " ".join(["w"] * k), "en", "s", k) for i, k in enumerate([3, 5, 9, 17])]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    r = QUERIES["lin_ccc"](spark, sf).collect()[0]
    assert r.n == 4 and r.ccc == 1.0 and r.pearson_r == 1.0


def test_lin_ccc_scale_bias_penalized(spark, tmp_path):
    """y = 2x keeps Pearson at 1 but CCC below 1 — hand value:
    x=[2,4,6], y=[1,2,3] (tokens = n_chars/2): CCC = 2*cov/(vx+vy+d2)."""
    from pliers_spark.queries import QUERIES

    rows = [(i, " ".join(["w"] * (k // 2)), "en", "s", k) for i, k in enumerate([2, 4, 6])]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    r = QUERIES["lin_ccc"](spark, sf).collect()[0]
    n, sx, sy, sxx, syy, sxy = 3, 12, 6, 56, 14, 28
    num = 2.0 * (n * sxy - sx * sy)
    den = (n * sxx - sx * sx) + (n * syy - sy * sy) + (sx - sy) ** 2
    assert r.pearson_r == 1.0
    assert abs(r.ccc - round(num / den, 6)) < 1e-9
    assert r.ccc < 1.0


def test_ljung_box_alternating_series(spark, tmp_path):
    """Daily counts 1,3,1,3,... over 8 days: r1 = -1 scaled-dev
    autocorrelation at the sample edge convention (sum to n-k), and
    Q accumulates n(n+2)*r_k^2/(n-k)."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    for day in range(8):
        cnt = 1 if day % 2 == 0 else 3
        for j in range(cnt):
            rows.append(
                (eid, datetime(2024, 1, 1 + day, 0, 0, j), eid, "click", 1.0, "{}")
            )
            eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = {r.lag: r for r in QUERIES["ljung_box"](spark, sf).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    # replicate: x=[1,3]*4, n=8, s=16, c = 8x-16 = [-8,8]*4
    c = [-8, 8] * 4
    n = 8
    den = sum(v * v for v in c)
    q = 0.0
    for k in range(1, 6):
        num = sum(c[t] * c[t + k] for t in range(n - k))
        rk = num / den
        q += rk * rk / (n - k)
        assert abs(out[k].r - round(rk, 6)) < 1e-9
        assert abs(out[k].q_cum - round(n * (n + 2) * q, 6)) < 1e-6


def test_l_diversity_homogeneous_group_flagged(spark, tmp_path):
    """Group A: all 4 docs share one sensitive bucket -> l=1, entropy_l=1.
    Group B: 2+2 across two buckets -> l=2, entropy_l=2."""
    from pliers_spark.queries import QUERIES

    rows = [(i, "t", "en", "A", 150) for i in range(4)]
    rows += [(10 + i, "t", "en", "B", 150) for i in range(2)]
    rows += [(20 + i, "t", "en", "B", 250) for i in range(2)]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.source: r for r in QUERIES["l_diversity"](spark, sf).collect()}
    assert out["A"].k == 4 and out["A"].l_distinct == 1 and out["A"].entropy_l == 1.0
    assert out["B"].k == 4 and out["B"].l_distinct == 2
    assert abs(out["B"].entropy_l - round(math.exp(2 * round(-1e6 * 0.5 * math.log(0.5)) / 1e6), 6)) < 1e-9
