"""Batch 46: MASE backtest, FK orphan audit, novelty decay curve."""

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


def test_mase_weekly_pattern_wins(spark, tmp_path):
    """A strict weekly pattern: seasonal-naive is perfect (MASE = 0);
    a linear trend: seasonal error is 7x the naive error (MASE = 7)."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    base = datetime(2024, 1, 1)
    weekly = [1, 2, 3, 4, 5, 6, 7]
    for day in range(21):
        for _ in range(weekly[day % 7]):
            rows.append((eid, base + timedelta(days=day), 1, "weekly", 1.0, "")); eid += 1
        for _ in range(day + 1):   # linear trend: c_t = t+1
            rows.append((eid, base + timedelta(days=day), 1, "trend", 1.0, "")); eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = {r.event_type: r for r in QUERIES["mase_backtest"](spark, sf).collect()}
    assert out["weekly"].abs_err_seasonal == 0 and out["weekly"].mase == 0.0
    assert out["trend"].mase == 7.0  # |c_t - c_{t-7}| = 7, |c_t - c_{t-1}| = 1


def test_fk_orphans_planted(spark, tmp_path):
    """An order pointing at a missing customer is the only orphan."""
    from pliers_spark.queries import QUERIES

    _write(spark, tmp_path, "customer",
           [(1, 0), (2, 0)], "c_custkey long, c_nationkey long")
    _write(spark, tmp_path, "orders",
           [(10, 1, "O", 5.0, datetime(2024, 1, 1), "x"),
            (11, 99, "O", 5.0, datetime(2024, 1, 1), "x")],
           "o_orderkey long, o_custkey long, o_orderstatus string, "
           "o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    _write(spark, tmp_path, "lineitem",
           [(10, 1), (99, 1)], "l_orderkey long, l_partkey long")
    _write(spark, tmp_path, "part", [(1,)], "p_partkey long")
    _write(spark, tmp_path, "nation", [(0,)], "n_nationkey long")
    _write(spark, tmp_path, "supplier", [(1, 0)], "s_suppkey long, s_nationkey long")
    out = {r.relation: r for r in QUERIES["fk_orphans"](spark, str(tmp_path)).collect()}
    assert out["orders.o_custkey->customer"].orphans == 1
    assert out["lineitem.l_orderkey->orders"].orphans == 1
    assert out["lineitem.l_partkey->part"].orphans == 0
    assert out["customer.c_nationkey->nation"].orphans == 0


def test_novelty_decay_repeated_tail(spark, tmp_path):
    """First docs introduce all shingles; identical later docs introduce
    none -> novelty_rate decays to 0 in the last deciles."""
    from pliers_spark.queries import QUERIES

    text = "alpha beta gamma delta epsilon zeta"
    rows = [(i, text, "en", "A", 1) for i in range(20)]
    rows[0] = (0, "alpha beta gamma delta epsilon zeta", "en", "A", 1)
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.decile: r for r in QUERIES["novelty_decay"](spark, sf).collect()}
    assert out[0].first_seen > 0 and out[0].novelty_rate > 0
    assert out[9].first_seen == 0 and out[9].novelty_rate == 0.0
    rates = [out[d].novelty_rate for d in sorted(out)]
    assert rates == sorted(rates, reverse=True)
