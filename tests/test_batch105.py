"""Batch 105: hash-ring migration, ZIP moments, casefold collisions."""

import os
from datetime import datetime


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


def test_hashring_migration_near_ideal(spark, tmp_path):
    """With 1000 keys and 16 vnodes, the 8->9 server migration moves
    close to 1/9 of keys — and far less than modulo-sharding's 8/9."""
    from pliers_spark.queries import QUERIES

    rows = [(i, "t", "en", "s", 10) for i in range(1000)]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    r = QUERIES["hashring_migration"](spark, sf).collect()[0]
    assert r.n_keys == 1000
    assert 0.03 < r.moved_frac < 0.30  # consistent-hash regime
    assert r.moved_frac < 0.5  # decisively better than mod-N reshard


def test_zip_moments_recovers_inflation(spark, tmp_path):
    """60 structural zeros + 40 Poisson(3)-ish buyers: pi ~ 0.6 zone
    and lambda near the buyer mean."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    for u in range(100):
        if u < 60:
            rows.append((eid, datetime(2024, 1, 1, 0, 0, 0, eid), u, "view", 1.0, "{}"))
            eid += 1
        else:
            for _ in range(3 + (u % 3) - 1):  # 2..4 purchases
                rows.append((eid, datetime(2024, 1, 1, 0, 0, 0, eid), u, "purchase", 1.0, "{}"))
                eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["zip_moments"](spark, sf).collect()[0]
    assert r.n == 100 and r.n0 == 60
    assert r.lambda_zip is not None and 2.0 < r.lambda_zip < 4.5
    assert r.pi_zero is not None and 0.45 < r.pi_zero < 0.75
    assert r.observed_zero_frac == 0.6


def test_casefold_collisions(spark, tmp_path):
    from pliers_spark.queries import QUERIES

    rows = [
        (0, "Spark spark SPARK table", "en", "s", 24),
        (1, "unique tokens only here", "en", "s", 23),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.folded: r for r in QUERIES["casefold_collisions"](spark, sf).collect()}
    assert list(out) == ["spark"]
    assert out["spark"].n_variants == 3
    assert out["spark"].first_variant == "SPARK" and out["spark"].last_variant == "spark"
