"""Batch 56: AMS F2 sketch, negative-binomial fit, global transitivity."""

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


def test_ams_single_token_is_exact(spark, tmp_path):
    """One token with frequency 12: every estimator is (±12)² = 144 =
    exact F2 -> rel_err 0."""
    from pliers_spark.queries import QUERIES

    rows = [(1, " ".join(["solo"] * 12), "en", "A", 1)]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    r = QUERIES["ams_f2"](spark, sf).collect()[0]
    assert r.f2_exact == 144 and r.f2_est == 144 and r.rel_err == 0.0


def test_ams_tracks_truth_on_corpus(spark):
    """sf0.001 corpus: the median-of-means estimate stays within the
    same order of magnitude of exact F2. The 31-token vocabulary makes
    single-seed draws heavy-tailed (relative sd ~1.4 per estimator; a
    1024-seed unbiasedness check averaged 1.04x truth), so this pins
    sanity, not tightness."""
    from pliers_spark.queries import QUERIES

    r = QUERIES["ams_f2"](spark, "/root/testdata/sf0.001").collect()[0]
    assert r.f2_exact > 0
    assert abs(r.rel_err) < 0.9


def test_negbin_overdispersed_burst(spark, tmp_path):
    """One heavy user among ten: var >> mu -> NB parameters defined and
    consistent with the method-of-moments identities."""
    from pliers_spark.queries import QUERIES

    rows = [(i, datetime(2024, 1, 1), i, "t", 1.0, "") for i in range(10)]
    rows += [(100 + i, datetime(2024, 1, 1), 0, "t", 1.0, "") for i in range(40)]
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["negbin_fit"](spark, sf).collect()[0]
    assert r.var > r.mu
    assert r.nb_r is not None and r.nb_p is not None
    assert abs(r.nb_p - r.mu / r.var) < 1e-5
    assert 0 < r.nb_p < 1


def test_transitivity_triangle_plus_tail(spark, tmp_path):
    """K3 plus one pendant: triangles 1, wedges C(2,2)*2 + C(3,2) = 5
    -> transitivity 3/5."""
    from pliers_spark.queries import QUERIES

    rows = [(1, 10), (1, 11), (1, 12), (2, 12), (2, 13)]
    sf = _write(spark, tmp_path, "lineitem", rows, "l_orderkey long, l_partkey long")
    r = QUERIES["transitivity_global"](spark, sf).collect()[0]
    assert r.triangles == 1
    # degrees: 10->2, 11->2, 12->3, 13->1 ; wedges = 1+1+3+0 = 5
    assert r.wedges == 5
    assert r.transitivity == 0.6
