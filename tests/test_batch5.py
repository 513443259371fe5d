"""Batch-5 operators: framed aggregation, SimHash banded near-dups,
closed-form diagnostics — each verified against an independent
brute-force/numpy computation."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def tiny_events(spark):
    rows = []
    # two users, events at known second offsets from the origin
    for uid, offs in [(1, [0, 10, 3599, 3600, 7199, 7200, 10800]), (2, [5, 4000, 99999])]:
        for o in offs:
            rows.append((uid, float(o), float(o) % 7.0 + 1.0))
    return spark.createDataFrame(rows, "user_id int, off double, value double")


def test_framed_agg_matches_bruteforce(spark, tiny_events):
    from pliers_spark.operators.temporal import framed_agg

    origin = "2024-01-01 00:00:00"
    ev = tiny_events.select(
        "user_id",
        (F.to_timestamp(F.lit(origin)) + F.make_interval(secs=F.col("off"))).alias("ts"),
        "value",
    )
    out = framed_agg(
        ev, ["user_id"], "ts", "value", frame_seconds=7200, hop_seconds=3600,
        origin=origin, aggs={"n": "count", "s": "sum"},
    ).collect()
    got = {(r.user_id, r.frame_id): (r.n, round(r.s, 9)) for r in out}

    # brute force: frame i covers [i*3600, i*3600 + 7200)
    rows = tiny_events.collect()
    exp = {}
    max_frame = int(max(r.off for r in rows) // 3600) + 1
    for i in range(max_frame + 1):
        lo, hi = i * 3600, i * 3600 + 7200
        for uid in {r.user_id for r in rows}:
            vals = [r.value for r in rows if r.user_id == uid and lo <= r.off < hi]
            if vals:
                exp[(uid, i)] = (len(vals), round(sum(vals), 9))
    assert got == exp


def test_framed_agg_fanout_bound(spark, tiny_events):
    """Each input row lands in exactly ceil(frame/hop) frames (interior rows)."""
    from pliers_spark.operators.temporal import framed_agg

    origin = "2024-01-01 00:00:00"
    ev = tiny_events.select(
        "user_id",
        (F.to_timestamp(F.lit(origin)) + F.make_interval(secs=F.col("off"))).alias("ts"),
        "value",
    )
    out = framed_agg(ev, ["user_id"], "ts", "value", 7200, 3600, origin=origin,
                     aggs={"n": "count"})
    total = out.agg(F.sum("n")).first()[0]
    n_rows = ev.count()
    assert total <= 2 * n_rows  # fan-out factor = frame/hop = 2


def test_simhash_near_dups_exact_vs_bruteforce(spark, pages):
    from pliers_spark.operators.dedup import simhash_near_dup_pairs, simhash_fingerprints

    docs = (
        pages.select(F.col("url").alias("doc_id"), "text")
        .dropDuplicates(["doc_id"])
        .limit(120)
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_dup_pairs(docs, "text", "doc_id", bits=16, bands=4,
                                        max_hamming=3).collect()
    }
    sims = {r.doc_id: r.simhash for r in
            simhash_fingerprints(docs, "text", "doc_id", bits=16).collect()}
    ids = sorted(sims)
    exp = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sims[a] ^ sims[b]).count("1")
            if h <= 3:
                exp.add((min(a, b), max(a, b), h))
    assert got == exp  # banded search is exact for max_hamming < bands


def test_vif3_matches_numpy(spark, pages):
    from pliers_spark.functions import text as T
    from pliers_spark.operators.diagnostics import vif3

    f = pages.select(
        T.text_length("text").cast("double").alias("a"),
        T.token_count("text").cast("double").alias("b"),
        T.num_unique_words("text").cast("double").alias("c"),
    )
    row = vif3(f, "a", "b", "c").first()
    m = np.array([[r.a, r.b, r.c] for r in f.collect()])
    corr = np.corrcoef(m, rowvar=False)
    vif = np.diag(np.linalg.inv(corr))
    assert np.allclose([row["vif_a"], row["vif_b"], row["vif_c"]], vif, atol=1e-3)


def test_mahalanobis2_matches_numpy(spark, pages):
    from pliers_spark.functions import text as T
    from pliers_spark.operators.diagnostics import mahalanobis2

    f = pages.select(
        F.col("url"),
        F.col("warc_ts"),
        T.text_length("text").cast("double").alias("a"),
        T.num_unique_words("text").cast("double").alias("b"),
    )
    out = {(r.url, r.warc_ts): r.mahalanobis
           for r in mahalanobis2(f, ["url", "warc_ts"], "a", "b").collect()}
    rows = f.collect()
    m = np.array([[r.a, r.b] for r in rows])
    cov = np.cov(m, rowvar=False)
    inv = np.linalg.inv(cov)
    mu = m.mean(axis=0)
    for r, x in zip(rows, m):
        d = math.sqrt((x - mu) @ inv @ (x - mu))
        assert abs(out[(r.url, r.warc_ts)] - d) < 1e-3


def test_feature_variances(spark, pages):
    from pliers_spark.functions import text as T
    from pliers_spark.operators.diagnostics import feature_variances

    f = pages.select(T.text_length("text").cast("double").alias("a"))
    got = feature_variances(f, ["a"]).first()["var_a"]
    vals = [r.a for r in f.collect()]
    assert abs(got - float(np.var(vals, ddof=1))) < 1e-4


def test_eigen_diagnostics_matches_numpy(spark, pages):
    """Reference semantics: eigenvalues of np.corrcoef of the merged
    feature table; condition index sqrt(max/λ)
    (pliers/diagnostics/base.py:25-46) — K=4 exercises the general path."""
    from pliers_spark.functions import text as T
    from pliers_spark.operators.diagnostics import eigen_diagnostics

    f = pages.select(
        T.text_length("text").cast("double").alias("a"),
        T.token_count("text").cast("double").alias("b"),
        T.num_unique_words("text").cast("double").alias("c"),
        (T.text_length("text") % 17).cast("double").alias("d"),
    )
    out = eigen_diagnostics(spark, f, ["a", "b", "c", "d"]).orderBy("rank").collect()
    m = np.array([[r.a, r.b, r.c, r.d] for r in f.collect()])
    ref = np.sort(np.linalg.eigvals(np.corrcoef(m, rowvar=False)).real)[::-1]
    got = [r.eigenvalue for r in out]
    assert np.allclose(got, ref, atol=1e-4)
    ci = [r.condition_index for r in out]
    assert np.allclose(ci, np.sqrt(ref[0] / ref), atol=1e-3)
    assert out[0].rank == 1 and len(out) == 4


def test_to_sklearn_adapter(spark):
    """PliersTransformer parity (pliers/utils/scikit.py:18-55): metadata
    split + float matrix, with the accidental-collect guard."""
    import numpy as np
    import pytest

    from pliers_spark.operators.results import to_sklearn

    df = spark.createDataFrame(
        [("a", 1.0, 2.0), ("b", 3.0, 4.0)], "stim string, f1 double, f2 double"
    )
    X, meta = to_sklearn(df)
    assert X.shape == (2, 2) and X.dtype == np.float64
    assert list(meta.columns) == ["stim"]
    assert sorted(X[:, 0].tolist()) == [1.0, 3.0]
    with pytest.raises(ValueError, match="max_rows"):
        to_sklearn(df, max_rows=1)


def test_vocab_hll_within_5pct_of_exact(spark):
    """The 100 TB scale path for corpus_stats.vocab_size: HLL sketch
    (approx_count_distinct) must land within 5% of the exact distinct
    on the test corpus."""
    from pyspark.sql import functions as F

    from pliers_spark.functions import text as T
    from pliers_spark.session import load_table

    toks = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select(F.explode(T.tokenize(F.col("text"))).alias("token"))
    )
    row = toks.agg(
        F.countDistinct("token").alias("exact"),
        F.approx_count_distinct("token", 0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05
