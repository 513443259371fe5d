"""Batch 40: RFM segmentation, passage BM25, linkage threshold profile."""

import os
from datetime import datetime


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


DOCS = "doc_id long, text string, lang string, source string, n_chars long"
ORDERS = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def test_rfm_extreme_customers(spark, tmp_path):
    """10 customers with jointly increasing R, F, M -> customer 9 gets
    555, customer 0 gets 111; quintiles have 2 customers each."""
    from pliers_spark.queries import QUERIES

    rows = []
    k = 0
    for c in range(10):
        for j in range(c + 1):  # frequency c+1
            rows.append((k, c, "O", 100.0 * (c + 1), datetime(2024, 1, 1 + c), "x"))
            k += 1
    sf = _write(spark, tmp_path, "orders", rows, ORDERS)
    out = {r.o_custkey: r for r in QUERIES["rfm_scores"](spark, sf).collect()}
    assert out[9].rfm_code == 555 and out[0].rfm_code == 111
    from collections import Counter

    for dim in ("r_score", "f_score", "m_score"):
        assert Counter(getattr(out[c], dim) for c in range(10)) == Counter(
            {1: 2, 2: 2, 3: 2, 4: 2, 5: 2}
        )


def test_passage_bm25_finds_planted_passage(spark, tmp_path):
    """A query term buried in the THIRD passage of a long doc must rank
    that (doc, passage 2) first for the seed containing it."""
    from pliers_spark.queries import QUERIES

    filler = " ".join(f"pad{i}" for i in range(64))       # passages 0-1
    rows = [
        (1, "needleterm one two three four five", "en", "A", 1),  # seed doc
        (50, filler + " needleterm special content here", "en", "A", 1),
    ] + [(100 + i, "unrelated words entirely different", "en", "A", 1) for i in range(6)]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = [r for r in QUERIES["passage_bm25"](spark, sf).collect() if r.q_id == 1]
    top = [r for r in out if r.rank == 1][0]
    # rank-1 must be a needleterm passage: the seed doc itself or doc 50's passage 2
    assert (top.doc_id, top.passage_idx) in {(1, 0), (50, 2)}
    assert any(r.doc_id == 50 and r.passage_idx == 2 for r in out)


def test_linkage_profile_monotone(spark, tmp_path):
    """Looser thresholds only add pairs/nodes and can only merge
    clusters; identical docs cluster even at hamming <= 1."""
    from pliers_spark.queries import QUERIES

    dup = "exactly the same words in this duplicated document body here"
    rows = [(i, dup, "en", "A", 1) for i in range(4)] + [
        (100 + i, f"different unique{i} text with other words {i}", "en", "A", 1)
        for i in range(4)
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.max_hamming: r for r in QUERIES["linkage_profile"](spark, sf).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_pairs <= out[2].n_pairs <= out[3].n_pairs
    assert out[1].n_nodes <= out[2].n_nodes <= out[3].n_nodes
    assert out[1].n_pairs >= 6  # the 4 identical docs pair completely
    assert out[1].n_clusters >= 1
