"""Batch 99: NP chunks, Calinski-Harabasz, GMM-EM."""

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
EMB = "vec_id long, embedding array<float>, label int"


def test_np_chunks_pattern(spark, tmp_path):
    """'the useful table' is DT JJ NN -> one chunk of 3 tokens;
    a verb-only doc has zero chunks."""
    from pliers_spark.queries import QUERIES

    rows = [
        (0, "the useful table is running", "en", "s", 27),
        (1, "is are was", "en", "s", 10),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.doc_id: r for r in QUERIES["np_chunks"](spark, sf).collect()}
    # doc 0: 'the'=DT, 'useful'=JJ? 'useful' ends in 'ful' -> JJ, but DT-precedence
    # makes the token AFTER a determiner NN; tag stream = D N V(?) ...; at least
    # one chunk containing the determiner-noun pair
    assert out[0].n_np_chunks >= 1
    assert out[0].np_token_len >= 2
    assert out[1].n_np_chunks == 0


def test_calinski_harabasz_separation(spark, tmp_path):
    """Separated clusters score far higher than overlapping ones."""
    from pliers_spark.queries import QUERIES

    def mk(sep):
        rows = []
        for lbl in (0, 1):
            for i in range(10):
                v = [lbl * sep + 0.01 * ((i + j) % 3) for j in range(8)]
                rows.append((lbl * 100 + i, [float(x) for x in v] + [0.0] * 56, lbl))
        return rows

    sf1 = _write(spark, tmp_path, "embeddings", mk(5.0), EMB)
    hi = QUERIES["calinski_harabasz"](spark, sf1).collect()[0]
    sf2 = _write(spark, tmp_path, "embeddings", mk(0.02), EMB)
    lo = QUERIES["calinski_harabasz"](spark, sf2).collect()[0]
    assert hi.n == 20 and hi.k == 2
    assert hi.ch_index > 100 * max(lo.ch_index, 1e-6)


def test_gmm_em_recovers_bimodal(spark, tmp_path):
    """Two clear modes at 10 and 50 (60/40 mix): EM lands mu1~10,
    mu2~50, pi ~ 0.6, sigma small."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    for i in range(60):
        rows.append((eid, datetime(2024, 1, 1, 0, 0, 0, eid), eid, "c", 10.0 + 0.1 * (i % 5), "{}"))
        eid += 1
    for i in range(40):
        rows.append((eid, datetime(2024, 1, 1, 0, 1, 0, eid), eid, "c", 50.0 + 0.1 * (i % 5), "{}"))
        eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["gmm_em_1d"](spark, sf).collect()[0]
    assert r.n == 100
    assert abs(r.mu1 - 10.2) < 0.5
    assert abs(r.mu2 - 50.2) < 0.5
    assert abs(r.pi1 - 0.6) < 0.05
    assert r.sigma < 2.0
