"""Batch 25: Kneser-Ney LM, Burrows' Delta stylometry, item-item cosine."""

import math
import os


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


DOCS = "doc_id long, text string, lang string, source string, n_chars long"


def test_kn_fluent_beats_disfluent(spark, tmp_path):
    """A doc made of the corpus's dominant bigrams must out-score a doc
    of one-off bigrams; perplexity is exp(-avg_lp) of the rounded avg."""
    from pliers_spark.queries import QUERIES

    common = "the cat sat on the mat"
    rows = [(i, common, "en", "A", 10) for i in range(20)]
    rows.append((100, common, "en", "A", 10))              # fluent probe
    rows.append((101, "zq wv xk jm pf bg", "en", "A", 10))  # disfluent probe
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.doc_id: r for r in QUERIES["kn_perplexity"](spark, sf).collect()}
    assert out[100].avg_lp > out[101].avg_lp
    assert out[100].ppl < out[101].ppl
    for r in out.values():
        assert r.ppl == round(math.exp(-r.avg_lp), 6)


def test_kn_discount_mass_is_redistributed(spark, tmp_path):
    """All per-bigram KN probabilities lie in (0,1): the discounted term
    stays positive (every scored bigram was seen) and interpolation never
    pushes past 1 — so every doc's avg log-prob is strictly negative."""
    from pliers_spark.queries import QUERIES

    rows = [(i, f"alpha beta gamma token{i} alpha beta", "en", "A", 10) for i in range(12)]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    for r in QUERIES["kn_perplexity"](spark, sf).collect():
        assert r.n_bigrams > 0 and r.avg_lp < 0 and r.ppl > 1


def test_burrows_delta_separates_styles(spark, tmp_path):
    """Two stylistically identical sources sit closer than either does
    to a divergent third source; output covers all 3 pairs."""
    from pliers_spark.queries import QUERIES

    plain = "the quick brown fox jumps over the lazy dog again and again"
    odd = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    rows = (
        [(i, plain, "en", "A", 10) for i in range(15)]
        + [(100 + i, plain, "en", "B", 10) for i in range(15)]
        + [(200 + i, odd, "en", "C", 10) for i in range(15)]
    )
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {(r.source_a, r.source_b): r.delta for r in QUERIES["burrows_delta"](spark, sf).collect()}
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    assert out[("A", "B")] < out[("A", "C")]
    assert out[("A", "B")] < out[("B", "C")]


def test_item_cosine_hand_case(spark, tmp_path):
    """cos(p1,p2)=2/sqrt(3*2), cos(p1,p3)=1/sqrt(3); singleton baskets are
    excluded; ranks are per-item and cosine-descending."""
    from pliers_spark.queries import QUERIES

    rows = [
        (1, 1), (1, 2),
        (2, 1), (2, 2),
        (3, 1), (3, 3),
        (4, 9),            # singleton basket → excluded entirely
    ]
    sf = _write(spark, tmp_path, "lineitem", rows, "l_orderkey long, l_partkey long")
    out = {(r.part_id, r.neighbor_id): r for r in QUERIES["item_cosine"](spark, sf).collect()}
    assert out[(1, 2)].cosine == round(2 / math.sqrt(3 * 2), 6)
    assert out[(1, 3)].cosine == round(1 / math.sqrt(3 * 1), 6)
    assert out[(1, 2)].rank == 1 and out[(1, 3)].rank == 2
    assert (2, 3) not in out and not any(p == 9 or n == 9 for p, n in out)
