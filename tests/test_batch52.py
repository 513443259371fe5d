"""Batch 52: hub resilience, split leakage audit, Breusch-Pagan."""

import os


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


DOCS = "doc_id long, text string, lang string, source string, n_chars long"


def test_hub_resilience_star_shatters(spark, tmp_path):
    """A hub-and-spoke graph loses its giant component entirely once
    the hub (top-degree node) is removed."""
    from pliers_spark.queries import QUERIES

    # 12 baskets each pairing hub part 1 with a distinct leaf
    rows = []
    for k in range(12):
        rows.append((k, 1)); rows.append((k, 100 + k))
    sf = _write(spark, tmp_path, "lineitem", rows, "l_orderkey long, l_partkey long")
    r = QUERIES["hub_resilience"](spark, sf).collect()[0]
    assert r.n_nodes == 13 and r.giant_before == 13
    assert r.edges_after == 0 and r.giant_after == 0
    assert r.giant_retention == 0.0


def test_split_leakage_content_hash_colocates_exact_dups(spark, tmp_path):
    """Identical docs (near-dup pairs with identical text): the content
    hash puts every pair in ONE split (straddle 0); the id hash lets
    pairs straddle with positive probability."""
    from pliers_spark.queries import QUERIES

    dup = "the very same duplicated text appears in all of these documents"
    rows = [(i, dup, "en", "A", 1) for i in range(40)]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.scheme: r for r in QUERIES["split_leakage_audit"](spark, sf).collect()}
    assert out["content_hash"].n_straddle == 0
    assert out["content_hash"].n_pairs == out["id_hash"].n_pairs > 0
    assert out["id_hash"].n_straddle > 0  # 40 ids spread over 80/10/10


def test_bp_detects_planted_heteroscedasticity(spark, tmp_path):
    """Residual spread growing with x -> large LM; constant spread ->
    small LM."""
    from pliers_spark.queries import QUERIES

    # heteroscedastic: y = 10x + noise proportional to x (deterministic +-)
    rows = [(i, " ".join(["w"] * (10 + i)), "en", "A",
             10 * (10 + i) + (1 if i % 2 else -1) * (10 + i)) for i in range(200)]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    r = QUERIES["heteroscedasticity_bp"](spark, sf).collect()[0]
    assert r.n == 200 and r.lm_stat is not None and r.lm_stat > 10

    noise = [3, -4, -3, 4]  # varied but x-independent spread
    rows2 = [(i, " ".join(["w"] * (10 + i)), "en", "A",
              10 * (10 + i) + noise[i % 4]) for i in range(200)]
    sf2 = _write(spark, tmp_path / "b", "documents", rows2, DOCS)
    r2 = QUERIES["heteroscedasticity_bp"](spark, sf2).collect()[0]
    assert r2.lm_stat is not None and r2.lm_stat < 1
