"""Batch 37: LSH band sweep, recommender coverage, missing mass."""

import os


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


DOCS = "doc_id long, text string, lang string, source string, n_chars long"


def test_lsh_sweep_monotone_in_bands(spark):
    """More bands (shorter rows) can only ADD candidate pairs on the
    same signatures, and theory capture probabilities rise with bands."""
    from pliers_spark.queries import QUERIES

    out = {r.bands: r for r in QUERIES["lsh_band_sweep"](spark, "/root/testdata/sf0.001").collect()}
    assert set(out) == {1, 2, 4, 8}
    assert out[1].n_candidates <= out[2].n_candidates <= out[4].n_candidates <= out[8].n_candidates
    for s in ("p_at_s50", "p_at_s80", "p_at_s90"):
        vals = [getattr(out[b], s) for b in (1, 2, 4, 8)]
        assert vals == sorted(vals)
    # closed form spot-check: 1 band of 8 rows at s=0.9 -> 0.9^8
    assert out[1].p_at_s90 == round(0.9**8, 6)


def test_rec_coverage_star_bias(spark, tmp_path):
    """Hub-and-spoke baskets: the hub is in every top list, spokes are
    recommended by the hub only -> coverage counts, gini positive."""
    from pliers_spark.queries import QUERIES

    rows = [(k, 1) for k in range(10, 18)] + [(k, k) for k in range(10, 18)]
    sf = _write(spark, tmp_path, "lineitem", rows, "l_orderkey long, l_partkey long")
    r = QUERIES["rec_coverage"](spark, sf).collect()[0]
    assert r.catalog == 9
    # hub (part 1) recommends its top-5 spokes; each spoke recommends the hub
    assert r.recommended >= 6
    assert 0.0 <= r.gini <= 1.0 and r.gini > 0.0


def test_missing_mass_hand_counts(spark, tmp_path):
    """aa x3, bb x2, cc x1, dd x1 -> hapax 2/7, chao1 = 4 + 2*1/(2*2)."""
    from pliers_spark.queries import QUERIES

    text = "aa aa aa bb bb cc dd"
    sf = _write(spark, tmp_path, "documents", [(1, text, "en", "A", 1)], DOCS)
    r = QUERIES["missing_mass"](spark, sf).collect()[0]
    assert r.n_tokens == 7 and r.s_obs == 4
    assert r.hapax == 2 and r.doubletons == 1
    assert r.missing_mass == round(2 / 7, 6)
    assert r.chao1 == round(4 + 2 * 1 / (2 * (1 + 1)), 6)
