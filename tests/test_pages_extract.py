"""Differential test: the Arrow (mapInPandas) extraction stage must be
value-identical to the JVM-expression stage — same schema, same rows,
floats allclose. The flagship pipeline picks between the two on a flag
(pages_pipeline.pages_flagship(arrow_extract=...)), so they are pinned
together here on the synthetic pages table.
"""

import math

from pliers_spark.pages_pipeline import (
    extract_page_features,
    extract_page_features_arrow,
)

FLOAT_COLS = ("stopword_ratio", "quality")
INT_COLS = ("text_length", "n_tokens", "n_unique")


def _by_key(rows):
    return {(r["url"], r["warc_ts"]): r for r in rows}


def test_arrow_extract_matches_jvm_extract(spark, pages):
    jvm = extract_page_features(pages)
    arrow = extract_page_features_arrow(pages)
    assert jvm.columns == arrow.columns

    a = _by_key(r.asDict() for r in jvm.collect())
    b = _by_key(r.asDict() for r in arrow.collect())
    assert a.keys() == b.keys() and len(a) > 100

    for key, ra in a.items():
        rb = b[key]
        assert ra["lang"] == rb["lang"] and ra["lang_pred"] == rb["lang_pred"], key
        for c in INT_COLS:
            assert ra[c] == rb[c], (key, c, ra[c], rb[c])
        for c in FLOAT_COLS:
            assert math.isclose(ra[c], rb[c], rel_tol=1e-9, abs_tol=1e-9), (
                key,
                c,
                ra[c],
                rb[c],
            )


def test_arrow_extract_handles_empty_and_whitespace_text(spark):
    df = spark.createDataFrame(
        [
            ("u1", "2024-01-01 00:00:00", "", "en"),
            ("u2", "2024-01-01 00:00:00", "   \n\t ", "en"),
            ("u3", "2024-01-01 00:00:00", "the the the", "en"),
        ],
        "url string, warc_ts string, text string, lang string",
    ).selectExpr("url", "cast(warc_ts as timestamp) warc_ts", "text", "lang")
    a = _by_key(r.asDict() for r in extract_page_features(df).collect())
    b = _by_key(r.asDict() for r in extract_page_features_arrow(df).collect())
    assert a.keys() == b.keys()
    for key in a:
        for c in INT_COLS + FLOAT_COLS:
            av, bv = a[key][c], b[key][c]
            assert av == bv or math.isclose(av, bv, abs_tol=1e-9), (key, c, av, bv)
    u3 = next(v for (u, _), v in a.items() if u == "u3")
    assert u3["n_tokens"] == 3 and u3["n_unique"] == 1
    assert math.isclose(u3["stopword_ratio"], 1.0)
