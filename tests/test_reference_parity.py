"""Differential parity vs the ACTUAL reference implementation.

Imports pliers unmodified from /root/reference (optional heavy deps
stubbed at import time — see tools/reference_throughput.py; none of the
stubbed code is on the paths exercised here, which are pure
Python/pandas) and asserts, per document of the real sf0.01 corpus:

- `LengthExtractor` feature value == engine `text_length` (north rule:
  feature vectors match at each key);
- `LowerCasingFilter` / `PunctuationRemovalFilter` output text is
  **byte-identical** to the engine's text-prep stages (north rule:
  byte-identical extracted text per url).

Stemmers/VADER/tokenizers need nltk corpora at *runtime* and are pinned
by clean-room golden tests instead (tests/test_stemming.py etc.).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def pliers_mods():
    from reference_throughput import install_stubs

    before = set(sys.modules)
    install_stubs()
    sys.path.insert(0, "/root/reference")
    try:
        from pliers.extractors import LengthExtractor
        from pliers.filters import LowerCasingFilter, PunctuationRemovalFilter
        from pliers.stimuli import TextStim
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")
    yield TextStim, LengthExtractor, LowerCasingFilter, PunctuationRemovalFilter
    # drop the import stubs + pliers so later test modules in this same
    # pytest process never see a fake nltk/scipy in sys.modules
    for name in set(sys.modules) - before:
        del sys.modules[name]
    sys.path.remove("/root/reference")


@pytest.fixture(scope="module")
def docs_pdf(spark):
    from pliers_spark.session import load_table

    return (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(100)
        .toPandas()
    )


def test_length_feature_matches_reference(spark, pliers_mods, docs_pdf):
    TextStim, LengthExtractor, *_ = pliers_mods
    from pliers_spark.queries import QUERIES

    ours = {
        r.doc_id: r.text_length
        for r in QUERIES["text_length"](spark, SF_DIR).collect()
    }
    ext = LengthExtractor()
    for _, row in docs_pdf.iterrows():
        ref = int(ext.transform(TextStim(text=row["text"])).to_df()["text_length"].iloc[0])
        assert ours[row["doc_id"]] == ref, row["doc_id"]


def test_text_prep_byte_identical_to_reference(spark, pliers_mods, docs_pdf):
    TextStim, _, LowerCasingFilter, PunctuationRemovalFilter = pliers_mods
    import pyspark.sql.functions as F

    from pliers_spark.functions import text as T

    df = spark.createDataFrame(docs_pdf)
    prepped = {
        r.doc_id: r.prepped
        for r in df.select(
            "doc_id",
            T.remove_punctuation(T.lower_case(F.col("text"))).alias("prepped"),
        ).collect()
    }
    lower, punct = LowerCasingFilter(), PunctuationRemovalFilter()
    for _, row in docs_pdf.iterrows():
        ref_text = punct.transform(lower.transform(TextStim(text=row["text"]))).text
        assert prepped[row["doc_id"]] == ref_text, row["doc_id"]  # byte-identical
