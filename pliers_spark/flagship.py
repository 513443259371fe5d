"""Flagship pipeline: full text feature extraction, merged wide.

The Spark recast of a pliers ``Graph`` with several extractor leaves
followed by ``merge_results(format='wide')`` — each extractor is a
JVM-side column stage over one scan of ``documents``; because all
stages are narrow maps over the same scan, Catalyst fuses them into a
single whole-stage-codegen pass (no join needed when stages share the
scan — ``merge_features`` exists for stages with different keys/fanout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import text as T
from .session import load_table


def flagship_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the local parquet is sub-MB → 1 split, but every column
    # below is CPU-heavy regex/membership work; fan the scan out first
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return docs.select(
        "doc_id",
        "lang",
        T.text_length("text").cast("long").alias("text_length"),
        T.token_count("text").cast("long").alias("n_tokens"),
        T.num_unique_words("text").cast("long").alias("n_unique"),
        F.round(T.stopword_ratio("text"), 6).alias("stopword_ratio"),
        T.quality_score("text").alias("quality"),
        T.langid_best("text").alias("lang_pred"),
    )
