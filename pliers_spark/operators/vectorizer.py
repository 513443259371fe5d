"""Two-pass text vectorization — TextVectorizerExtractor recast.

The reference fits a sklearn CountVectorizer/Tfidf over the whole batch
then emits per-doc vectors (``pliers/extractors/text.py:282-315``) —
a global vocabulary is inherently a two-pass aggregation:

pass 1: explode tokens → groupBy(term) → count + document frequency →
        top-``vocab_size`` vocabulary (broadcast dimension);
pass 2: per-doc term counts joined against the broadcast vocabulary.

Output is **long** (doc, term, tf[, tfidf]) — the Spark-native shape for
a data-dependent schema (wide would need a dynamic pivot; MapType is the
escape hatch when a single column is required).

IDF follows sklearn's smooth formula idf = ln((1+N)/(1+df)) + 1
(the reference's default TfidfVectorizer), rounded for cross-engine
comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def doc_term_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, term, tf) — explode + count; one shuffle on (doc, term)."""
    return (
        df.select(F.col(id_col), F.explode(T.tokenize(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def build_vocabulary(
    df: DataFrame, id_col: str, text_col: str, vocab_size: int,
    dtc: DataFrame | None = None,
) -> DataFrame:
    """Pass 1: top-``vocab_size`` terms by collection frequency
    (ties broken lexicographically — deterministic), with document
    frequency for IDF. Pass ``dtc`` to reuse an already-materialized
    doc-term frame instead of re-deriving it."""
    if dtc is None:
        dtc = doc_term_counts(df, id_col, text_col)
    stats = dtc.groupBy("term").agg(
        F.sum("tf").alias("cf"), F.count(F.lit(1)).alias("df")
    )
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition heap
    # + driver merge of N rows) — never the single-partition global
    # window a row_number() over an unpartitioned Window would force.
    return stats.orderBy(F.desc("cf"), F.col("term")).limit(vocab_size)


def count_vectorize(df: DataFrame, id_col: str, text_col: str, vocab_size: int = 32) -> DataFrame:
    """(doc, term, tf) restricted to the global top-N vocabulary.

    The doc-term frame feeds BOTH passes (vocabulary fit and the final
    join), so it is checkpointed once — without this the scan + tokenize
    + explode + (doc, term) shuffle executes twice, which at corpus
    scale doubles the dominant cost (r3 bench: tfidf 2.55s -> ~1.6s at
    sf0.1)."""
    dtc = doc_term_counts(df, id_col, text_col).stableCheckpoint(eager=True)
    vocab = build_vocabulary(df, id_col, text_col, vocab_size, dtc=dtc).select("term")
    return dtc.join(F.broadcast(vocab), "term").select(id_col, "term", "tf")


def tfidf_vectorize(df: DataFrame, id_col: str, text_col: str, vocab_size: int = 32) -> DataFrame:
    """(doc, term, tf, tfidf) with sklearn-style smooth IDF. Same
    single-materialization discipline as :func:`count_vectorize`; N
    comes from the raw frame (a doc with zero tokens still counts in
    sklearn's N)."""
    n_docs = df.select(F.countDistinct(id_col)).first()[0]
    dtc = doc_term_counts(df, id_col, text_col).stableCheckpoint(eager=True)
    vocab = build_vocabulary(df, id_col, text_col, vocab_size, dtc=dtc)
    joined = dtc.join(F.broadcast(vocab.select("term", "df")), "term")
    idf = F.log((F.lit(1.0) + F.lit(float(n_docs))) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)
    return joined.select(
        id_col, "term", "tf", F.round(F.col("tf") * idf, 6).alias("tfidf")
    )
