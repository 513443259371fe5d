"""WordEmbeddingExtractor recast: token → vector lookup + pooling.

Parity target: ``WordEmbeddingExtractor`` (``pliers/extractors/text.py:
232-279``) — gensim KeyedVectors row per word, zeros for OOV, plus
Bert-style pooling (``np.<fn>`` over token vectors,
``pliers/extractors/text.py:412-831``). The engine form:

- a real embedding table is a broadcast dimension join
  (``operators/dictionary.dictionary_lookup`` with an array column);
- for environments without a model file, :func:`hash_embedding` derives
  a deterministic pseudo-embedding from md5 bytes of the token — useful
  for plumbing tests AND reproducible in SQL for the DuckDB oracle;
- pooling = per-dimension aggregate (mean/max) after explode, which is
  map-side combinable — no vector UDF needed for linear pooling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import text as T


def hash_embedding_dim(token: Column, d: int) -> Column:
    """Dimension ``d`` of the deterministic md5 pseudo-embedding:
    two hex chars → [0,255] → scaled to [-1, 1]."""
    byte = F.conv(F.substring(F.md5(token), 2 * d + 1, 2), 16, 10).cast("double")
    return F.round(byte / F.lit(255.0) * 2.0 - 1.0, 6)


def hash_embedding_dim_sql(token_expr: str, d: int) -> str:
    return (
        f"round(CAST(concat('0x', substr(md5({token_expr}), {2 * d + 1}, 2)) AS INT)::DOUBLE"
        f" / 255.0 * 2.0 - 1.0, 6)"
    )


def hash_embedding_dim_ppm(token: Column, d: int) -> Column:
    """Dimension ``d`` as an exact BIGINT in parts-per-million
    (round(byte*2e6/255) - 1e6 ∈ [-1e6, 1e6] ≡ hash_embedding_dim·1e6).
    Integer form exists so aggregates over it (sum/avg) are exact and
    order-independent — the float form's ``avg`` differs at the last ulp
    between engines depending on accumulation order, which breaks
    raw-bit value hashing (driver CORRECTNESS gate)."""
    byte = F.conv(F.substring(F.md5(token), 2 * d + 1, 2), 16, 10).cast("double")
    return (F.round(byte * F.lit(2_000_000.0) / F.lit(255.0)) - F.lit(1_000_000)).cast("long")


def hash_embedding_dim_ppm_sql(token_expr: str, d: int) -> str:
    return (
        f"(round(CAST(concat('0x', substr(md5({token_expr}), {2 * d + 1}, 2)) AS INT)::DOUBLE"
        f" * 2000000.0 / 255.0) - 1000000)::BIGINT"
    )


def doc_mean_embedding(df: DataFrame, id_col: str, text_col: str, dim: int = 4) -> DataFrame:
    """Mean-pooled document embedding over token pseudo-vectors:
    explode → per-dimension sum of exact ppm integers (one shuffle,
    map-side partial agg) → ONE final double division + round. The
    integer sum is order-independent, so the emitted doubles are
    bit-identical across engines and partitionings."""
    toks = df.select(F.col(id_col), F.explode(T.tokenize(F.col(text_col))).alias("token"))
    aggs = []
    for d in range(dim):
        s = F.sum(hash_embedding_dim_ppm(F.col("token"), d))
        n = F.count(F.lit(1))
        aggs.append(F.round(s / (n * F.lit(1_000_000.0)), 6).alias(f"emb_{d}"))
    return toks.groupBy(id_col).agg(*aggs)


def embedding_lookup(
    tokens: DataFrame, vectors: DataFrame, token_col: str, word_col: str, vec_col: str, dim: int
) -> DataFrame:
    """Broadcast join against a real embedding dimension table; OOV →
    zero vector (reference default, pliers/extractors/text.py:252-259)."""
    out = tokens.join(
        F.broadcast(vectors.select(F.col(word_col), F.col(vec_col))),
        tokens[token_col] == vectors[word_col],
        "left",
    ).drop(word_col)
    zero = F.array(*[F.lit(0.0)] * dim)
    return out.withColumn(vec_col, F.coalesce(F.col(vec_col), zero))
