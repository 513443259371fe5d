"""Sequence-encoder stage — the ``BertExtractor`` execution pattern
(pliers/extractors/text.py:412-560) with a deterministic stand-in model.

What is REAL here (and tested): the Spark execution shape a transformer
encoder needs at 100 TB —

- an **Iterator-of-batches pandas UDF** (``Iterator[pd.Series] →
  Iterator[pd.Series]``): the model is constructed ONCE per Python
  worker when the batch stream opens, then reused for every Arrow batch
  of the task — the Spark analog of pliers loading the HF model once
  per Extractor instance instead of per stimulus;
- fixed declared output schema (``array<double>`` of ``dim``), Arrow
  batch transfer, numpy-vectorized math inside;
- mean pooling over token vectors (the reference pools token encodings
  with ``np.<fn>``).

What is FAKE (this container has no torch/transformers): the weights.
``load_model`` builds a deterministic embedding matrix whose rows are
md5-derived integer-ppm vectors and token indices come from md5-bucket
hashing — swapping in a real model changes only that function's body,
not the Spark plumbing.

Float-determinism contract (driver hashes raw bits): token pooling is
an exact int64 ppm sum with ONE final division; the tanh nonlinearity
is evaluated as ``(exp(2x)-1)/(exp(2x)+1)`` with ``math.exp`` per
element (libm — bit-identical to DuckDB's ``exp``; numpy's SIMD exp is
NOT), and outputs land on the 1e-6 grid via ``floor`` (round() itself
diverges between engines in the last ulp). This makes an EXACT DuckDB
oracle possible: :func:`seq_encode_sql`.
"""

from __future__ import annotations

import hashlib as _hl
import math as _math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

_VOCAB_BUCKETS = 1024


def _bucket(word: str) -> int:
    """Token → embedding-matrix row: first 8 md5 hex chars mod buckets.
    SQL twin inside :func:`seq_encode_sql` (same hex-prefix arithmetic)."""
    return int(_hl.md5(word.encode()).hexdigest()[:8], 16) % _VOCAB_BUCKETS


class _FakeEncoder:
    """Deterministic 'model': md5-bucket embedding matrix (exact ppm
    integers) + mean pooling + tanh. Matrix rows are the ppm vectors of
    the bucket id's decimal string — pure functions of (bucket, dim), so
    the DuckDB oracle recomputes them from md5() with no weight table."""

    def __init__(self, dim: int):
        self.dim = dim
        self.W = np.array(
            [[_ppm(str(b), d) for d in range(dim)] for b in range(_VOCAB_BUCKETS)],
            dtype=np.int64,
        )

    def encode_batch(self, texts: pd.Series) -> pd.Series:
        out = []
        W, dim = self.W, self.dim
        for t in texts:
            toks = t.split() if t else []
            if not toks:
                out.append([0.0] * dim)
                continue
            idx = np.fromiter(
                (_bucket(w) for w in toks), dtype=np.int64, count=len(toks)
            )
            s = W[idx].sum(axis=0)  # exact int64 — order-independent
            denom = len(toks) * 1_000_000.0
            vec = []
            for d in range(dim):
                m = s[d] / denom  # ONE division, both engines identical
                e = _math.exp(2.0 * m)  # libm exp == DuckDB exp
                vec.append(_math.floor((e - 1.0) / (e + 1.0) * 1_000_000.0) / 1_000_000.0)
            out.append(vec)
        return pd.Series(out)


def load_model(dim: int = 8) -> _FakeEncoder:
    """Split out so a real model (torch/transformers) slots in here;
    called once per worker per task stream, never per row/batch."""
    return _FakeEncoder(dim)


def sequence_encode_col(col: Column, dim: int = 8) -> Column:
    @pandas_udf("array<double>")
    def _encode(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = load_model(dim)  # once per worker, outside the loop
        for texts in batches:
            yield model.encode_batch(texts)

    return _encode(col)


def seq_encode_sql(table: str = "documents", id_col: str = "doc_id",
                   text_col: str = "text", dim: int = 8) -> str:
    """DuckDB oracle for :func:`sequence_encode_col` — the same model
    recomputed in SQL: md5-bucket row index, ppm matrix entries from
    md5(bucket-string) bytes (``hash_embedding_dim_ppm_sql``), exact
    BIGINT pooling sum, one division, tanh via exp, floor to the 1e-6
    grid. Bit-identical to the Spark pandas UDF (tests/test_encoder.py)."""
    from .embeddings import hash_embedding_dim_ppm_sql

    bk = (
        f"CAST(CAST(concat('0x', substr(md5(token), 1, 8)) AS BIGINT)"
        f" % {_VOCAB_BUCKETS} AS VARCHAR)"
    )
    sums = ", ".join(
        f"sum({hash_embedding_dim_ppm_sql('bk', d)}) AS s{d}" for d in range(dim)
    )
    embs = ", ".join(
        f"floor((exp(2.0 * (s{d} / (n * 1000000.0))) - 1.0)"
        f" / (exp(2.0 * (s{d} / (n * 1000000.0))) + 1.0) * 1000000.0)"
        f" / 1000000.0 AS emb_{d}"
        for d in range(dim)
    )
    return f"""WITH toks AS (
         SELECT {id_col}, unnest(string_split(trim({text_col}), ' ')) AS token
         FROM {table}),
       b AS (SELECT {id_col}, {bk} AS bk FROM toks),
       s AS (SELECT {id_col}, count(*)::BIGINT AS n, {sums}
             FROM b GROUP BY {id_col})
       SELECT {id_col}, {embs} FROM s"""


def reference_encode(text: str, dim: int = 8) -> list[float]:
    """Driver-side single-row reference for tests."""
    return load_model(dim).encode_batch(pd.Series([text])).iloc[0]


# ---------------------------------------------------------------------------
# BertLMExtractor / BertSentimentExtractor surface (reference
# pliers/extractors/text.py:412-831): masked-LM candidate scoring with
# top_k / threshold / target selection, and softmax sentiment. The
# "weights" are the deterministic md5-derived pseudo-embeddings of
# functions/embeddings.py (hash_embedding_dim_ppm), which makes an EXACT
# DuckDB oracle possible; a real HF model slots into _context_vector /
# the logit product without changing the Spark plumbing.
#
# Float-determinism contract (driver hashes raw bits): context vectors
# are exact integer-ppm sums with ONE final division; logits are
# fixed-order products; softmax uses math.exp (bit-identical to DuckDB's
# libm exp — numpy's SIMD exp is NOT) and sequential sums in sorted-word
# order. tests/test_encoder.py pins the oracle bitwise.

import hashlib
import math

# small fixed candidate vocabulary for the masked-LM head (stand-in for
# the model's vocab; sorted so both engines fold in the same order)
LM_VOCAB = sorted([
    "table", "query", "row", "data", "scan", "join", "filter", "sort",
    "merge", "batch", "stream", "window", "group", "order", "hash",
    "key", "value", "column", "line", "part", "small", "big", "fast",
    "slow", "the", "a", "spark", "agg", "vector", "customer", "supplier",
    "nation",
])
LM_DIM = 4
SENT_CLASSES = ["neg", "neu", "pos"]


def _ppm(word: str, d: int) -> int:
    """Python twin of embeddings.hash_embedding_dim_ppm (md5 → byte →
    exact ppm integer). Never lands on a .5 rounding tie (255 is odd),
    so round() mode is irrelevant."""
    byte = int(hashlib.md5(word.encode()).hexdigest()[2 * d : 2 * d + 2], 16)
    return int(round(byte * 2_000_000.0 / 255.0)) - 1_000_000


def _embed(word: str, dim: int = LM_DIM) -> list[float]:
    return [_ppm(word, d) / 1_000_000.0 for d in range(dim)]


def _context_vector(tokens: list[str], dim: int = LM_DIM) -> list[float]:
    """Mean token embedding via exact integer-ppm sums (order-independent)."""
    if not tokens:
        return [0.0] * dim
    n = len(tokens)
    return [
        sum(_ppm(t, d) for t in tokens) / (n * 1_000_000.0) for d in range(dim)
    ]


def _logit(ctx: list[float], emb: list[float]) -> float:
    acc = 0.0
    for c, e in zip(ctx, emb):  # fixed d order == SQL left-assoc sum
        acc += c * e
    return acc


def _softmax_over(logits: dict[str, float]) -> dict[str, float]:
    """Softmax in sorted-key order with math.exp (libm — matches DuckDB)."""
    keys = sorted(logits)
    mx = max(logits.values())
    exps = {k: math.exp(logits[k] - mx) for k in keys}
    denom = 0.0
    for k in keys:
        denom += exps[k]
    return {k: exps[k] / denom for k in keys}


def masked_lm_scores(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int | None = 5,
    threshold: float | None = None,
    targets: list[str] | None = None,
    vocab: list[str] | None = None,
):
    """Masked-LM candidate scoring over the document context — the
    reference's top_k / threshold / target selection semantics
    (pliers/extractors/text.py:740-749: exactly one of top_k, threshold,
    targets). Returns (id, rank, token, prob) rows, rank 1-based by
    descending probability with word-ascending tie-break.

    Spark shape: iterator pandas UDF (vocab embedding table built once
    per worker) emitting an array<struct> already selected inside the
    UDF, then one posexplode — no shuffle, scales as a narrow map."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    if sum(x is not None for x in (top_k, threshold, targets)) != 1:
        raise ValueError("specify exactly one of top_k / threshold / targets")
    vocab = sorted(vocab or LM_VOCAB)

    @pandas_udf("array<struct<token:string, prob:double>>")
    def _lm(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        embs = {w: _embed(w) for w in vocab}  # once per worker
        def score(text):
            toks = text.split() if text else []
            ctx = _context_vector(toks)
            probs = _softmax_over({w: _logit(ctx, e) for w, e in embs.items()})
            ranked = sorted(probs.items(), key=lambda kv: (-kv[1], kv[0]))
            if top_k is not None:
                sel = ranked[:top_k]
            elif threshold is not None:
                sel = [(w, p) for w, p in ranked if p >= threshold]
            else:
                sel = [(w, p) for w, p in ranked if w in set(targets)]
            return [(w, round(p, 6)) for w, p in sel]

        for texts in batches:
            yield texts.map(score)

    out = df.select(F.col(id_col), _lm(F.col(text_col)).alias("_cand"))
    return out.select(
        id_col, F.posexplode("_cand").alias("_r", "_c")
    ).select(
        id_col,
        (F.col("_r") + 1).cast("long").alias("rank"),
        F.col("_c.token").alias("token"),
        F.col("_c.prob").alias("prob"),
    )


def sentiment_softmax(df, text_col: str = "text", id_col: str = "doc_id"):
    """BertSentimentExtractor surface: softmax over class logits
    (reference emits sentiment class probabilities). Classes scored
    against the document context with md5-derived class embeddings
    ('class:<name>' seeds). One narrow map, no shuffle."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("neg double, neu double, pos double")
    def _sent(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        class_embs = {c: _embed("class:" + c) for c in SENT_CLASSES}
        def score(text):
            toks = text.split() if text else []
            ctx = _context_vector(toks)
            p = _softmax_over({c: _logit(ctx, e) for c, e in class_embs.items()})
            return {c: round(p[c], 6) for c in SENT_CLASSES}

        for texts in batches:
            yield pd.DataFrame([score(t) for t in texts], columns=SENT_CLASSES)

    out = df.select(F.col(id_col), _sent(F.col(text_col)).alias("_s"))
    return out.select(
        id_col,
        F.col("_s.neg").alias("sent_neg"),
        F.col("_s.neu").alias("sent_neu"),
        F.col("_s.pos").alias("sent_pos"),
    )
