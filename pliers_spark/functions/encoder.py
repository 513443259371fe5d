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
``_load_model`` builds a deterministic embedding matrix from a seeded
RandomState and token indices come from crc32 hashing — swapping in a
real model changes only that function's body, not the Spark plumbing.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

_VOCAB_BUCKETS = 1024


class _FakeEncoder:
    """Deterministic 'model': hashed-bucket embedding matrix + tanh."""

    def __init__(self, dim: int, seed: int):
        rs = np.random.RandomState(seed)
        self.W = rs.standard_normal((_VOCAB_BUCKETS, dim))
        self.dim = dim

    def encode_batch(self, texts: pd.Series) -> pd.Series:
        out = []
        W, dim = self.W, self.dim
        for t in texts:
            toks = t.split() if t else []
            if not toks:
                out.append(np.zeros(dim))
                continue
            idx = np.fromiter(
                (zlib.crc32(w.encode()) % _VOCAB_BUCKETS for w in toks),
                dtype=np.int64,
                count=len(toks),
            )
            out.append(np.tanh(W[idx].mean(axis=0)))
        return pd.Series([np.round(v, 6).tolist() for v in out])


def load_model(dim: int = 8, seed: int = 7) -> _FakeEncoder:
    """Split out so a real model (torch/transformers) slots in here;
    called once per worker per task stream, never per row/batch."""
    return _FakeEncoder(dim, seed)


def sequence_encode_col(col: Column, dim: int = 8, seed: int = 7) -> Column:
    @pandas_udf(f"array<double>")
    def _encode(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = load_model(dim, seed)  # once per worker, outside the loop
        for texts in batches:
            yield model.encode_batch(texts)

    return _encode(col)


def reference_encode(text: str, dim: int = 8, seed: int = 7) -> list[float]:
    """Driver-side single-row reference for tests."""
    return load_model(dim, seed).encode_batch(pd.Series([text])).iloc[0]
