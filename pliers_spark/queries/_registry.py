"""Driver-facing query registry: every implemented operator from
SURVEY.md §2 as a (Spark callable, DuckDB oracle SQL) pair.

Each Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame;
the oracle is ANSI SQL DuckDB runs on the same parquet (views
pre-registered by the driver). Column names/aliases match exactly on
both sides; float outputs are rounded to 6 decimals on both sides so
the order-insensitive value-hash is stable across engines.
"""


from __future__ import annotations


import string

from collections.abc import Callable


from pyspark.sql import DataFrame, SparkSession, Window

from pyspark.sql import functions as F


from ..functions import text as T

from ..functions.text import _isin_lambda

from ..functions.hashing import md5_int, md5_int_sql

from ..operators import asof as A

from ..operators import dedup as D

from ..operators import dictionary as DI

from ..operators import results as R

from ..operators import similarity as S

from ..operators import temporal as TP

from ..operators import vectorizer as V

from ..session import load_table


# --------------------------------------------------------------------------
# registry plumbing

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

ORACLES: dict[str, str] = {}



def query(name: str, sql: str | None = None):
    def deco(fn):
        if name in QUERIES:
            # a later registration would silently shadow the earlier query
            # (dict assignment) — fail at import time instead
            raise ValueError(f"duplicate query registration: {name!r}")
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco



def _docs(spark, sf_dir):
    # spread: every downstream documents query is a CPU-heavy per-row map
    # (tokenize/hash/UDF); a sub-MB local scan is 1 split otherwise.
    return load_table(spark, sf_dir, "documents", spread=True)



def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")



# --------------------------------------------------------------------------
# §2.2/§2.4 text extractors & filters (pliers parity surface)

_PUNCT_SQL_CLASS = "[" + "".join("\\" + (c if c != "'" else "''") for c in string.punctuation) + "]"
