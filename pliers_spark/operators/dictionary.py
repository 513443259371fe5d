"""Dictionary / lexical-norm lookup — pliers' DictionaryExtractor family
as broadcast joins.

Parity anchors: word → row lookup with NaN on miss (left-outer
semantics + ``missing`` default, ``pliers/extractors/text.py:88-95``);
variable subset projection (:79-83); case-folding unless
``case_sensitive`` (:145-146); duplicate keys dedup keep-first
(:142-156, ``keep='first'``). ``PredefinedDictionaryExtractor``'s
outer-concat of several dictionaries (:142-156) is :func:`combine_dictionaries`.

The dictionary is a small dimension table (``pliers/datasets/text.py:57-111``
downloads them as CSVs) — at any scale the right move is an explicit
``F.broadcast`` left join: zero shuffle of the token fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dictionary_lookup(
    tokens: DataFrame,
    dictionary: DataFrame,
    token_col: str,
    dict_key: str,
    variables: list[str] | None = None,
    case_sensitive: bool = False,
    missing: float | None = None,
) -> DataFrame:
    """Broadcast left-outer lookup of per-token variables.

    Misses yield NULL (pandas NaN ≡ Spark NULL), or ``missing`` when
    given — matching the reference's fillna(missing).
    """
    variables = variables or [c for c in dictionary.columns if c != dict_key]
    dim = dictionary.select(dict_key, *variables)
    if not case_sensitive:
        dim = dim.withColumn(dict_key, F.lower(F.col(dict_key)))
    # keep='first' dedup: deterministic first row per key
    dim = dim.dropDuplicates([dict_key])

    join_key = F.col(token_col) if case_sensitive else F.lower(F.col(token_col))
    out = tokens.join(
        F.broadcast(dim), on=join_key == dim[dict_key], how="left"
    ).drop(dim[dict_key])
    if missing is not None:
        out = out.fillna(missing, subset=variables)
    return out


def combine_dictionaries(dicts: list[DataFrame], key: str) -> DataFrame:
    """Full-outer concat of several dictionaries on the word key with
    keep-first dedup — PredefinedDictionaryExtractor build step."""
    out = dicts[0]
    for d in dicts[1:]:
        out = out.join(d, on=key, how="full")
    return out.dropDuplicates([key])
