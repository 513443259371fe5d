"""Heuristic part-of-speech tagger — PartOfSpeechExtractor recast.

Parity target: ``PartOfSpeechExtractor`` (``pliers/extractors/text.py:
204-229``) batches nltk ``pos_tag`` over the word sequence (the tagger
is sequence-contextual — it must see the whole document, so in Spark it
is an ``applyInPandas`` per-document stage, not a per-token map). nltk
is absent here; this clean-room tagger uses suffix/lexicon rules plus
one contextual rule (determiner → following word is a noun), which
preserves the "needs the whole sequence" property the reference has.

Tagset: a small Penn-style subset (DT, IN, CC, PRP, VB, VBG, VBD, JJ,
RB, CD, NN).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

DETERMINERS = {"the", "a", "an", "this", "that", "these", "those"}
PREPOSITIONS = {"in", "on", "at", "by", "for", "with", "from", "to", "of", "over", "under", "near"}
CONJUNCTIONS = {"and", "or", "but", "nor", "so", "yet"}
PRONOUNS = {"i", "you", "he", "she", "it", "we", "they", "me", "him", "her", "us", "them"}
VERBS = {"is", "are", "was", "were", "be", "been", "am", "has", "have", "had", "do", "does", "did"}


def tag_word(word: str, prev_tag: str | None) -> str:
    w = word.lower()
    if w.replace(".", "").replace(",", "").isdigit():
        return "CD"
    if w in DETERMINERS:
        return "DT"
    if prev_tag == "DT":
        return "NN"  # contextual rule: determiner precedes a noun head
    if w in PREPOSITIONS:
        return "IN"
    if w in CONJUNCTIONS:
        return "CC"
    if w in PRONOUNS:
        return "PRP"
    if w in VERBS:
        return "VB"
    if w.endswith("ing"):
        return "VBG"
    if w.endswith("ed"):
        return "VBD"
    if w.endswith("ly"):
        return "RB"
    if w.endswith(("ous", "ful", "ive", "able", "al")):
        return "JJ"
    return "NN"


def tag_sequence(words: list[str]) -> list[str]:
    tags: list[str] = []
    prev: str | None = None
    for w in words:
        t = tag_word(w, prev)
        tags.append(t)
        prev = t
    return tags


def tag_expr(w, prev_w):
    """The same tagger as ``tag_word`` as a pure Column expression
    (whole-stage-codegen-friendly — no Python in the loop). Valid because
    the only contextual rule, determiner→noun, depends on the previous
    *word* being a determiner, not on recursive tag state: ``tag_word``
    assigns DT iff the word is in DETERMINERS, so
    ``prev_tag == 'DT' ⟺ lag(word) ∈ DETERMINERS``.

    ``w``/``prev_w`` must already be lower-cased; ``prev_w`` is
    ``F.lag(w)`` over (doc, pos)."""
    from pyspark.sql import functions as F

    in_set = lambda c, s: c.isin(*sorted(s))
    return (
        F.when(F.regexp_replace(w, r"[.,]", "").rlike(r"^[0-9]+$"), "CD")
        .when(in_set(w, DETERMINERS), "DT")
        .when(prev_w.isNotNull() & in_set(prev_w, DETERMINERS), "NN")
        .when(in_set(w, PREPOSITIONS), "IN")
        .when(in_set(w, CONJUNCTIONS), "CC")
        .when(in_set(w, PRONOUNS), "PRP")
        .when(in_set(w, VERBS), "VB")
        .when(w.endswith("ing"), "VBG")
        .when(w.endswith("ed"), "VBD")
        .when(w.endswith("ly"), "RB")
        .when(
            w.endswith("ous") | w.endswith("ful") | w.endswith("ive")
            | w.endswith("able") | w.endswith("al"),
            "JJ",
        )
        .otherwise("NN")
    )


POS_SCHEMA = "doc_id long, pos long, token string, tag string"


def pos_tag_docs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document contextual tagging via applyInPandas (each group is
    one document — the tagger sees the full sequence, like the
    reference's batch pos_tag)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, r in pdf.iterrows():
            words = str(r[text_col]).split()
            tags = tag_sequence(words)
            for i, (w, t) in enumerate(zip(words, tags)):
                rows.append({"doc_id": r[id_col], "pos": i, "token": w, "tag": t})
        return pd.DataFrame(rows, columns=["doc_id", "pos", "token", "tag"])

    return df.select(id_col, text_col).groupBy(id_col).applyInPandas(fn, schema=POS_SCHEMA)
