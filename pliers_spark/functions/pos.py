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


# Penn-subset tag → universal POS (spaCy's token.pos_ granularity)
TAG_TO_UNIVERSAL = {
    "VB": "VERB", "VBG": "VERB", "VBD": "VERB", "JJ": "ADJ", "RB": "ADV",
    "DT": "DET", "IN": "ADP", "CC": "CCONJ", "PRP": "PRON", "CD": "NUM",
    "NN": "NOUN",
}

_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LOWER = "abcdefghijklmnopqrstuvwxyz"
_DIGIT = "0123456789"


def token_attributes(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """SpaCyExtractor-equivalent token-attribute stage (reference surface
    pliers/extractors/text.py:339-409: per-token text/lemma_/pos_/tag_/
    dep_/shape_/is_alpha/is_stop/like_num with features='token').

    spaCy itself is not installed, so the backends are the engine's
    heuristic tagger (tag_expr), the morphy-lite lemmatizer, and a
    DOCUMENTED dep PROXY: the document's first verb-tagged token is
    'ROOT', everything else 'dep' (a real parser slots in as an
    applyInPandas stage without changing the schema). shape_ follows
    spaCy's rule: X/x/d per character class, runs longer than 4
    truncated to 4.

    Plan shape: posexplode → ONE window pass per doc (lag for the
    contextual tag + min-over-doc for the ROOT proxy share the same
    partitioning, so Catalyst reuses one Exchange) → pure Column
    expressions for lemma/upos/shape/flags. No Python in the loop."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .stemming import TAG_TO_WORDNET, morphy_expr
    from .text import ENGLISH_STOPWORDS, tokenize

    toks = (
        df.select(F.col(id_col), F.posexplode(tokenize(F.col(text_col))).alias("pos", "token"))
        .withColumn("pos", F.col("pos").cast("long"))
        .withColumn("w", F.lower(F.col("token")))
    )
    seq = Window.partitionBy(id_col).orderBy("pos")
    tagged = toks.withColumn("tag", tag_expr(F.col("w"), F.lag("w").over(seq)))

    wn_pos = F.lit("n")
    for t, p in TAG_TO_WORDNET.items():
        wn_pos = F.when(F.col("tag") == t, p).otherwise(wn_pos)

    upos = F.lit("NOUN")
    for t, p in TAG_TO_UNIVERSAL.items():
        upos = F.when(F.col("tag") == t, p).otherwise(upos)

    doc_w = Window.partitionBy(id_col)
    first_verb = F.min(
        F.when(F.col("tag").isin("VB", "VBG", "VBD"), F.col("pos"))
    ).over(doc_w)

    shape = F.translate(F.col("token"), _UPPER + _LOWER + _DIGIT,
                        "X" * 26 + "x" * 26 + "d" * 10)
    for c in "Xxd":
        shape = F.regexp_replace(shape, c + "{5,}", c * 4)

    return tagged.select(
        id_col,
        "pos",
        "token",
        morphy_expr(F.col("w"), wn_pos).alias("lemma"),
        F.col("tag"),
        upos.alias("upos"),
        F.when(F.col("pos") == first_verb, "ROOT").otherwise("dep").alias("dep"),
        F.col("w").isin(*ENGLISH_STOPWORDS).alias("is_stop"),
        F.col("token").rlike("^[A-Za-z]+$").alias("is_alpha"),
        F.regexp_replace(F.col("w"), r"[.,]", "").rlike("^[0-9]+$").alias("like_num"),
        shape.alias("shape"),
    )
