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

The embedded lexicon is a ~30-word SUBSET of the public ~7,500-entry
``vader_lexicon.txt`` (the full file is not present in this offline
container and its empirical valence means cannot be reproduced from
first principles, so shipping it verbatim is environment-blocked).
What IS shipped is the full loading mechanism: :func:`load_lexicon_file`
parses the published nltk/vaderSentiment TSV format
(``word<TAB>mean<TAB>stddev<TAB>[ratings]``), and setting
``PLIERS_SPARK_VADER_LEXICON=/path/to/vader_lexicon.txt`` (or calling
:func:`set_lexicon`) swaps the full lexicon in for BOTH the engine and
the generated DuckDB oracle (``vader_sql`` renders from the active
lexicon), so deployment with the real file needs zero code change —
ship it with ``spark-submit --py-files``/``--files``.

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

# full published booster inventory (Hutto & Gilbert 2014, Table 2 /
# the public vaderSentiment constants): intensity ±0.293 (B_INCR /
# B_DECR). Single-word entries only here — the published multiword
# boosters ("kind of", "sort of", "just enough") live in MW_BOOSTERS
# and match as the bigram immediately preceding a sentiment word.
_B = 0.293
BOOSTERS: dict[str, float] = dict(
    [(w, _B) for w in (
        "absolutely amazingly awfully completely considerably decidedly "
        "deeply effing enormously entirely especially exceptionally "
        "extremely fabulously flipping flippin fricking frickin frigging "
        "friggin fully fucking greatly hella highly hugely incredibly "
        "intensely majorly more most particularly purely quite really "
        "remarkably so substantially thoroughly totally tremendously "
        "uber unbelievably unusually utterly very"
    ).split()]
    + [(w, -_B) for w in (
        "almost barely hardly kinda kindof less little marginally "
        "occasionally partly scarce scarcely slight slightly somewhat "
        "sorta sortof"
    ).split()]
)

MW_BOOSTERS: dict[str, float] = {
    "kind of": -_B, "sort of": -_B, "just enough": -_B, "kind-of": -_B,
    "sort-of": -_B,
}

# full published negation inventory (vaderSentiment NEGATE)
NEGATIONS = {
    "aint", "ain't", "arent", "aren't", "cannot", "cant", "can't",
    "couldnt", "couldn't", "darent", "daren't", "didnt", "didn't",
    "doesnt", "doesn't", "dont", "don't", "hadnt", "hadn't", "hasnt",
    "hasn't", "havent", "haven't", "isnt", "isn't", "mightnt",
    "mightn't", "mustnt", "mustn't", "neednt", "needn't", "neither",
    "never", "no", "none", "nope", "nor", "not", "nothing", "nowhere",
    "oughtnt", "oughtn't", "rarely", "seldom", "shant", "shan't",
    "shouldnt", "shouldn't", "uhuh", "uh-uh", "wasnt", "wasn't",
    "werent", "weren't", "without", "wont", "won't", "wouldnt",
    "wouldn't", "despite",
}

# published special-case idioms (fixed valence overrides)
IDIOMS: dict[str, float] = {
    "the shit": 3.0, "the bomb": 3.0, "bad ass": 1.5, "yeah right": -2.0,
    "kiss of death": -1.5, "hand to mouth": -2.0, "cut the mustard": 2.0,
}

N_SCALAR = -0.74
C_INCR = 0.733
ALPHA = 15.0

_WORD_RE = re.compile(r"[\w']+")

# ------------------------------------------------------------------
# full-lexicon loading (nltk/vaderSentiment vader_lexicon.txt format)

_ACTIVE_LEXICON: dict[str, float] | None = None


def load_lexicon_file(path: str) -> dict[str, float]:
    """Parse the published ``vader_lexicon.txt`` TSV format: one entry per
    line, ``token<TAB>mean_valence<TAB>stddev<TAB>[raw ratings...]``
    (nltk ``sentiment/vader_lexicon.zip`` and cjhutto/vaderSentiment ship
    the identical file). Later duplicate tokens win, matching nltk's
    ``make_lex_dict`` dict-comprehension semantics."""
    lex: dict[str, float] = {}
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line.strip():
                continue
            parts = line.split("\t")
            if len(parts) < 2:
                continue
            try:
                lex[parts[0]] = float(parts[1])
            except ValueError:
                continue
    return lex


def set_lexicon(lex: dict[str, float] | None) -> None:
    """Override the embedded subset for this process (None resets).
    Affects :func:`polarity_scores`, :func:`vader_scores` AND the SQL
    rendered by :func:`vader_sql`, keeping engine and oracle in sync."""
    global _ACTIVE_LEXICON
    _ACTIVE_LEXICON = dict(lex) if lex is not None else None


def active_lexicon() -> dict[str, float]:
    """The lexicon in effect: explicit :func:`set_lexicon` override, else
    the file named by ``PLIERS_SPARK_VADER_LEXICON``, else the embedded
    subset. The env path is read once per process (executors inherit the
    env through spark-submit ``--conf spark.executorEnv...``)."""
    global _ACTIVE_LEXICON
    if _ACTIVE_LEXICON is None:
        import os

        p = os.environ.get("PLIERS_SPARK_VADER_LEXICON")
        if p and os.path.exists(p):
            _ACTIVE_LEXICON = load_lexicon_file(p)
    return _ACTIVE_LEXICON if _ACTIVE_LEXICON is not None else LEXICON


def _normalize(score: float) -> float:
    n = score / math.sqrt(score * score + ALPHA)
    return max(-1.0, min(1.0, n))


def _allcap_differential(words: list[str]) -> bool:
    caps = sum(1 for w in words if w.isupper() and len(w) > 1)
    return 0 < caps < len(words)


def polarity_scores(text: str, lexicon: dict[str, float] | None = None) -> dict[str, float]:
    """VADER-style polarity scores for one text."""
    lex = lexicon or active_lexicon()
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
        # multiword booster: the published bigram damping ("kind of",
        # "sort of", "just enough") when it immediately precedes the
        # sentiment word — undamped, sign-following like single words
        if i >= 2:
            bigram = f"{words[i - 2].lower()} {words[i - 1].lower()}"
            mb = MW_BOOSTERS.get(bigram)
            if mb is not None:
                valence += mb if valence > 0 else -mb
        # idiom override: published special cases replace the computed
        # valence; sequences checked in a fixed order — (prev, w),
        # (prev2, prev, w), (w, next)
        seqs = []
        if i >= 1:
            seqs.append(f"{words[i - 1].lower()} {lw}")
        if i >= 2:
            seqs.append(f"{words[i - 2].lower()} {words[i - 1].lower()} {lw}")
        if i + 1 < len(words):
            seqs.append(f"{lw} {words[i + 1].lower()}")
        for seq in seqs:
            iv = IDIOMS.get(seq)
            if iv is not None:
                valence = iv
                break
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


def vader_sql(
    docs_table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix: str = "sentiment_",
) -> str:
    """:func:`polarity_scores` rendered as one DuckDB statement — the
    oracle for the ``vader_sentiment`` query. Generated from the SAME
    lexicon/booster/negation tables and constants as the Python engine
    (single source of truth); every constant is emitted with ``repr``
    so both engines parse bit-identical doubles, and per-document sums
    are sequential left folds in word order (list_reduce) matching
    Python's summation order, keeping raw float bits deterministic.
    Differentially tested on randomized rich texts (tests/test_vader.py).
    """
    punct = string.punctuation.replace("'", "''")
    lex = active_lexicon()
    lex_case = "CASE " + " ".join(
        "WHEN lw = '{}' THEN {!r}".format(w.replace("'", "''"), v)
        for w, v in lex.items()
    ) + " END"
    neg_list = ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(NEGATIONS))
    boosters = sorted(BOOSTERS)
    b_words = ", ".join(f"'{w}'" for w in boosters)

    def b_case(col: str, dist: int) -> str:
        # distance damping exactly as Python: b * (1.0 - 0.05*(dist-1)*2)
        whens = []
        for w in boosters:
            b = BOOSTERS[w] if dist == 1 else BOOSTERS[w] * (1.0 - 0.05 * (dist - 1) * 2)
            whens.append(f"WHEN {col} = '{w}' THEN {b!r}")
        return "CASE " + " ".join(whens) + " END"

    # one fold step: booster add (sign follows current valence), then negation
    def dist_step(prev_col: str, v_in: str, dist: int) -> str:
        boosted = (
            f"CASE WHEN {prev_col} IN ({b_words}) THEN {v_in} + "
            f"(CASE WHEN {v_in} > 0 THEN {b_case(prev_col, dist)}"
            f" ELSE -{b_case(prev_col, dist)} END) ELSE {v_in} END"
        )
        return (
            f"CASE WHEN {prev_col} IN ({neg_list}) THEN ({boosted}) * {N_SCALAR!r}"
            f" ELSE ({boosted}) END"
        )

    v1 = dist_step("p1", "v0", 1)
    v2 = dist_step("p2", "v1", 2)
    v3 = dist_step("p3", "v2", 3)

    # multiword booster (bigram immediately preceding, undamped,
    # sign-following) and idiom override — same tables as Python
    mw_words = ", ".join(
        "'" + w.replace("'", "''") + "'" for w in sorted(MW_BOOSTERS)
    )
    mw_case = "CASE " + " ".join(
        f"WHEN concat(p2, ' ', p1) = '{w}' THEN {v!r}"
        for w, v in sorted(MW_BOOSTERS.items())
    ) + " END"
    v4 = (
        f"CASE WHEN concat(p2, ' ', p1) IN ({mw_words}) THEN ({v3}) + "
        f"(CASE WHEN ({v3}) > 0 THEN {mw_case} ELSE -({mw_case}) END) "
        f"ELSE ({v3}) END"
    )

    def idiom_case(expr: str) -> str:
        whens = []
        for seq_expr in (
            "concat(p1, ' ', lw)",
            "concat(p2, ' ', p1, ' ', lw)",
            "concat(lw, ' ', n1)",
        ):
            for w, v in sorted(IDIOMS.items()):
                whens.append(
                    f"WHEN {seq_expr} = '{w.replace(chr(39), chr(39) * 2)}' THEN {v!r}"
                )
        return "CASE " + " ".join(whens) + f" ELSE ({expr}) END"

    v5 = idiom_case(v4)

    fold = lambda elems: f"list_reduce(list_prepend(0.0, {elems}), (a, b) -> a + b)"
    c = C_INCR

    return f"""WITH raw AS (SELECT {id_col}, {text_col} AS text FROM {docs_table}),
docpunct AS (
  SELECT {id_col},
    least(length(text) - length(replace(text, '!', '')), 4) * {0.292!r} AS ep_amp,
    CASE WHEN (length(text) - length(replace(text, '?', ''))) > 1
         THEN least((length(text) - length(replace(text, '?', ''))) * {0.18!r}, {0.96!r})
         ELSE 0.0 END AS qm_amp
  FROM raw),
toks0 AS (
  SELECT {id_col}, unnest(range(len(string_split(text, ' '))))::BIGINT AS rpos,
         unnest(string_split(text, ' ')) AS rw
  FROM raw),
stripped AS (
  SELECT {id_col}, rpos, trim(rw, '{punct}') AS w FROM toks0 WHERE rw <> ''),
words AS (
  SELECT {id_col}, w, lower(w) AS lw,
         row_number() OVER (PARTITION BY {id_col} ORDER BY rpos) - 1 AS i
  FROM stripped WHERE w <> ''),
caps AS (
  SELECT {id_col},
    sum(CASE WHEN w = upper(w) AND w <> lower(w) AND length(w) > 1 THEN 1 ELSE 0 END) AS n_caps,
    count(*) AS n_words
  FROM words GROUP BY {id_col}),
ctx AS (
  SELECT w.{id_col}, w.i, w.w, w.lw,
         lag(w.lw, 1) OVER win AS p1,
         lag(w.lw, 2) OVER win AS p2,
         lag(w.lw, 3) OVER win AS p3,
         lead(w.lw, 1) OVER win AS n1,
         (c.n_caps > 0 AND c.n_caps < c.n_words) AS cap_diff
  FROM words w JOIN caps c USING ({id_col})
  WINDOW win AS (PARTITION BY w.{id_col} ORDER BY w.i)),
val0 AS (
  SELECT {id_col}, i, lw, n1, p1, p2, p3,
    CASE WHEN lw IN ({b_words}) THEN NULL ELSE {lex_case} END AS lex_v,
    (cap_diff AND w = upper(w) AND w <> lower(w)) AS is_cap
  FROM ctx),
val1 AS (
  SELECT {id_col}, i, lw, n1, p1, p2, p3,
    CASE WHEN lex_v IS NULL THEN NULL
         WHEN is_cap THEN lex_v + (CASE WHEN lex_v > 0 THEN {c!r} ELSE {-c!r} END)
         ELSE lex_v END AS v0
  FROM val0),
val2 AS (SELECT {id_col}, i, lw, n1, p1, p2, p3, CASE WHEN v0 IS NULL THEN NULL ELSE {v1} END AS v1 FROM val1),
val3 AS (SELECT {id_col}, i, lw, n1, p1, p2, p3, CASE WHEN v1 IS NULL THEN NULL ELSE {v2} END AS v2 FROM val2),
val AS (SELECT {id_col}, i,
          coalesce(CASE WHEN v2 IS NULL THEN NULL ELSE {v5} END, 0.0) AS s0
        FROM val3),
butpos AS (SELECT {id_col}, min(i) AS bi FROM words WHERE lw = 'but' GROUP BY {id_col}),
sents AS (
  SELECT v.{id_col}, v.i,
    CASE WHEN b.bi IS NOT NULL AND v.i < b.bi THEN v.s0 * 0.5
         WHEN b.bi IS NOT NULL AND v.i > b.bi THEN v.s0 * 1.5
         ELSE v.s0 END AS s
  FROM val v LEFT JOIN butpos b USING ({id_col})),
agg AS (SELECT {id_col}, list(s ORDER BY i) AS ss FROM sents GROUP BY {id_col}),
sums AS (
  SELECT {id_col},
    {fold('ss')} AS total,
    {fold("list_transform(ss, x -> CASE WHEN x > 0 THEN x + 1 ELSE 0.0 END)")} AS pos_sum0,
    {fold("list_transform(ss, x -> CASE WHEN x < 0 THEN x - 1 ELSE 0.0 END)")} AS neg_sum0,
    len(list_filter(ss, x -> x = 0))::DOUBLE AS neu_count,
    len(ss) AS n_sent
  FROM agg),
scored AS (
  SELECT r.{id_col},
    coalesce(s.n_sent, 0) AS n_sent,
    coalesce(s.neu_count, 0.0) AS neu_count,
    CASE WHEN coalesce(s.total, 0.0) > 0 THEN s.total + d.ep_amp + d.qm_amp
         WHEN coalesce(s.total, 0.0) < 0 THEN s.total - (d.ep_amp + d.qm_amp)
         ELSE coalesce(s.total, 0.0) END AS total_p,
    CASE WHEN coalesce(s.pos_sum0, 0.0) > abs(coalesce(s.neg_sum0, 0.0))
         THEN s.pos_sum0 + d.ep_amp + d.qm_amp ELSE coalesce(s.pos_sum0, 0.0) END AS pos_sum,
    CASE WHEN coalesce(s.pos_sum0, 0.0) < abs(coalesce(s.neg_sum0, 0.0))
         THEN s.neg_sum0 - (d.ep_amp + d.qm_amp) ELSE coalesce(s.neg_sum0, 0.0) END AS neg_sum
  FROM raw r LEFT JOIN sums s USING ({id_col}) JOIN docpunct d USING ({id_col})),
final AS (
  SELECT {id_col}, n_sent, neu_count, pos_sum, neg_sum,
    pos_sum + abs(neg_sum) + neu_count AS denom,
    greatest(-1.0, least(1.0, total_p / sqrt(total_p * total_p + {ALPHA!r}))) AS norm
  FROM scored)
SELECT {id_col},
  CASE WHEN denom = 0 THEN 0.0 ELSE round_even(abs(pos_sum / denom), 3) END AS {prefix}pos,
  CASE WHEN denom = 0 THEN 0.0 ELSE round_even(abs(neg_sum / denom), 3) END AS {prefix}neg,
  CASE WHEN denom = 0 THEN 0.0 ELSE round_even(abs(neu_count / denom), 3) END AS {prefix}neu,
  CASE WHEN n_sent = 0 THEN 0.0 ELSE round_even(norm, 4) END AS {prefix}compound
FROM final"""


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

    # capture the active lexicon at plan-build time on the driver so a
    # set_lexicon()/env override ships to python workers inside the
    # serialized closure (workers are separate processes; a driver-side
    # module global would not reach them otherwise)
    lex = active_lexicon()

    @pandas_udf("pos double, neg double, neu double, compound double")
    def _udf(texts: pd.Series) -> pd.DataFrame:
        analyzer = _nltk_analyzer()
        if analyzer is not None:
            rows = [analyzer.polarity_scores(t or "") for t in texts]
        else:
            rows = [polarity_scores(t or "", lex) for t in texts]
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
