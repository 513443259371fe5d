"""Clean-room Porter stemmer — WordStemmingFilter parity path.

Parity target: ``WordStemmingFilter(stemmer='porter')``
(``pliers/filters/text.py:24-110``) which wraps nltk's PorterStemmer.
nltk is absent here, so this implements the original published Porter
algorithm (M.F. Porter, "An algorithm for suffix stripping", Program
1980 — public domain algorithm). nltk's implementation has a few
NLTK_EXTENSIONS deviations; this follows the original spec, which the
engine pins with its own golden tests. Exposed as a pandas UDF (string
rule engine — not expressible in Spark SQL built-ins).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_VOWELS = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences ([C](VC)^m[V])."""
    m = 0
    prev_v = False
    for i in range(len(stem)):
        v = not _is_cons(stem, i)
        if prev_v and not v:
            m += 1
        prev_v = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return len(word) >= 2 and word[-1] == word[-2] and _is_cons(word, len(word) - 1)


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    return (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


def porter_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    step2 = [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
        ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
        ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ]
    for suf, rep in step2:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 3
    step3 = [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ]
    for suf, rep in step3:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 4
    step4 = [
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ]
    for suf in step4:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 1:
                w = w[: -len(suf)]
            break
    else:
        if w.endswith("ion") and len(w) > 3 and w[-4] in "st" and _measure(w[:-3]) > 1:
            w = w[:-3]

    # step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


def porter_stem_col(col: Column) -> Column:
    """Vectorized porter stem of a token column."""

    @pandas_udf("string")
    def _udf(tokens: pd.Series) -> pd.Series:
        return tokens.map(lambda t: porter_stem(t) if t else t)

    return _udf(col)


# ---------------------------------------------------------------------------
# WordNet-lemmatizer path of WordStemmingFilter (stemmer='wordnet'):
# pliers/filters/text.py:73-108 — POS-tag the token sequence, collapse to
# wordnet pos via {ADJ: a, ADV: r, NOUN: n, VERB: v, else n}, lemmatize each
# token with its tag. Two reference quirks mirrored exactly:
#   1. the tag lookup is ``dict(pos_tag(tokens))`` — a dict keyed by token,
#      so a repeated token takes the tag of its LAST occurrence;
#   2. tokens are lower-cased before tagging (case_sensitive=False default).
# nltk/WordNet data is absent here, so lemmatization applies WordNet's
# published Morphy suffix-detachment rules WITHOUT the lexicon check
# ("morphy-lite" — deterministic, pinned by golden tests). The rule table
# below drives BOTH the Spark Column expression and the DuckDB oracle SQL,
# so the two sides cannot drift.

# Penn-subset tag (functions/pos.py tagger) → wordnet pos. The reference
# goes Penn → universal tagset → {a,s,r,n,v}; our tagger's VB/VBG/VBD map
# to universal VERB, JJ→ADJ, RB→ADV, everything else → noun.
TAG_TO_WORDNET = {"VB": "v", "VBG": "v", "VBD": "v", "JJ": "a", "RB": "r"}

# (suffix, replacement) per wordnet pos, first match wins, longest first.
# WordNet Morphy detachment rules (public: WordNet 3.0 morphy(7WN) manual);
# stem must keep >= 2 chars; bare "s" never strips from "-ss".
MORPHY_RULES: dict[str, list[tuple[str, str]]] = {
    "n": [("ches", "ch"), ("shes", "sh"), ("men", "man"), ("ies", "y"),
          ("ves", "f"), ("xes", "x"), ("zes", "z"), ("ses", "s"), ("s", "")],
    "v": [("ies", "y"), ("ing", ""), ("ed", ""), ("es", ""), ("s", "")],
    "a": [("est", ""), ("er", "")],
    "r": [],
}


def morphy_lite(word: str, wn_pos: str) -> str:
    """Pure-python reference implementation (used by tests and as the
    single source of truth for the generated expressions)."""
    for suf, rep in MORPHY_RULES.get(wn_pos, []):
        if not word.endswith(suf) or len(word) - len(suf) < 2:
            continue
        if suf == "s" and word.endswith("ss"):
            continue
        return word[: len(word) - len(suf)] + rep
    return word


def morphy_expr(tok: Column, wn_pos: Column) -> Column:
    """MORPHY_RULES as a nested CASE Column — builtins only, stays inside
    whole-stage codegen."""
    from pyspark.sql import functions as F

    out = tok
    for pos, rules in MORPHY_RULES.items():
        stemmed = tok
        for suf, rep in reversed(rules):
            n = len(suf)
            cond = tok.endswith(suf) & (F.length(tok) >= n + 2)
            if suf == "s":
                cond = cond & ~tok.endswith("ss")
            cand = F.concat(F.substring(tok, 1, F.length(tok) - n), F.lit(rep))
            stemmed = F.when(cond, cand).otherwise(stemmed)
        out = F.when(wn_pos == pos, stemmed).otherwise(out)
    return out


def morphy_sql(tok: str, wn_pos: str) -> str:
    """The same rule table rendered as DuckDB SQL (oracle side)."""
    pos_cases = []
    for pos, rules in MORPHY_RULES.items():
        if not rules:
            continue
        whens = []
        for suf, rep in rules:
            n = len(suf)
            cond = f"ends_with({tok}, '{suf}') AND length({tok}) >= {n + 2}"
            if suf == "s":
                cond += f" AND NOT ends_with({tok}, 'ss')"
            whens.append(
                f"WHEN {cond} THEN substr({tok}, 1, length({tok}) - {n}) || '{rep}'"
            )
        inner = "CASE " + " ".join(whens) + f" ELSE {tok} END"
        pos_cases.append(f"WHEN {wn_pos} = '{pos}' THEN {inner}")
    return "CASE " + " ".join(pos_cases) + f" ELSE {tok} END"


def wordnet_lemmatize_docs(df, id_col: str = "doc_id", text_col: str = "text"):
    """WordStemmingFilter(stemmer='wordnet') over a document table —
    entirely Spark built-ins, no Python in the loop.

    Plan shape: posexplode → one window pass per doc for the contextual
    tag (lag) → one window per (doc, token) for the reference's
    last-occurrence-wins tag dict (max_by over the group) → CASE-chain
    lemma → groupBy(doc) re-assembly. Two shuffles total on the doc key
    (window + final agg), both partial-agg friendly; scales as a pure
    hash-partition-by-document job."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .pos import tag_expr
    from .text import tokenize

    toks = df.select(
        F.col(id_col), F.posexplode(tokenize(F.col(text_col))).alias("pos", "token")
    ).withColumn("w", F.lower(F.col("token")))
    seq = Window.partitionBy(id_col).orderBy("pos")
    tagged = toks.withColumn("tag", tag_expr(F.col("w"), F.lag("w").over(seq)))
    wn = F.col("tag")
    wn_pos = F.lit("n")
    for tag, pos in TAG_TO_WORDNET.items():
        wn_pos = F.when(wn == tag, pos).otherwise(wn_pos)
    tagged = tagged.withColumn("wn_pos0", wn_pos)
    # dict(pos_tag(tokens)) quirk: last occurrence's tag wins for all
    # occurrences of the same (lower-cased) token in the document
    per_tok = Window.partitionBy(id_col, "w")
    tagged = tagged.withColumn("wn_pos", F.max_by("wn_pos0", "pos").over(per_tok))
    lemma = tagged.withColumn("lemma", morphy_expr(F.col("w"), F.col("wn_pos")))
    return lemma.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "lemma"))),
                lambda s: s["lemma"],
            ),
            " ",
        ).alias("lemmatized")
    )


def regexp_stem(col: Column, pattern: str, min_len: int = 0) -> Column:
    """RegexpStemmer parity (`WordStemmingFilter(stemmer='regexp')`,
    pliers/filters/text.py:48): strip every match of ``pattern`` unless
    the word is shorter than ``min_len`` — pure Column expression inside
    whole-stage codegen (nltk.RegexpStemmer.stem is `re.sub(p, '', w)`
    gated on len(w) >= min)."""
    return F.when(F.length(col) < min_len, col).otherwise(
        F.regexp_replace(col, pattern, "")
    )
