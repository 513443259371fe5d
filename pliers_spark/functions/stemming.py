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


def _sql_cvp(e: str) -> str:
    """DuckDB expression: the Porter consonant/vowel pattern of string
    ``e`` ('c'/'v' per char, y classified by the previous char — exactly
    :func:`_is_cons`). A left fold so the y rule sees its own output."""
    return (
        f"list_reduce(list_prepend('', string_split({e}, '')), (acc, c) -> acc || "
        "(CASE WHEN c IN ('a','e','i','o','u') THEN 'v' "
        "WHEN c = 'y' THEN (CASE WHEN acc = '' OR right(acc, 1) = 'v' THEN 'c' ELSE 'v' END) "
        "ELSE 'c' END))"
    )


def _sql_m(e: str) -> str:
    """measure(e): collapse the cv pattern to runs, count VC transitions."""
    p = f"regexp_replace(regexp_replace({_sql_cvp(e)}, 'v+', 'V', 'g'), 'c+', 'C', 'g')"
    return f"((length({p}) - length(replace({p}, 'VC', ''))) / 2)"


def _sql_has_vowel(e: str) -> str:
    return f"contains({_sql_cvp(e)}, 'v')"


def _sql_cvc(e: str) -> str:
    return (
        f"(length({e}) >= 3 AND right({_sql_cvp(e)}, 3) = 'cvc'"
        f" AND right({e}, 1) NOT IN ('w','x','y'))"
    )


def _sql_dbl(e: str) -> str:
    return (
        f"(length({e}) >= 2 AND right({e}, 1) = substr({e}, length({e}) - 1, 1)"
        f" AND right({_sql_cvp(e)}, 1) = 'c')"
    )


def _chop(e: str, n: int) -> str:
    return f"substr({e}, 1, length({e}) - {n})"


def porter_sql_ctes(w0: str = "w0") -> tuple[str, str]:
    """DuckDB oracle for :func:`porter_stem`, generated from the SAME
    step tables as the Python implementation (single source of truth —
    the two sides cannot drift on the rule lists; the measure/vowel/cvc
    predicates are differentially tested, tests/test_stemming.py).

    Returns ``(cte_body, final_col)``: a chain of CTE stages expecting an
    upstream CTE named ``pstem_in(token, {w0})`` holding lower-cased
    words, and the name of the output column (``stem``) on the final CTE
    ``pstem_out(token, stem)``. Words of length <= 2 pass through."""
    # step 1a — plain suffix CASE
    s1a = f"""pstem_1a AS (
      SELECT token, {w0},
        CASE WHEN ends_with({w0}, 'sses') THEN {_chop(w0, 2)}
             WHEN ends_with({w0}, 'ies')  THEN {_chop(w0, 2)}
             WHEN ends_with({w0}, 'ss')   THEN {w0}
             WHEN ends_with({w0}, 's')    THEN {_chop(w0, 1)}
             ELSE {w0} END AS w1
      FROM pstem_in)"""
    # step 1b — eed branch else (ed|ing strip + fixup)
    s1b_pre = f"""pstem_1b_pre AS (
      SELECT token, {w0}, w1,
        ends_with(w1, 'eed') AS is_eed,
        (NOT ends_with(w1, 'eed')) AND ends_with(w1, 'ed')
           AND {_sql_has_vowel(_chop('w1', 2))} AS ed_ok,
        (NOT ends_with(w1, 'eed')) AND ends_with(w1, 'ing')
           AND {_sql_has_vowel(_chop('w1', 3))} AS ing_ok
      FROM pstem_1a)"""
    s1b_strip = f"""pstem_1b_strip AS (
      SELECT token, {w0}, w1, is_eed, ed_ok, ing_ok,
        CASE WHEN ed_ok THEN {_chop('w1', 2)}
             WHEN ing_ok THEN {_chop('w1', 3)} END AS ws
      FROM pstem_1b_pre)"""
    s1b = f"""pstem_1b AS (
      SELECT token, {w0},
        CASE
          WHEN is_eed THEN
            CASE WHEN {_sql_m(_chop('w1', 3))} > 0 THEN {_chop('w1', 1)} ELSE w1 END
          WHEN ed_ok OR ing_ok THEN
            CASE
              WHEN ends_with(ws, 'at') OR ends_with(ws, 'bl') OR ends_with(ws, 'iz')
                THEN ws || 'e'
              WHEN {_sql_dbl('ws')} AND right(ws, 1) NOT IN ('l','s','z')
                THEN {_chop('ws', 1)}
              WHEN {_sql_m('ws')} = 1 AND {_sql_cvc('ws')} THEN ws || 'e'
              ELSE ws END
          ELSE w1 END AS w2
      FROM pstem_1b_strip)"""
    # step 1c
    s1c = f"""pstem_1c AS (
      SELECT token, {w0},
        CASE WHEN ends_with(w2, 'y') AND {_sql_has_vowel(_chop('w2', 1))}
             THEN {_chop('w2', 1)} || 'i' ELSE w2 END AS w3
      FROM pstem_1b)"""

    def rule_case(col: str, rules: list[tuple[str, str]], min_m: int) -> str:
        whens = []
        for suf, rep in rules:
            stem = _chop(col, len(suf))
            whens.append(
                f"WHEN ends_with({col}, '{suf}') THEN "
                f"(CASE WHEN {_sql_m(stem)} > {min_m} THEN {stem} || '{rep}' ELSE {col} END)"
            )
        return "CASE " + " ".join(whens) + f" ELSE {col} END"

    step2 = [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
        ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
        ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ]
    step3 = [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ]
    step4 = [
        ("al", ""), ("ance", ""), ("ence", ""), ("er", ""), ("ic", ""),
        ("able", ""), ("ible", ""), ("ant", ""), ("ement", ""), ("ment", ""),
        ("ent", ""), ("ou", ""), ("ism", ""), ("ate", ""), ("iti", ""),
        ("ous", ""), ("ive", ""), ("ize", ""),
    ]
    s2 = f"""pstem_2 AS (
      SELECT token, {w0}, {rule_case('w3', step2, 0)} AS w4 FROM pstem_1c)"""
    s3 = f"""pstem_3 AS (
      SELECT token, {w0}, {rule_case('w4', step3, 0)} AS w5 FROM pstem_2)"""
    # step 4: for-else — the s/t+ion rule only fires when NO listed suffix
    # matched (Python's for..else). The listed suffixes all strip to ''.
    any4 = " OR ".join(f"ends_with(w5, '{s}')" for s, _ in step4)
    ion = (
        f"CASE WHEN ends_with(w5, 'ion') AND length(w5) > 3"
        f" AND substr(w5, length(w5) - 3, 1) IN ('s','t')"
        f" AND {_sql_m(_chop('w5', 3))} > 1 THEN {_chop('w5', 3)} ELSE w5 END"
    )
    s4 = f"""pstem_4 AS (
      SELECT token, {w0},
        CASE WHEN {any4} THEN {rule_case('w5', step4, 1)} ELSE {ion} END AS w6
      FROM pstem_3)"""
    # step 5a + 5b
    s5a = f"""pstem_5a AS (
      SELECT token, {w0},
        CASE WHEN ends_with(w6, 'e')
                  AND ({_sql_m(_chop('w6', 1))} > 1
                       OR ({_sql_m(_chop('w6', 1))} = 1 AND NOT {_sql_cvc(_chop('w6', 1))}))
             THEN {_chop('w6', 1)} ELSE w6 END AS w7
      FROM pstem_4)"""
    s5b = f"""pstem_out AS (
      SELECT token,
        CASE WHEN length({w0}) <= 2 THEN {w0}
             WHEN {_sql_m('w7')} > 1 AND {_sql_dbl('w7')} AND ends_with(w7, 'l')
             THEN {_chop('w7', 1)} ELSE w7 END AS stem
      FROM pstem_5a)"""
    body = ",\n".join([s1a, s1b_pre, s1b_strip, s1b, s1c, s2, s3, s4, s5a, s5b])
    return body, "stem"


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
