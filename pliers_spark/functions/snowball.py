"""Clean-room English Snowball ("Porter2") stemmer.

Parity target: ``WordStemmingFilter(stemmer='snowball')``
(``pliers/filters/text.py:24-110``), which wraps nltk's
``SnowballStemmer('english')``. nltk is absent in this environment, so
this implements the published algorithm (M.F. Porter, "The English
(Porter2) stemming algorithm", snowballstem.org — a public
specification) directly from its rule text. Golden tests pin the
behavior (tests/test_stemming.py).

Like the Porter-1980 module this is a string rule engine — not
expressible in Spark SQL built-ins — so the Spark surface is an
Arrow-batched pandas UDF applied after ``posexplode`` tokenization
(one Python stage over token batches; everything around it stays
JVM-side).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = set("cdeghkmnrt")

# exception list 1: invariant or special-cased full words
_EXCEPTIONS1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

# exception list 2: stop after step 1a
_EXCEPTIONS2 = {
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
}

_R1_PREFIXES = ("gener", "commun", "arsen")


def _mark_ys(word: str) -> str:
    """Upper-case y's that function as consonants (initial y, or y after
    a vowel) so the vowel tests below can treat 'y' as a vowel."""
    chars = list(word)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in "aeiouy":
            chars[i] = "Y"
    return "".join(chars)


def _r1_start(word: str) -> int:
    for p in _R1_PREFIXES:
        if word.startswith(p):
            return len(p)
    for i in range(1, len(word)):
        if word[i] not in "aeiouy" and word[i - 1] in "aeiouy":
            return i + 1
    return len(word)


def _region_start_after(word: str, begin: int) -> int:
    for i in range(begin + 1, len(word)):
        if word[i] not in "aeiouy" and word[i - 1] in "aeiouy":
            return i + 1
    return len(word)


def _ends_short_syllable(word: str) -> bool:
    """Short syllable at the END of the word: either (a) vowel followed by
    a non-vowel other than w/x/Y and preceded by a non-vowel, or (b) the
    whole word is vowel + non-vowel."""
    n = len(word)
    if n == 2:
        return word[0] in "aeiouy" and word[1] not in "aeiouy"
    if n >= 3:
        v, c = word[-2], word[-1]
        return (
            v in "aeiouy"
            and c not in "aeiouy"
            and c not in "wxY"
            and word[-3] not in "aeiouy"
        )
    return False


def _is_short(word: str, r1: int) -> bool:
    return r1 >= len(word) and _ends_short_syllable(word)


def _has_vowel(seg: str) -> bool:
    return any(ch in "aeiouy" for ch in seg)


def snowball_stem(word: str) -> str:
    """Stem one lower-case token per the Porter2 specification."""
    if len(word) <= 2:
        return word
    if word.startswith("'"):
        word = word[1:]
    if word in _EXCEPTIONS1:
        return _EXCEPTIONS1[word]
    word = _mark_ys(word)

    # step 0: 's'  's  '
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s") and _has_vowel(word[:-2]):
        word = word[:-1]

    if word.lower() in _EXCEPTIONS2:
        return word.lower()

    r1 = _r1_start(word)
    r2 = _region_start_after(word, r1)

    # step 1b
    step1b_done = None
    for suf, rep in (("eedly", "ee"), ("eed", "ee")):
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + rep
            step1b_done = "eed"
            break
    if step1b_done is None:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf) and _has_vowel(word[: -len(suf)]):
                word = word[: -len(suf)]
                if word.endswith(("at", "bl", "iz")):
                    word += "e"
                elif word.endswith(_DOUBLES):
                    word = word[:-1]
                elif _is_short(word, _r1_start(word)):
                    word += "e"
                break
            if word.endswith(suf):
                break  # longest match only; no vowel -> no action

    r1 = _r1_start(word)
    r2 = _region_start_after(word, r1)

    # step 1c: y/Y -> i after a non-vowel that isn't the first letter
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in "aeiouy"
    ):
        word = word[:-1] + "i"

    # step 2 (suffix must lie in R1); longest match first
    step2 = [
        ("ization", "ize"), ("ational", "ate"), ("ousness", "ous"),
        ("iveness", "ive"), ("fulness", "ful"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"), ("ogi", None), ("li", None),
    ]
    for suf, rep in step2:
        if not word.endswith(suf):
            continue
        if len(word) - len(suf) >= r1:
            if suf == "ogi":
                if word.endswith("logi"):
                    word = word[:-1]
            elif suf == "li":
                if len(word) >= 3 and word[-3] in _LI_ENDING:
                    word = word[:-2]
            else:
                word = word[: -len(suf)] + rep
        break

    r1 = _r1_start(word)
    r2 = _region_start_after(word, r1)

    # step 3 (in R1; 'ative' additionally requires R2)
    step3 = [
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ative", ""),
        ("ical", "ic"), ("ness", ""), ("ful", ""),
    ]
    for suf, rep in step3:
        if not word.endswith(suf):
            continue
        if len(word) - len(suf) >= r1:
            if suf == "ative":
                if len(word) - len(suf) >= r2:
                    word = word[: -len(suf)]
            else:
                word = word[: -len(suf)] + rep
        break

    r1 = _r1_start(word)
    r2 = _region_start_after(word, r1)

    # step 4 (in R2)
    step4 = [
        "ement", "ance", "ence", "able", "ible", "ment",
        "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
        "ion", "al", "er", "ic",
    ]
    for suf in step4:
        if not word.endswith(suf):
            continue
        if len(word) - len(suf) >= r2:
            if suf == "ion":
                if len(word) >= 4 and word[-4] in "st":
                    word = word[:-3]
            else:
                word = word[: -len(suf)]
        break

    r1 = _r1_start(word)
    r2 = _region_start_after(word, r1)

    # step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("l") and len(word) - 1 >= r2 and len(word) >= 2 and word[-2] == "l":
        word = word[:-1]

    return word.lower()


def snowball_stem_col(col: Column) -> Column:
    """Arrow-batched pandas UDF — vectorized batch transfer, one Python
    stage (the reference's nltk call is equally interpreter-bound;
    here it at least runs in parallel across partitions)."""

    @pandas_udf("string")
    def _udf(tokens: pd.Series) -> pd.Series:
        return tokens.map(lambda t: snowball_stem(t) if t else t)

    return _udf(col)


def snowball_golden_sql(
    testdata_root: str = "/root/testdata",
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Golden-table DuckDB oracle for the Snowball query: a VALUES
    mapping ``(word, stem)`` generated by THIS module's
    :func:`snowball_stem` over the distinct lower-cased vocabulary of
    every sf corpus under ``testdata_root`` (single source of truth —
    the two engines cannot drift on the rule cascade; the cascade
    itself is golden-tested against the published Porter2 vocabulary in
    tests/test_stemming.py). A token outside the mapping joins to a
    NULL stem, surfacing incompleteness as a driver mismatch instead of
    silently passing. Porter-1980 ships a full SQL rule cascade
    (stemming.porter_sql_ctes); Porter2's extra region/exception
    machinery is pinned by this golden form instead."""
    import glob

    import duckdb

    files = sorted(glob.glob(f"{testdata_root}/sf*/{table}.parquet"))
    if not files:
        raise FileNotFoundError(f"no {table}.parquet under {testdata_root}/sf*/")
    con = duckdb.connect()
    vocab = [
        r[0]
        for r in con.execute(
            "SELECT DISTINCT lower(t) FROM (SELECT unnest(string_split(trim("
            f"{text_col}), ' ')) AS t FROM read_parquet({files!r})) WHERE t <> ''"
        ).fetchall()
    ]
    con.close()

    def q(s: str) -> str:
        return s.replace("'", "''")

    rows = ", ".join(f"('{q(w)}', '{q(snowball_stem(w))}')" for w in sorted(vocab))
    return f"""WITH toks AS (
         SELECT {id_col},
                unnest(range(len(string_split(trim({text_col}), ' '))))::BIGINT AS pos,
                unnest(string_split(trim({text_col}), ' ')) AS token
         FROM {table}),
       g(w, stem) AS (VALUES {rows})
       SELECT t.{id_col}, t.pos, t.token, g.stem
       FROM toks t LEFT JOIN g ON lower(t.token) = g.w"""
