"""Porter stemmer golden tests (examples from the published algorithm;
WordStemmingFilter parity path, pliers/filters/text.py:24-110)."""

import pyspark.sql.functions as F

from pliers_spark.functions.stemming import porter_stem, porter_stem_col

GOLDEN = {
    # from Porter's paper examples
    "caresses": "caress",
    "ponies": "poni",
    "ties": "ti",
    "caress": "caress",
    "cats": "cat",
    "feed": "feed",
    "agreed": "agre",
    "plastered": "plaster",
    "bled": "bled",
    "motoring": "motor",
    "sing": "sing",
    "conflated": "conflat",
    "troubled": "troubl",
    "sized": "size",
    "hopping": "hop",
    "tanned": "tan",
    "falling": "fall",
    "hissing": "hiss",
    "fizzed": "fizz",
    "failing": "fail",
    "filing": "file",
    "happy": "happi",
    "sky": "sky",
    "relational": "relat",
    "conditional": "condit",
    "rational": "ration",
    "valenci": "valenc",
    "digitizer": "digit",
    "conformabli": "conform",
    "radicalli": "radic",
    "differentli": "differ",
    "vileli": "vile",
    "analogousli": "analog",
    "vietnamization": "vietnam",
    "predication": "predic",
    "operator": "oper",
    "feudalism": "feudal",
    "decisiveness": "decis",
    "hopefulness": "hope",
    "callousness": "callous",
    "formaliti": "formal",
    "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    "triplicate": "triplic",
    "formative": "form",
    "formalize": "formal",
    # paper step-3 examples show intermediates; step 4 then strips 'ic'
    # at m>1, so the algorithm's final outputs are:
    "electriciti": "electr",
    "electrical": "electr",
    "hopeful": "hope",
    "goodness": "good",
    "revival": "reviv",
    "allowance": "allow",
    "inference": "infer",
    "airliner": "airlin",
    "gyroscopic": "gyroscop",
    "adjustable": "adjust",
    "defensible": "defens",
    "irritant": "irrit",
    "replacement": "replac",
    "adjustment": "adjust",
    "dependent": "depend",
    "adoption": "adopt",
    "homologou": "homolog",
    "communism": "commun",
    "activate": "activ",
    "angulariti": "angular",
    "homologous": "homolog",
    "effective": "effect",
    "bowdlerize": "bowdler",
    "probate": "probat",
    "rate": "rate",
    "cease": "ceas",
    "controll": "control",
    "roll": "roll",
}


def test_porter_golden():
    errs = {w: (porter_stem(w), exp) for w, exp in GOLDEN.items() if porter_stem(w) != exp}
    assert not errs, errs


def test_porter_udf(spark):
    df = spark.createDataFrame([(w,) for w in GOLDEN], "token string")
    out = {r.token: r.stem for r in df.select("token", porter_stem_col(F.col("token")).alias("stem")).collect()}
    assert out == GOLDEN


# ---------------------------------------------------------------------------
# WordNet-lemmatizer path (WordStemmingFilter(stemmer='wordnet'),
# pliers/filters/text.py:73-108) — morphy-lite rules + POS-aware dispatch.

MORPHY_GOLDEN = [
    ("churches", "n", "church"),
    ("dishes", "n", "dish"),
    ("women", "n", "woman"),
    ("ponies", "n", "pony"),
    ("wolves", "n", "wolf"),
    ("boxes", "n", "box"),
    ("glasses", "n", "glass"),
    ("caress", "n", "caress"),  # bare-s never strips from -ss
    ("axes", "n", "axe"),  # xes stem would be 1 char -> falls to s-rule
    ("cats", "n", "cat"),
    ("running", "v", "runn"),  # lexicon-free: no CVC repair, pinned
    ("agreed", "v", "agre"),
    ("flies", "v", "fly"),
    ("goes", "v", "go"),
    ("is", "v", "is"),  # stem 'i' too short
    ("bigger", "a", "bigg"),
    ("fastest", "a", "fast"),
    ("quickly", "r", "quickly"),  # adverbs: no detachment rules
]


def test_morphy_lite_golden():
    from pliers_spark.functions.stemming import morphy_lite

    for word, pos, want in MORPHY_GOLDEN:
        assert morphy_lite(word, pos) == want, (word, pos)


def test_morphy_expr_matches_lite(spark):
    from pliers_spark.functions.stemming import morphy_expr, morphy_lite

    rows = [(w, p) for w, p, _ in MORPHY_GOLDEN] + [
        (w, p)
        for w in ["ss", "s", "a", "tries", "seed", "apple", "men", "ves"]
        for p in ["n", "v", "a", "r"]
    ]
    df = spark.createDataFrame(rows, "tok string, wn_pos string")
    got = {
        (r["tok"], r["wn_pos"]): r["lemma"]
        for r in df.withColumn("lemma", morphy_expr(F.col("tok"), F.col("wn_pos"))).collect()
    }
    for (tok, pos), lemma in got.items():
        assert lemma == morphy_lite(tok, pos), (tok, pos)


def test_tag_expr_matches_tag_sequence(spark):
    """tag_expr (codegen path) must agree with tag_sequence (the python
    sequence tagger) on whole documents."""
    from pyspark.sql import Window

    from pliers_spark.functions.pos import tag_expr, tag_sequence

    docs = [
        "the cat sat on the mat",
        "she quickly moved 42 boxes and the dog barked loudly",
        "a beautiful day is coming with the 3.5 percent rise",
        "they have finished painting the colorful durable fence",
    ]
    expected = {
        (i, p): t
        for i, d in enumerate(docs)
        for p, t in enumerate(tag_sequence([w.lower() for w in d.split()]))
    }
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "doc_id long, text string")
    toks = df.select(
        "doc_id", F.posexplode(F.split("text", r"\s+")).alias("pos", "token")
    ).withColumn("w", F.lower("token"))
    seq = Window.partitionBy("doc_id").orderBy("pos")
    out = toks.withColumn("tag", tag_expr(F.col("w"), F.lag("w").over(seq)))
    got = {(r["doc_id"], r["pos"]): r["tag"] for r in out.collect()}
    assert got == expected


def _ref_wordnet_lemmatize(text: str) -> str:
    """Pure-python model of the reference filter, incl. the
    dict(pos_tag(tokens)) last-occurrence-wins quirk."""
    from pliers_spark.functions.stemming import TAG_TO_WORDNET, morphy_lite
    from pliers_spark.functions.pos import tag_sequence

    words = [w.lower() for w in text.split()]
    tag_map = dict(zip(words, tag_sequence(words)))
    return " ".join(
        morphy_lite(w, TAG_TO_WORDNET.get(tag_map[w], "n")) for w in words
    )


def test_wordnet_lemmatize_docs(spark):
    from pliers_spark.functions.stemming import wordnet_lemmatize_docs

    docs = [
        "the cats sat on the mats",
        "she was running and the dogs were agreeing loudly",
        "the churches held 42 glasses of the finest wines",
        "wolves chase wolves while wolves watched the wolves",  # repeated token
        "a box of boxes boxes the box",  # same token, different contexts
    ]
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "doc_id long, text string")
    got = {r["doc_id"]: r["lemmatized"] for r in wordnet_lemmatize_docs(df).collect()}
    want = {i: _ref_wordnet_lemmatize(d) for i, d in enumerate(docs)}
    assert got == want


def test_porter_sql_oracle_matches_python():
    """The DuckDB-rendered Porter cascade (the driver oracle) must agree
    with the Python engine on randomized suffix-rich words."""
    import random

    import duckdb

    from pliers_spark.functions.stemming import porter_sql_ctes, porter_stem

    rng = random.Random(7)
    sufs = ["sses", "ies", "ss", "s", "eed", "ed", "ing", "y", "ational", "tional",
            "enci", "izer", "abli", "ousli", "ization", "ator", "iveness", "aliti",
            "icate", "ative", "alize", "ical", "ful", "ness", "al", "ance", "er",
            "ic", "able", "ant", "ement", "ment", "ent", "ou", "ism", "ate", "iti",
            "ous", "ive", "ize", "ion", "tion", "e", "ll", "l", ""]
    vocab = {"syzygy", "yy", "sky", "crying", "dying", "agreed", "feed", "controll"}
    for _ in range(800):
        base = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                       for _ in range(rng.randint(0, 8)))
        vocab.add(base + rng.choice(sufs))
    vocab = sorted(w for w in vocab if w)

    body, out_col = porter_sql_ctes()
    con = duckdb.connect()
    con.execute("CREATE TABLE v(token VARCHAR)")
    con.executemany("INSERT INTO v VALUES (?)", [(w,) for w in vocab])
    got = dict(con.sql(
        f"WITH pstem_in AS (SELECT token, lower(token) AS w0 FROM v),\n{body}\n"
        f"SELECT token, {out_col} FROM pstem_out"
    ).fetchall())
    bad = [(w, porter_stem(w), got[w]) for w in vocab if got[w] != porter_stem(w)]
    assert not bad, bad[:10]
