"""Clean-room VADER parity: golden values from the reference's own test
suite (pliers/tests/extractors/test_text_extractors.py:172-183)."""

import pytest
from pyspark.sql import functions as F

from pliers_spark.functions.vader import polarity_scores, with_vader


def test_vader_golden_scalar():
    s = polarity_scores("VADER is smart, handsome, and funny!")
    assert s["pos"] == pytest.approx(0.752)
    assert s["neg"] == pytest.approx(0.0)
    assert s["neu"] == pytest.approx(0.248)
    assert s["compound"] == pytest.approx(0.8439)


def test_vader_negation_and_booster():
    assert polarity_scores("not good")["compound"] < 0
    assert (
        polarity_scores("very good")["compound"] > polarity_scores("good")["compound"]
    )


def test_vader_empty():
    assert polarity_scores("") == {"pos": 0.0, "neg": 0.0, "neu": 0.0, "compound": 0.0}


def test_vader_udf_matches_local(spark):
    texts = [
        "VADER is smart, handsome, and funny!",
        "the table was slow and the query failed",
        "",
        "great fast perfect",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    out = {r.id: r for r in with_vader(df).collect()}
    for i, t in enumerate(texts):
        exp = polarity_scores(t)
        assert out[i].sentiment_compound == pytest.approx(exp["compound"])
        assert out[i].sentiment_pos == pytest.approx(exp["pos"])


def test_vader_sql_oracle_matches_python_bitwise():
    """The DuckDB-rendered VADER engine (the driver oracle) must agree
    with the Python engine BIT-FOR-BIT (the driver hashes raw float
    bits) on randomized texts exercising every rule: lexicon, boosters
    at distance 1-3, negations, caps emphasis, but-clause, ! and ?
    amplification, punctuation stripping, and empty docs."""
    import random
    import struct

    import duckdb

    from pliers_spark.functions.vader import (
        BOOSTERS, LEXICON, NEGATIONS, polarity_scores, vader_sql,
    )

    lex, boost, negs = list(LEXICON), list(BOOSTERS), sorted(NEGATIONS)
    filler = ["table", "the", "row", "data", "walk", "stone"]
    texts = []
    rng = random.Random(11)
    for _ in range(400):
        ws = []
        for _ in range(rng.randint(0, 14)):
            r = rng.random()
            if r < 0.35:
                w = rng.choice(lex)
            elif r < 0.5:
                w = rng.choice(boost)
            elif r < 0.62:
                w = rng.choice(negs)
            elif r < 0.67:
                w = "but"
            else:
                w = rng.choice(filler)
            if rng.random() < 0.15:
                w = w.upper()
            if rng.random() < 0.1:
                w = w + rng.choice(["!", "!!", "?", "??", ",", "."])
            ws.append(w)
        texts.append(" ".join(ws))
    texts += ["", "good", "not good", "very very good !!!", "bad but good",
              "funny hate the kinda walk"]  # half-even rounding boundary case

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", list(enumerate(texts)))
    got = {r[0]: r[1:] for r in con.sql(vader_sql()).fetchall()}
    bits = lambda x: struct.pack("<d", x).hex()
    for i, t in enumerate(texts):
        want = polarity_scores(t)
        w = (want["pos"], want["neg"], want["neu"], want["compound"])
        assert tuple(map(bits, w)) == tuple(map(bits, got[i])), (t, w, got[i])


def test_vader_lexicon_file_parses_published_format(tmp_path):
    """load_lexicon_file parses the exact nltk/vaderSentiment
    vader_lexicon.txt TSV: token<TAB>mean<TAB>stddev<TAB>[ratings];
    later duplicates win (nltk make_lex_dict semantics)."""
    from pliers_spark.functions.vader import load_lexicon_file

    p = tmp_path / "vader_lexicon.txt"
    p.write_text(
        "$:\t-1.5\t0.80623\t[-1, -1, -1, -1, -3, -1, -3, -1, -2, -1]\n"
        "splendid\t2.8\t0.6\t[3, 3, 2, 3, 3, 3, 2, 3, 3, 2]\n"
        "can't stand\t-2.0\t0.5\t[-2, -2, -2, -2, -2, -2, -2, -2, -2, -2]\n"
        "\n"
        "splendid\t3.0\t0.6\t[3, 3, 3, 3, 3, 3, 3, 3, 3, 3]\n"
        "badline_no_tab\n",
        encoding="utf-8",
    )
    lex = load_lexicon_file(str(p))
    assert lex["$:"] == -1.5
    assert lex["splendid"] == 3.0  # later duplicate wins
    assert lex["can't stand"] == -2.0
    assert "badline_no_tab" not in lex


def test_vader_swapped_lexicon_engine_and_oracle_stay_in_sync(tmp_path, monkeypatch):
    """Dropping a full lexicon in (set_lexicon or the
    PLIERS_SPARK_VADER_LEXICON env path) must swap BOTH the Python engine
    and the rendered DuckDB oracle, bit-for-bit — the zero-code-change
    deployment path for the real ~7,500-entry public file."""
    import struct

    import duckdb

    import pliers_spark.functions.vader as V

    p = tmp_path / "vader_lexicon.txt"
    p.write_text(
        "splendid\t2.8\t0.6\t[3, 3, 2, 3, 3, 3, 2, 3, 3, 2]\n"
        "dreadful\t-2.9\t0.7\t[-3, -3, -3, -3, -3, -2, -3, -3, -3, -3]\n"
        "o'clock\t0.4\t0.2\t[0, 0, 1, 0, 1, 0, 1, 0, 1, 0]\n"
        "good\t1.9\t0.9\t[2, 2, 2, 2, 2, 2, 2, 2, 2, 1]\n",
        encoding="utf-8",
    )
    # env-path route: reset the override, point the env at the file
    V.set_lexicon(None)
    monkeypatch.setenv("PLIERS_SPARK_VADER_LEXICON", str(p))
    try:
        assert V.active_lexicon()["splendid"] == 2.8
        # word outside the old 30-word embedded subset now scores
        assert V.polarity_scores("splendid")["compound"] > 0
        assert V.polarity_scores("dreadful")["compound"] < 0
        # and a subset-only word NOT in the file no longer scores
        assert V.polarity_scores("awesome")["compound"] == 0.0

        texts = ["splendid", "not splendid", "VERY splendid day!",
                 "dreadful but splendid", "it's five o'clock somewhere", ""]
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", list(enumerate(texts)))
        got = {r[0]: r[1:] for r in con.sql(V.vader_sql()).fetchall()}
        bits = lambda x: struct.pack("<d", x).hex()
        for i, t in enumerate(texts):
            want = V.polarity_scores(t)
            w = (want["pos"], want["neg"], want["neu"], want["compound"])
            assert tuple(map(bits, w)) == tuple(map(bits, got[i])), (t, w, got[i])
    finally:
        V.set_lexicon(None)
        monkeypatch.delenv("PLIERS_SPARK_VADER_LEXICON")
        V.set_lexicon(None)


# ----------------------------------------------------------------------
# round 4 (VERDICT r3 item 5): rule-engine goldens for the paper's
# canonical examples — pins the RULES independently of lexicon width.
# Values marked [pub] equal the published vaderSentiment README outputs
# for the same sentence (they depend only on subset-covered words).

def test_vader_rule_goldens_punctuation_emphasis():
    base = polarity_scores("VADER is smart, handsome, and funny.")
    assert base["compound"] == pytest.approx(0.8316)  # [pub]
    one = polarity_scores("VADER is smart, handsome, and funny!")
    assert one["compound"] == pytest.approx(0.8439)  # [pub]
    three = polarity_scores("VADER is smart, handsome, and funny!!!")
    assert three["compound"] > one["compound"] > base["compound"]
    # emphasis saturates at 4 exclamation points
    four = polarity_scores("VADER is smart, handsome, and funny!!!!")
    nine = polarity_scores("VADER is smart, handsome, and funny!!!!!!!!!")
    assert four["compound"] == nine["compound"]


def test_vader_rule_goldens_allcaps_and_booster():
    plain = polarity_scores("The book was good.")
    assert plain["compound"] == pytest.approx(0.4404)  # [pub]
    caps = polarity_scores("The book was GOOD.")
    assert caps["compound"] > plain["compound"]
    very = polarity_scores("The book was very good.")
    assert very["compound"] > plain["compound"]
    damped = polarity_scores("The book was kind of good.")
    assert damped["compound"] == pytest.approx(0.3832)  # [pub]
    assert damped["compound"] < plain["compound"]


def test_vader_rule_goldens_but_clause():
    mixed = polarity_scores(
        "The plot was good, but the characters are uncompelling "
        "and the dialog is not great."
    )
    # the but-clause shifts weight to the negated second half [pub sign]
    assert mixed["compound"] < 0
    flipped = polarity_scores("The dialog is not great, but the plot was good.")
    assert flipped["compound"] > 0


def test_vader_rule_goldens_negation_damping():
    near = polarity_scores("not good")["compound"]
    far = polarity_scores("not at all good")["compound"]
    assert near < 0 and far < 0
    # booster at distance 2/3 is damped vs distance 1
    d1 = polarity_scores("very good")["compound"]
    d2 = polarity_scores("very much good")["compound"]
    assert d1 > d2 > polarity_scores("good")["compound"]


def test_vader_rule_goldens_idioms():
    # idiom override: "bad ass" flips the negative 'bad' positive
    assert polarity_scores("that dessert is bad ass")["compound"] > 0
    assert polarity_scores("that dessert is bad")["compound"] < 0
    # idioms fire through the (w, next) sequence only when the current
    # word carries lexicon valence (subset: 'bad' does, 'yeah' doesn't)
    s = polarity_scores("the kiss of death for a bad movie")
    assert s["compound"] < 0


def test_vader_rule_goldens_multiword_booster_sql_sync():
    """The mw-booster and idiom paths must render identically in the
    DuckDB oracle (same tables, same order)."""
    import duckdb

    from pliers_spark.functions.vader import vader_sql

    texts = [
        "that dessert is bad ass",
        "The book was kind of good.",
        "sort of great effort",
        "the kiss of death for a bad movie",
        "just enough good to pass",
        "VADER is VERY SMART, handsome, and FUNNY!!!",
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(texts)))
        + ") t(doc_id, text)",
        texts,
    )
    rows = con.execute(
        vader_sql() + " ORDER BY doc_id"
    ).fetchall()
    for (doc_id, pos, neg, neu, comp), text in zip(rows, texts):
        ref = polarity_scores(text)
        assert comp == pytest.approx(ref["compound"], abs=1e-9), text
        assert pos == pytest.approx(ref["pos"], abs=1e-9), text


# ----------------------------------------------------------------------
# round 5 (VERDICT r4 item 7): deploy-path smoke at FULL lexicon size —
# a synthetic 7,500-entry file through the PLIERS_SPARK_VADER_LEXICON
# mechanism, engine/oracle/Spark agreement proven at that scale, so the
# only untested thing about full-lexicon VADER is the real file's
# literal contents, not the mechanism at size.


def _synth_full_lexicon(path):
    """Deterministic 7,500-entry lexicon in the published TSV format:
    seeded by md5 of the token, valences on the real file's [-3.9, 3.9]
    grid (one decimal), including multiword entries, apostrophes,
    emoticon-style punctuation tokens, and a duplicate (later wins)."""
    import hashlib

    lines = []
    for i in range(7_480):
        tok = f"synthword{i}"
        h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
        val = ((h % 79) - 39) / 10.0  # -3.9 .. 3.9
        sd = ((h >> 8) % 20) / 10.0
        lines.append(f"{tok}\t{val}\t{sd}\t[0]")
    # realistic token shapes from the published file
    lines += [
        "can't stand\t-2.0\t0.5\t[-2]",
        "kind of\t-0.3\t0.2\t[0]",
        "o'clock\t0.4\t0.2\t[0]",
        ":-)\t1.3\t0.6\t[1]",
        ":(\t-1.9\t0.8\t[-2]",
        "</3\t-3.0\t0.9\t[-3]",
        "friendly\t2.2\t0.5\t[2]",
        "hostile\t-2.5\t0.6\t[-3]",
        "splendid\t2.8\t0.6\t[3]",
        "splendid\t3.0\t0.6\t[3]",  # duplicate: later wins
        "dreadful\t-2.9\t0.7\t[-3]",
        "meh\t-0.9\t0.4\t[-1]",
        "lol\t1.6\t0.7\t[2]",
        "yay\t2.4\t0.6\t[2]",
        "ugh\t-1.8\t0.5\t[-2]",
        "meltdown\t-2.2\t0.6\t[-2]",
        "sunshine\t1.9\t0.5\t[2]",
        "grim\t-1.6\t0.5\t[-2]",
        "stellar\t2.7\t0.6\t[3]",
        "woeful\t-2.4\t0.6\t[-2]",
    ]
    path.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return 7_480 + 19  # unique tokens (duplicate collapses)


def test_vader_full_size_lexicon_deploy_smoke(tmp_path, monkeypatch, spark):
    import struct

    import duckdb

    import pliers_spark.functions.vader as V

    p = tmp_path / "vader_lexicon_full.txt"
    n_unique = _synth_full_lexicon(p)
    V.set_lexicon(None)
    monkeypatch.setenv("PLIERS_SPARK_VADER_LEXICON", str(p))
    try:
        lex = V.active_lexicon()
        assert len(lex) == n_unique >= 7_499
        assert lex["splendid"] == 3.0  # later duplicate won

        texts = [
            "splendid",                         # full-size lookup
            "not splendid at all",              # negation against big lex
            "VERY stellar day!!!",              # booster + caps + punct emphasis
            "dreadful but splendid",            # 'but' damping
            "synthword123 and synthword4567",   # deep-file entries score
            "can't stand this meltdown :(",     # multiword + emoticon
            "kind of grim, sort of woeful",     # multiword damper
            "no sunshine today </3",            # negation word + emoticon
            "yay lol ugh meh",                  # short-token pileup
            "",                                 # empty
        ]
        # entries far apart in the file both resolve
        assert V.polarity_scores("synthword123")["compound"] != 0.0 or lex["synthword123"] == 0.0
        # 1) Python engine <-> DuckDB oracle, bit-for-bit at full width
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", list(enumerate(texts)))
        got = {r[0]: r[1:] for r in con.sql(V.vader_sql()).fetchall()}
        bits = lambda x: struct.pack("<d", x).hex()
        for i, t in enumerate(texts):
            want = V.polarity_scores(t)
            w = (want["pos"], want["neg"], want["neu"], want["compound"])
            assert tuple(map(bits, w)) == tuple(map(bits, got[i])), (t, w, got[i])
        # 2) Spark Arrow-batched path ships the full lexicon in the
        # closure and agrees bit-for-bit with the Python engine
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        rows = {
            r.doc_id: r
            for r in df.select(
                "doc_id", V.vader_scores(F.col("text")).alias("s")
            ).select("doc_id", "s.*").collect()
        }
        for i, t in enumerate(texts):
            want = V.polarity_scores(t)
            got_r = (rows[i].pos, rows[i].neg, rows[i].neu, rows[i].compound)
            w = (want["pos"], want["neg"], want["neu"], want["compound"])
            assert tuple(map(bits, w)) == tuple(map(bits, got_r)), (t, w, got_r)
    finally:
        V.set_lexicon(None)
        monkeypatch.delenv("PLIERS_SPARK_VADER_LEXICON")
        V.set_lexicon(None)
