"""Hand-computed golden pins for the shared-text oracle families
(VERDICT r2 item 9): one literal expected value per family, derived
OUTSIDE both engines (raw hashlib/math or pencil arithmetic), guarding
the generated-SQL discipline against same-bug-both-sides formula errors.
The audio family's pin lives in tests/test_audio_features.py
(test_spectral_contrast_hand_computed_golden); this file covers the
langid and encoder families."""

import hashlib
import math

import pytest


# ------------------------------------------------------------- langid

def test_langid_hand_computed_ratios(spark):
    """'the cat and the dog of la casa' has 8 tokens; English profile
    hits = {the x2, and, of} = 4 -> 0.5; Spanish hits = {la} = 1 ->
    0.125; French also counts 'la' + 'de'? no 'de' token -> 1/8. All
    pencil arithmetic."""
    from pyspark.sql import functions as F

    from pliers_spark.functions.text import langid_best, langid_scores

    df = spark.createDataFrame(
        [(1, "the cat and the dog of la casa")], "id long, text string"
    )
    row = df.select(*langid_scores(F.col("text"))).collect()[0]
    assert row.score_en == pytest.approx(4 / 8)
    assert row.score_es == pytest.approx(1 / 8)
    assert row.score_fr == pytest.approx(1 / 8)
    assert row.score_de == pytest.approx(0.0)
    best = df.select(langid_best(F.col("text")).alias("l")).collect()[0].l
    assert best == "en"


def test_langid_tie_breaks_on_profile_order(spark):
    """'la de' scores 2/2 for both es and fr; the documented tie-break
    (profile order epsilon) must pick es — pencil arithmetic again."""
    from pyspark.sql import functions as F

    from pliers_spark.functions.text import langid_best

    df = spark.createDataFrame([(1, "la de")], "id long, text string")
    assert df.select(langid_best(F.col("text")).alias("l")).collect()[0].l == "es"


# ------------------------------------------------------------ encoder

def _ppm_independent(tok: str, d: int) -> int:
    """Published definition recomputed raw: byte d of md5(tok) scaled to
    ppm with HALF-UP rounding (Spark F.round semantics; positive domain
    so floor(x+0.5) is exact)."""
    byte = int(hashlib.md5(tok.encode()).hexdigest()[2 * d : 2 * d + 2], 16)
    return int(math.floor(byte * 2000000.0 / 255.0 + 0.5)) - 1000000


def _encode_independent(text: str, dim: int = 8) -> list[float]:
    toks = text.split()
    out = []
    for d in range(dim):
        s = sum(
            _ppm_independent(
                str(int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 1024), d
            )
            for w in toks
        )
        m = s / (len(toks) * 1_000_000.0)
        e = math.exp(2.0 * m)
        out.append(math.floor((e - 1.0) / (e + 1.0) * 1_000_000.0) / 1_000_000.0)
    return out


def test_encoder_hand_computed_literal():
    """bucket('hello') = int(md5('hello')[:8], 16) % 1024 = 42 (yes,
    really); the full 8-dim encoding of 'hello world' pinned as
    literals computed by the raw hashlib/math recipe above — never by
    either engine."""
    from pliers_spark.functions.encoder import reference_encode

    assert int(hashlib.md5(b"hello").hexdigest()[:8], 16) % 1024 == 42
    want = [0.328527, 0.047024, 0.003921, 0.147926,
            -0.325025, -0.260521, -0.463658, 0.031362]
    assert _encode_independent("hello world") == want
    assert list(reference_encode("hello world")) == want


def test_encoder_sql_oracle_matches_literal():
    """The generated DuckDB side of the seq_encoding family reproduces
    the same literal vector bit-for-bit."""
    import duckdb

    from pliers_spark.functions.encoder import seq_encode_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO documents VALUES (1, 'hello world')")
    row = con.sql(seq_encode_sql()).fetchone()
    assert list(row[1:]) == [0.328527, 0.047024, 0.003921, 0.147926,
                             -0.325025, -0.260521, -0.463658, 0.031362]
