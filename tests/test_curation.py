"""Curation ops: BPE-ish token counting, PII scrubbing, boilerplate
line removal — behavioral tests on crafted inputs (the sf corpus is
PII-free and boilerplate-light, so the oracle checks parity while
these pin semantics)."""

import pyspark.sql.functions as F
import pytest


def _run_pii(spark, text):
    from pliers_spark.queries import _PII_RULES

    c = F.lit(text)
    for pat, rep in _PII_RULES:
        c = F.regexp_replace(c, pat, rep)
    return spark.range(1).select(c.alias("t")).first()["t"]


def test_pii_scrub_email_ip_phone(spark):
    assert _run_pii(spark, "mail bob.smith+x@example.co.uk now") == "mail <EMAIL> now"
    assert _run_pii(spark, "from 192.168.1.254 port") == "from <IP> port"
    assert _run_pii(spark, "call +1(555)123-4567 ok") == "call <PHONE> ok"
    assert _run_pii(spark, "v1.2 costs 3.50 at pos 7") == "v1.2 costs 3.50 at pos 7"


def test_bpe_token_count_vs_reference_regex(spark):
    import re

    from pliers_spark.queries import _BPE_RE

    texts = [
        "I've seen 42 foxes, really!",
        "spark-sql   counts\ttokens",
        "it's the user's 3rd try...",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", F.size(F.expr(f'regexp_extract_all(text, "{_BPE_RE}", 0)')).alias("n")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == len(re.findall(_BPE_RE, t)), t


def test_boilerplate_removal_drops_hot_lines(spark, monkeypatch):
    """Lines appearing in >= threshold docs vanish; doc order preserved;
    all-boilerplate docs come back empty (not missing)."""
    from pliers_spark.functions import text as T

    hot = "subscribe to our newsletter."
    rows = [(i, f"{hot} unique words {i} here. closing note {i}.") for i in range(5)]
    rows.append((99, hot))  # all-boilerplate doc
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sents = df.select(
        "doc_id", F.posexplode(T.split_sentences(F.col("text"))).alias("pos", "sentence")
    )
    df_t = sents.groupBy("sentence").agg(F.countDistinct("doc_id").alias("df"))
    kept = sents.join(df_t.where(F.col("df") < 5), "sentence")
    agg = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "sentence"))),
                lambda s: s["sentence"],
            ),
            " ",
        ).alias("clean_text")
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in df.select("doc_id").join(agg, "doc_id", "left")
        .select("doc_id", F.coalesce("clean_text", F.lit("")).alias("clean_text"))
        .collect()
    }
    assert out[0] == "unique words 0 here. closing note 0."
    assert out[3] == "unique words 3 here. closing note 3."
    assert out[99] == ""
    assert all(hot not in v for v in out.values())
