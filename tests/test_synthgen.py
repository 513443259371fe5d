"""Synthetic pages table: determinism + byte-identical text gate."""

import pyarrow.parquet as pq

from pliers_spark.synthgen import generate_pages, page_text


def test_deterministic_generation():
    a = generate_pages(n_urls=50, seed=42)
    b = generate_pages(n_urls=50, seed=42)
    assert a.equals(b)  # byte-identical across runs


def test_text_is_function_of_url_ts():
    t1 = page_text("https://d0.example.com/page/1", 1_700_000_000)
    t2 = page_text("https://d0.example.com/page/1", 1_700_000_000)
    t3 = page_text("https://d0.example.com/page/1", 1_700_000_001)
    assert t1 == t2 and t1 != t3


def test_schema_and_skew(pages_path):
    t = pq.read_table(pages_path)
    assert t.column_names == ["url", "warc_ts", "html", "text", "lang"]
    # Zipf skew: the hottest domain holds a disproportionate share of urls
    urls = t.column("url").to_pylist()
    domains = [u.split("//")[1].split(".")[0] for u in urls]
    from collections import Counter

    counts = Counter(domains).most_common()
    assert counts[0][1] >= 3 * counts[-1][1]


def test_sorted_within_url(pages_path):
    t = pq.read_table(pages_path)
    rows = list(zip(t.column("url").to_pylist(), t.column("warc_ts").to_pylist()))
    assert rows == sorted(rows)  # layout contract: sorted by (url, warc_ts)


def test_byte_identical_text_gate(spark, pages):
    """Extracted text per (url, warc_ts) matches the generator byte-for-byte
    after a Spark round-trip (north-rule invariant)."""
    sample = pages.limit(20).collect()
    for r in sample:
        expected = page_text(r.url, int(r.warc_ts.timestamp()))
        assert r.text == expected
        assert expected.encode() in bytes(r.html)
