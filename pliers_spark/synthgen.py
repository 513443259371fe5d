"""Deterministic synthetic ``pages`` generator (FIXTURES.md §1).

Generates the north-rule input table
``pages(url string, warc_ts timestamp, html binary, text string, lang string)``
with the properties the engine's tests and bench need:

- seed-fixed: same (seed, n_urls, snapshots) → byte-identical table;
- Zipf-skewed domains: a few hot domains dominate (skew tests);
- multiple snapshots per url with irregular gaps, some ≫ the session
  threshold (sessionization tests);
- ``text`` derived deterministically from (url, warc_ts) — the
  byte-identical-extracted-text parity gate;
- ``html`` wraps the text (never read by text stages — column-pruning
  check: the scan's ReadSchema must exclude it).

Pure numpy/pyarrow — no Spark needed at generation time, so tests can
materialize fixtures cheaply. At real scale this table is an Iceberg
table bucketed by ``pmod(xxhash64(url), B)`` and sorted by
``(url, warc_ts)`` (SURVEY.md §4); locally we emit parquet sorted that
way so the layout contract is representative.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

WORDS = (
    "data query table row column join scan filter group sort window merge "
    "batch stream key value hash index page crawl text token feature vector "
    "model train test split shard bucket salt skew spill cache"
).split()

LANGS = ["en", "en", "en", "en", "es", "fr", "de", "zh"]

EPOCH = 1_700_000_000  # fixed base timestamp (2023-11-14T22:13:20Z)


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def page_text(url: str, ts: int) -> str:
    """Deterministic text for (url, warc_ts): 20-60 words drawn by hash."""
    seed = _h(f"{url}@{ts}")
    rng = np.random.default_rng(seed % (2**32))
    n = 20 + int(rng.integers(0, 41))
    idx = rng.integers(0, len(WORDS), size=n)
    return " ".join(WORDS[i] for i in idx)


def generate_pages(
    n_urls: int = 200,
    max_snapshots: int = 8,
    n_domains: int = 20,
    zipf_a: float = 1.5,
    session_gap_days: float = 30.0,
    seed: int = 42,
) -> pa.Table:
    rng = np.random.default_rng(seed)
    # Zipf-skewed domain assignment: domain j has weight ~ 1/(j+1)^a
    weights = 1.0 / np.arange(1, n_domains + 1) ** zipf_a
    weights /= weights.sum()
    domains = rng.choice(n_domains, size=n_urls, p=weights)

    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in range(n_urls):
        url = f"https://d{domains[i]}.example.com/page/{i}"
        lang = LANGS[_h(url) % len(LANGS)]
        n_snap = 1 + int(rng.integers(0, max_snapshots))
        t = EPOCH + int(rng.integers(0, 86_400))
        for _ in range(n_snap):
            # irregular gaps: mostly hours-days, occasionally months
            if rng.random() < 0.15:
                t += int(rng.integers(1, 4) * session_gap_days * 86_400)
            else:
                t += int(rng.integers(3_600, 5 * 86_400))
            text = page_text(url, t)
            urls.append(url)
            tss.append(t)
            texts.append(text)
            htmls.append(f"<html><body><p>{text}</p></body></html>".encode())
            langs.append(lang)

    order = np.lexsort((np.array(tss), np.array(urls)))  # sort by (url, warc_ts)
    arr = lambda xs, typ=None: pa.array([xs[i] for i in order], type=typ)
    ts_us = [int(t) * 1_000_000 for t in tss]  # epoch-seconds → µs
    return pa.table(
        {
            "url": arr(urls),
            "warc_ts": arr(ts_us, pa.timestamp("us")),
            "html": arr(htmls, pa.binary()),
            "text": arr(texts),
            "lang": arr(langs),
        }
    )


def write_pages(path: str, row_group_size: int = 8_192, **kwargs) -> str:
    """Small row groups keep the file splittable: parquet parallelism is
    bounded by row-group boundaries, so a single big row group would cap
    scan parallelism at 1 regardless of cores."""
    pq.write_table(generate_pages(**kwargs), path, row_group_size=row_group_size)
    return path
