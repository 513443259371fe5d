"""External-API stage pattern — pliers' remote transformers recast.

Parity target (pattern only, no services): the reference's API
transformers rate-limit requests and guard job sizes
(``pliers/transformers/api/base.py:9-52``: sleep-to-rate-limit :13-16,
``allow_large_jobs``/``long_job``/``large_job`` guards :20-36, key
validation via ``EnvironmentKeyMixin`` :38-42,
``pliers/utils/base.py:128-140``).

Spark shape: a ``mapInPandas`` stage whose worker-side closure holds a
token-bucket rate limiter; admission control happens at plan-build time
(count guard ≡ ``large_job``). The transport is injected — tests pass a
fake; production passes an HTTP client."""

from __future__ import annotations

import os
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class RateLimiter:
    """Token bucket: at most ``rate`` calls per second (per worker)."""

    def __init__(self, rate: float):
        self.min_interval = 1.0 / rate if rate > 0 else 0.0
        self._last = 0.0

    def acquire(self):
        if self.min_interval <= 0:
            return
        now = time.monotonic()
        wait = self._last + self.min_interval - now
        if wait > 0:
            time.sleep(wait)
        self._last = max(now, self._last + self.min_interval)


def env_key_available(var: str) -> bool:
    """≡ EnvironmentKeyMixin.available (pliers/utils/base.py:128-140)."""
    return bool(os.environ.get(var))


def external_stage(
    df: DataFrame,
    id_col: str,
    input_col: str,
    call: Callable[[str], dict],
    out_schema: str,
    rate_per_sec: float = 10.0,
    max_rows: int | None = None,
    allow_large_jobs: bool = False,
    batch_size: int = 32,
) -> DataFrame:
    """Rate-limited external enrichment stage.

    ``call(value) -> dict`` fills the non-id fields of ``out_schema``.
    ``max_rows`` is the large_job admission guard (reference default 100,
    pliers/config.py:31-32): exceeded + not allow_large_jobs → ValueError
    at build time, before any cluster work.
    """
    if max_rows is not None and not allow_large_jobs:
        n = df.count()
        if n > max_rows:
            raise ValueError(
                f"job of {n} rows exceeds large_job guard ({max_rows}); "
                "pass allow_large_jobs=True to override"
            )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        limiter = RateLimiter(rate_per_sec)
        for pdf in batches:
            out = []
            for i in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[i : i + batch_size]
                limiter.acquire()  # one token per (batched) request
                for _, r in chunk.iterrows():
                    out.append({"id": r[id_col], **call(r[input_col])})
            yield pd.DataFrame(out)

    return df.select(id_col, input_col).mapInPandas(fn, schema=out_schema)


# ---------------------------------------------------------------------------
# TweetStim connector recast (pliers/stimuli/api.py:17-107)


TWEET_ENV_KEYS = (
    "TWITTER_CONSUMER_KEY",
    "TWITTER_CONSUMER_SECRET",
    "TWITTER_ACCESS_TOKEN_KEY",
    "TWITTER_ACCESS_TOKEN_SECRET",
)

TWEET_SCHEMA = "id long, text string, media_urls array<string>, n_media int"


def tweet_source(
    df: DataFrame,
    fetch_status: Callable[[int], dict],
    id_col: str = "status_id",
    rate_per_sec: float = 1.0,
    max_rows: int | None = 100,
    allow_large_jobs: bool = False,
) -> DataFrame:
    """``TweetStimFactory.get_status`` recast (pliers/stimuli/api.py:
    17-107): a frame of status ids → CompoundStim-shaped rows
    (primary text + media URL slots, ``TweetStim.__init__``
    :101-107). The transport is injected: tests pass a fixture-backed
    ``fetch_status(status_id) -> {"text", "media_urls"}``; production
    passes a real API client. All four TWITTER_* env keys must be
    present (``_env_keys``, :33-34) unless the injected transport needs
    none — mirroring EnvironmentKeyMixin. Rate limiting, job-size
    admission control, and batching come from ``external_stage``; media
    payloads stay URL references (decode happens in multimodal stages,
    the reference's lazy ``load_stims`` analog)."""

    def call(sid) -> dict:
        status = fetch_status(int(sid))
        urls = list(status.get("media_urls") or [])
        return {
            "text": status.get("text", ""),
            "media_urls": urls,
            "n_media": len(urls),
        }

    src = df.select(
        F.col(id_col).cast("long").alias("status_id"),
        F.col(id_col).cast("long").alias("_sid"),
    )
    out = external_stage(
        src,
        id_col="status_id",
        input_col="_sid",
        call=call,
        out_schema=TWEET_SCHEMA,
        rate_per_sec=rate_per_sec,
        max_rows=max_rows,
        allow_large_jobs=allow_large_jobs,
    )
    return out.select(
        F.col("id").alias("status_id"), "text", "media_urls", "n_media"
    )
