"""Deterministic distributed sketches.

The corpus-accounting family (`corpus_stats`) already pairs exact
distinct counts with HLL; this module adds the Count-Min sketch
(Cormode & Muthukrishnan 2005) — the bounded-memory frequency
estimator a 100 TB pipeline uses for heavy-hitter detection when the
exact token census itself is too wide to materialize.

Everything is deterministic integer arithmetic over the engine's
seeded 60-bit md5 (functions/hashing.py), so the whole sketch — build
AND probe — replays exactly in a DuckDB oracle: the sketch table is
depth x width BIGINT counters built with one explode + groupBy
(map-side partial agg; the shuffle carries at most depth*width rows),
and a probe takes the MIN over the depth rows it hashes into
(guaranteed overestimate, never under).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.hashing import md5_int, md5_int_sql


def countmin_build(
    items: DataFrame, item_col: str, depth: int = 3, width: int = 1024
) -> DataFrame:
    """CMS counter table (seed, col, cnt) over an item stream: each item
    increments one counter per hash row. depth*width bounded output."""
    rows = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        F.pmod(md5_int(F.col(item_col), seed=s), F.lit(width)).alias("col"),
                    )
                    for s in range(depth)
                ]
            )
        ).alias("rc")
    )
    return rows.groupBy("rc.seed", "rc.col").agg(F.count(F.lit(1)).alias("cnt"))


def countmin_probe(
    sketch: DataFrame, probes: DataFrame, item_col: str, depth: int = 3, width: int = 1024
) -> DataFrame:
    """Estimate each probe item's frequency: min over its depth counters
    (missing counter = 0). The sketch is tiny — broadcast joins."""
    keyed = probes.select(
        F.col(item_col),
        *[
            F.pmod(md5_int(F.col(item_col), seed=s), F.lit(width)).alias(f"c{s}")
            for s in range(depth)
        ],
    )
    out = keyed
    for s in range(depth):
        side = sketch.where(F.col("seed") == s).select(
            F.col("col").alias(f"c{s}"), F.col("cnt").alias(f"n{s}")
        )
        out = out.join(F.broadcast(side), f"c{s}", "left")
    est = F.least(*[F.coalesce(F.col(f"n{s}"), F.lit(0)) for s in range(depth)])
    return out.select(F.col(item_col), est.cast("long").alias("cms_est"))


def countmin_token_sql(
    table: str = "documents",
    text_col: str = "text",
    depth: int = 3,
    width: int = 1024,
    top_k: int = 20,
) -> str:
    """DuckDB oracle: build the identical CMS over corpus tokens and
    probe the exact top-``top_k`` tokens."""
    build_rows = " UNION ALL ".join(
        f"SELECT {s} AS seed, CAST({md5_int_sql('token', seed=s)} % {width} AS BIGINT) AS col FROM toks"
        for s in range(depth)
    )
    probe_cols = ", ".join(
        f"CAST({md5_int_sql('token', seed=s)} % {width} AS BIGINT) AS c{s}"
        for s in range(depth)
    )
    joins = " ".join(
        f"LEFT JOIN cms s{s} ON s{s}.seed = {s} AND s{s}.col = p.c{s}"
        for s in range(depth)
    )
    least = ", ".join(f"coalesce(s{s}.cnt, 0)" for s in range(depth))
    return f"""WITH toks AS (
  SELECT unnest(string_split(trim({text_col}), ' ')) AS token FROM {table}),
cms AS (
  SELECT seed, col, count(*)::BIGINT AS cnt FROM ({build_rows}) GROUP BY 1, 2),
exact AS (
  SELECT token, count(*)::BIGINT AS exact_cnt FROM toks
  GROUP BY token ORDER BY exact_cnt DESC, token LIMIT {top_k}),
p AS (SELECT token, exact_cnt, {probe_cols} FROM exact)
SELECT p.token, p.exact_cnt,
       least({least})::BIGINT AS cms_est,
       (least({least}) - p.exact_cnt)::BIGINT AS overcount
FROM p {joins}"""
