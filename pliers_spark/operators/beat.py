"""Dynamic-programming beat tracker over the onset-strength envelope.

Reference surface: ``BeatTrackExtractor`` (pliers/extractors/audio.py:
286-301), which wraps ``librosa.beat.beat_track`` — Ellis's (2007)
dynamic-programming tracker: forward pass ``score[t] = onset[t] +
max_d(score[t-d] - penalty(d))`` over a bounded predecessor window,
then a backtrack from the best-scoring frame. librosa is absent from
this container, so the engine implements the same DP shape with an
**exact-integer variant**: onsets in micro-units (round(flux·1e6)) and
a quadratic integer penalty ``LAMBDA·(d-PERIOD)²`` instead of the
float ``tightness·ln²(d/period)`` — every score is an int64, so a
DuckDB oracle (recursive CTE) reproduces the full DP bit-for-bit.
Ties break deterministically: best end frame = smallest t among
maxima; best predecessor = smallest d among maxima.

Scale shape: the DP is sequential **per entity** but embarrassingly
parallel across entities — one applyInPandas group per series, O(T·W)
work, O(T) memory. That is the canonical Spark shape for per-series
DP (same as the cogrouped as-of join): the shuffle is one hash
partition by entity; skew is bounded by the longest single series,
not by data volume. No driver-side state anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

PERIOD = 4  # target inter-beat interval, in frames
WINDOW = 8  # max predecessor distance (frames)
LAMBDA = 250_000  # integer penalty weight, micro-units per (d-PERIOD)^2
SCALE = 1_000_000  # onset micro-unit scale

BEAT_SCHEMA = "user_id long, beat_seq long, frame long, score long"


def _penalty(d: int) -> int:
    return LAMBDA * (d - PERIOD) * (d - PERIOD)


def beat_track(flux: DataFrame, entity_col: str = "user_id") -> DataFrame:
    """flux(entity, frame, flux) → beats(entity, beat_seq, frame, score).

    Forward DP + backtrack per entity inside one Arrow batch; the
    grouped map is the only stage after the flux window pass.
    """

    def track(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("frame")
        frames = pdf["frame"].to_numpy()
        o = np.rint(pdf["flux"].to_numpy() * SCALE).astype(np.int64)
        t_count = len(o)
        scores = np.empty(t_count, dtype=np.int64)
        scores[0] = o[0]
        for t in range(1, t_count):
            best = None
            for d in range(1, min(t, WINDOW) + 1):
                v = scores[t - d] - _penalty(d)
                if best is None or v > best:  # strict: ties keep smallest d
                    best = v
            scores[t] = o[t] + best
        # backtrack from the best end (smallest t on ties = first argmax)
        t = int(np.argmax(scores))
        chain = [t]
        while t >= 1:
            best_d = None
            best_v = None
            for d in range(1, min(t, WINDOW) + 1):
                v = scores[t - d] - _penalty(d)
                if best_v is None or v > best_v:
                    best_v, best_d = v, d
            t -= best_d
            chain.append(t)
        chain.reverse()
        ent = pdf[entity_col].iloc[0]
        return pd.DataFrame(
            {
                "user_id": np.full(len(chain), ent, dtype=np.int64),
                "beat_seq": np.arange(len(chain), dtype=np.int64),
                "frame": frames[chain],
                "score": scores[chain],
            }
        )

    return (
        flux.select(entity_col, "frame", "flux")
        .groupBy(entity_col)
        .applyInPandas(track, schema=BEAT_SCHEMA)
    )


def beat_track_sql(flux_sql: str, entity_col: str = "user_id") -> str:
    """The identical DP as a DuckDB recursive CTE: a forward recursion
    carrying the last WINDOW scores as a list, a relational predecessor
    table (window argmax with the same (value DESC, d ASC) tie-break),
    and a backtrack recursion walking pred pointers to t=0."""
    pen = f"{LAMBDA}*((d)-{PERIOD})*((d)-{PERIOD})"
    best = (
        "list_max(list_transform(range(1, len(dp.hist)+1), "
        f"d -> dp.hist[len(dp.hist)-d+1] - {pen}))"
    )
    score = f"f.o + {best}"
    nh = f"list_append(dp.hist, {score})"
    cap = (
        f"CASE WHEN len({nh}) > {WINDOW} "
        f"THEN ({nh})[len({nh})-{WINDOW - 1}:len({nh})] ELSE {nh} END"
    )
    pred_pen = f"{LAMBDA}*((s1.t-s2.t)-{PERIOD})*((s1.t-s2.t)-{PERIOD})"
    return f"""WITH RECURSIVE flux AS (
{flux_sql}
),
f AS (
  SELECT {entity_col} AS user_id,
         row_number() OVER (PARTITION BY {entity_col} ORDER BY frame) - 1 AS t,
         frame,
         CAST(round(flux * {SCALE}) AS BIGINT) AS o
  FROM flux),
dp AS (
  SELECT user_id, t, frame, o AS score, [o] AS hist FROM f WHERE t = 0
  UNION ALL
  SELECT f.user_id, f.t, f.frame, {score} AS score, {cap} AS hist
  FROM dp JOIN f ON f.user_id = dp.user_id AND f.t = dp.t + 1),
scores AS (SELECT user_id, t, frame, score FROM dp),
preds AS (
  SELECT user_id, t, pred_t FROM (
    SELECT s1.user_id, s1.t, s2.t AS pred_t,
           row_number() OVER (
             PARTITION BY s1.user_id, s1.t
             ORDER BY s2.score - {pred_pen} DESC, s1.t - s2.t ASC) AS rn
    FROM scores s1 JOIN scores s2
      ON s2.user_id = s1.user_id
     AND s2.t >= s1.t - {WINDOW} AND s2.t < s1.t)
  WHERE rn = 1),
ends AS (
  SELECT user_id, t FROM (
    SELECT user_id, t,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY score DESC, t ASC) AS rn
    FROM scores)
  WHERE rn = 1),
bt AS (
  SELECT user_id, t FROM ends
  UNION ALL
  SELECT p.user_id, p.pred_t AS t
  FROM bt JOIN preds p ON p.user_id = bt.user_id AND p.t = bt.t)
SELECT b.user_id,
       row_number() OVER (PARTITION BY b.user_id ORDER BY b.t) - 1 AS beat_seq,
       s.frame, s.score
FROM bt b JOIN scores s ON s.user_id = b.user_id AND s.t = b.t"""
