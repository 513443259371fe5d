"""Custom stateful streaming operator via ``applyInPandasWithState``.

The streaming twin of ``WordCounterExtractor``'s running tally
(pliers/extractors/text.py:834-862) generalized to per-entity running
feature stats: for each entity the operator maintains (count, sum,
sum-of-squares) across micro-batches and emits the updated running
mean/std after every batch — the pattern for any custom stateful
feature (drift detectors, per-domain rate trackers) that
``session_window``/``window`` built-ins can't express.

Scale notes: state is one tiny struct per entity, partitioned by the
group key; a watermark-driven timeout (``GroupStateTimeout``) would
evict idle entities in production — kept NoTimeout here because the
test replays a bounded file stream.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_running_stats(
    events: DataFrame,
    entity_col: str,
    value_col: str,
) -> DataFrame:
    """Per-entity running (count, mean, std) across micro-batches."""
    out_schema = f"{entity_col} string, n long, mean double, std double"
    state_schema = "n long, s double, s2 double"

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, s, s2 = state.get
        else:
            n, s, s2 = 0, 0.0, 0.0
        for pdf in pdfs:
            v = pdf[value_col].astype(float)
            n += int(v.count())
            s += float(v.sum())
            s2 += float((v * v).sum())
        state.update((n, s, s2))
        mean = s / n if n else float("nan")
        var = (s2 - n * mean * mean) / (n - 1) if n > 1 else float("nan")
        std = math.sqrt(var) if var == var and var > 0 else 0.0 if n > 1 else float("nan")
        yield pd.DataFrame({entity_col: [key[0]], "n": [n], "mean": [mean], "std": [std]})

    return (
        events.select(entity_col, value_col)
        .groupBy(entity_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
