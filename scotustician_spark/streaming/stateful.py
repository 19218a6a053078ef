"""Custom stateful streaming operator via ``applyInPandasWithState``.

Beyond-reference: the reference's only state is the processed-file set
(ST4). Real streaming pipelines need arbitrary keyed state — here a
per-key running aggregate (count / sum / last-seen event time) that
emits an updated row per key per micro-batch. The same function also
runs in batch tests by feeding one batch through the streaming engine
(memory sink), which is how the test verifies it.

State is a single struct row per key — the minimal shape; the pattern
generalizes to dedup-within-key, CDC merge, or custom session logic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("max_ts_us", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("max_ts_us", LongType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, s, mx = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, s, mx))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_value": [s], "max_ts_us": [mx]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """events(ts, user_id, value) stream → one updated total row per
    user per micro-batch. Update-mode output; state never times out
    (bound it with a timeout conf in production if keys churn)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
