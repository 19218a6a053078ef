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
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
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


ANOMALY_STATE_SCHEMA = StructType(
    [
        StructField("hours", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("open_hour", LongType()),
        StructField("open_cnt", LongType()),
    ]
)

ANOMALY_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("hour_epoch", LongType()),
        StructField("cnt", LongType()),
        StructField("mu", DoubleType()),
        StructField("sigma", DoubleType()),
        StructField("z", DoubleType()),
        StructField("is_anomaly", BooleanType()),
    ]
)

_ANOMALY_WINDOW = 24


def _anomaly_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-type state: the last 24 OBSERVED hourly counts (ring) plus
    the currently-open hour. A strictly-later event hour CLOSES the
    open hour — it is scored against the ring (z vs mean/stddev of the
    24 trailing buckets, exactly the batch event_rate_anomaly frame)
    and then enters the ring, evicting the oldest. State is O(25)
    longs per key forever; late events for already-closed hours drop
    (bound lateness with an upstream watermark)."""
    import math
    from collections import Counter

    (etype,) = key
    if state.exists:
        hours, counts, open_h, open_c = state.get
        hours, counts = list(hours), list(counts)
    else:
        hours, counts, open_h, open_c = [], [], -1, 0

    delta: Counter = Counter()
    for pdf in pdfs:
        for h in (pdf["ts"].astype("int64") // (3600 * 10**9)).tolist():
            delta[int(h)] += 1

    rows = []
    for h in sorted(delta):
        if open_h == -1:
            open_h, open_c = h, 0
        if h < open_h:
            continue  # late beyond the closed horizon
        if h > open_h:
            # close the open hour: score against the ring, then rotate
            if len(counts) == _ANOMALY_WINDOW:
                mu = sum(counts) / len(counts)
                var = sum((c - mu) ** 2 for c in counts) / (len(counts) - 1)
                sigma = math.sqrt(var)
                z = (open_c - mu) / sigma if sigma > 0 else None
                zr = round(z, 6) if z is not None else None
                rows.append(
                    (
                        etype,
                        open_h,
                        open_c,
                        round(mu, 6),
                        round(sigma, 6),
                        zr,
                        (abs(zr) > 3.0) if zr is not None else None,
                    )
                )
            hours.append(open_h)
            counts.append(open_c)
            if len(hours) > _ANOMALY_WINDOW:
                hours.pop(0)
                counts.pop(0)
            open_h, open_c = h, 0
        open_c += delta[h]

    state.update((hours, counts, open_h, open_c))
    yield pd.DataFrame(
        rows,
        columns=[
            "event_type",
            "hour_epoch",
            "cnt",
            "mu",
            "sigma",
            "z",
            "is_anomaly",
        ],
    )


def streaming_rate_anomaly(events: DataFrame) -> DataFrame:
    """events(ts, event_type) stream → one scored row per CLOSED hour
    per type once 24 trailing observed buckets exist — the streaming
    twin of the batch ``event_rate_anomaly`` query, with O(25) longs
    of state per key instead of a growing hourly table. Append-mode
    output (a closed hour's verdict is final)."""
    return events.groupBy("event_type").applyInPandasWithState(
        _anomaly_update,
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
