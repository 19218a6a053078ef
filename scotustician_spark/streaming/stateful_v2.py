"""Custom stateful streaming via ``transformWithStateInPandas`` —
Spark 4's arbitrary-state API (the successor to
``applyInPandasWithState``, see stateful.py for that variant).

Same beyond-reference semantics (per-key running totals; the
reference's only state is the processed-file set, ST4), but on the
new API surface, which is what a production pipeline should target:

- typed, NAMED state slots (``getValueState``/``getListState``/
  ``getMapState``) instead of one opaque struct — state evolves by
  adding slots, not rewriting a tuple;
- built-in per-slot **TTL** — idle keys are evicted by the state
  store itself, bounding state at corpus scale without hand-rolled
  timeout plumbing;
- requires the RocksDB state store provider (incremental
  checkpointing, state larger than executor memory — the 100 TB
  posture; the in-memory HDFS-backed provider cannot run this
  operator at all).

Runtime dependency: the transformWithState driver worker speaks a
protobuf wire protocol to the state server, so the ``protobuf``
Python wheel must be installed on driver and executors (the test is
import-gated on it; ``stateful.running_user_totals`` is the
dependency-free fallback on applyInPandasWithState).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double, max_ts_us long"


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user count / sum / max-event-time, one updated row per key
    per micro-batch; optional TTL evicts idle users."""

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals",
            "n_events long, sum_value double, max_ts_us long",
            ttlDurationMs=self._ttl_ms,
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        # ONE state-server round-trip: get() already returns None when
        # absent, so the exists()+get() pair both doubled the per-key
        # RPCs on the hot path and could race TTL eviction between the
        # two calls (exists()==True then get()==None → unpack crash)
        prev = self._totals.get()
        n, s, mx = prev if prev is not None else (0, 0.0, 0)
        for pdf in rows:
            n += len(pdf)
            s += float(pdf["value"].sum())
            if len(pdf):
                mx = max(mx, int(pdf["ts"].astype("int64").max() // 1000))
        self._totals.update((n, s, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [s],
                "max_ts_us": [mx],
            }
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(
    events: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """events(ts, user_id, value) stream → updated totals per user per
    micro-batch, on the transformWithState API. The session must run
    the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``ROCKSDB_PROVIDER``) before the query starts.

    ``timeMode='ProcessingTime'`` is required for TTL state; without a
    TTL it still costs nothing here, so it is always on.
    """
    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotalsProcessor(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime",
    )
