"""Streaming deduplication with bounded state (beyond-reference ST+).

The reference gets at-most-once writes by probing Postgres for already-
inserted keys (services/transformers/helpers.py:250-346) — a lookup per
batch against an ever-growing table. The streaming-native restatement
is ``dropDuplicatesWithinWatermark``: the first arrival of a key is
emitted immediately (append mode), later arrivals are dropped, and the
per-key state is *evicted once the watermark passes its event time* —
so state is bounded by (arrival rate x watermark delta), not by corpus
size. That bound is what makes exactly-once ingest dedup viable on a
100 TB / months-long stream where plain ``dropDuplicates`` state would
grow without limit.

State lives in the checkpoint's state store (RocksDB-backed on a real
cluster) and survives query restarts, so a twice-weekly AvailableNow
run still dedups across runs within the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """At-least-once source -> exactly-once-per-key stream, keeping
    per-key state only for ``watermark`` past the event time. Works on
    batch DataFrames too (degenerates to dropDuplicates), so the same
    transform serves both paths."""
    e = stream_df.withWatermark(ts_col, watermark)
    return e.dropDuplicatesWithinWatermark(key_cols)
