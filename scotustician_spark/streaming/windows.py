"""Event-time windowed aggregation + sessionization.

Beyond-reference streaming analytics (the reference is append-only
batch with no event-time aggs — SURVEY §2.9), built so the SAME
transform runs in batch (oracle-verifiable vs DuckDB) and on a
``readStream`` DataFrame with a watermark. Tumbling windows align to
the epoch, so ``window('1 hour')`` ≡ ``date_trunc('hour', ts)`` — the
oracle identity. Session windows use Spark's native
``session_window`` (gap-merge), whose batch semantics equal the
gaps-and-islands SQL the oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    events: DataFrame,
    window_len: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Per (window, event_type): count + value stats. With a watermark
    this is a valid streaming agg (late rows beyond the bound drop);
    in batch the watermark is a no-op and results are exact."""
    e = events
    if watermark:
        e = e.withWatermark("ts", watermark)
    return (
        e.groupBy(F.window("ts", window_len).alias("w"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def hopping_agg(
    events: DataFrame,
    window_len: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding (hopping) event-time windows: every event lands in
    ``window_len``/``slide`` overlapping windows, so the same per-
    (window, event_type) stats are available at a finer cadence than a
    tumbling window without halving the smoothing span. Spark expands
    the windows in-row (no self-join against a window table), and with
    a watermark the same plan is an incremental streaming agg."""
    e = events
    if watermark:
        e = e.withWatermark("ts", watermark)
    return (
        e.groupBy(F.window("ts", window_len, slide).alias("w"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def sessionize_dynamic_gap(
    events: DataFrame,
    gap_col,
    watermark: str | None = None,
) -> DataFrame:
    """Per-user sessions whose idle timeout varies PER EVENT
    (``gap_col``: a Column evaluating to an interval/duration string —
    e.g. long-form content events hold sessions open longer than
    pings). Native ``session_window(ts, gap_expr)``: each event
    proposes [ts, ts + its gap) and overlapping windows merge, in
    streaming exactly as in batch. session_end = max(ts + gap) over
    the merged events."""
    e = events
    if watermark:
        e = e.withWatermark("ts", watermark)
    return (
        e.groupBy(F.session_window("ts", gap_col).alias("w"), "user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Per-user sessions with a ``gap`` idle timeout: native
    ``session_window`` — state-merging windows in streaming, plain
    aggregation in batch. window.end = last event + gap."""
    e = events
    if watermark:
        e = e.withWatermark("ts", watermark)
    return (
        e.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
