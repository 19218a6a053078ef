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
            # exact integer accumulation: value sits on a 1e-4 grid, so
            # the scaled sum is exact and one float division yields a
            # bit-identical double on any engine; the former
            # round(sum(double), 4) hit a 5e-5 summation-order boundary
            # at sf0.1 (r10 scale sweep). avg rounds half-up with the
            # integer identity (2a + n) div (2n) — the rfm_segments
            # discipline.
            F.sum(F.round(F.col("value") * 10000).cast("long")).alias("_sv"),
        )
        .withColumn("sum_value", F.col("_sv") / F.lit(10000.0))
        .withColumn(
            "avg_value",
            F.expr("(2 * _sv * 100 + n_events) div (2 * n_events)").cast("long")
            / F.lit(1000000.0),
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
            # exact integer accumulation: value sits on a 1e-4 grid, so
            # the scaled sum is exact and one float division yields a
            # bit-identical double on any engine; the former
            # round(sum(double), 4) hit a 5e-5 summation-order boundary
            # at sf0.1 (r10 scale sweep). avg rounds half-up with the
            # integer identity (2a + n) div (2n) — the rfm_segments
            # discipline.
            F.sum(F.round(F.col("value") * 10000).cast("long")).alias("_sv"),
        )
        .withColumn("sum_value", F.col("_sv") / F.lit(10000.0))
        .withColumn(
            "avg_value",
            F.expr("(2 * _sv * 100 + n_events) div (2 * n_events)").cast("long")
            / F.lit(1000000.0),
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
            # exact scaled-integer sum (see tumbling_agg)
            (
                F.sum(F.round(F.col("value") * 10000).cast("long"))
                / F.lit(10000.0)
            ).alias("sum_value"),
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
            # exact scaled-integer sum (see tumbling_agg)
            (
                F.sum(F.round(F.col("value") * 10000).cast("long"))
                / F.lit(10000.0)
            ).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
