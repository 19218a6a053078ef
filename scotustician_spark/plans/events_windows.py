"""Event-time window queries over the ``events`` table — the batch
twins of ``streaming/windows.py`` (same transform code runs on a
``readStream`` with a watermark; the oracle verifies the batch
semantics, which Structured Streaming computes incrementally).

Timestamps are emitted as epoch-microsecond BIGINTs: the driver data
is micro-precision, so Spark (micros) and DuckDB (nanos) agree
exactly with zero formatting ambiguity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.windows import hopping_agg, sessionize, tumbling_agg
from .registry import register
from .relational import _events


@register(
    "event_tumbling_agg",
    """
    SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS window_start_us,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS sum_value,
           round(avg(value), 6) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Beyond-reference event-time tumbling window (1h × event_type): "
    "epoch-aligned window() ≡ date_trunc — a single hash aggregation "
    "with map-side partials; watermarked-streaming-safe by construction.",
    bench=True,
)
def event_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = tumbling_agg(_events(spark, sf_dir), "1 hour")
    return out.select(
        F.unix_micros("window_start").alias("window_start_us"),
        "event_type",
        "n_events",
        "sum_value",
        "avg_value",
    )


@register(
    "event_hopping_agg",
    """
    WITH e AS (SELECT event_type, value, epoch_us(ts) AS us FROM events),
    k AS (SELECT unnest([0, 1]) AS k)
    SELECT CAST((us // 1800000000 - k) * 1800000000 AS BIGINT) AS window_start_us,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS sum_value,
           round(avg(value), 6) AS avg_value
    FROM e CROSS JOIN k
    GROUP BY 1, 2
    """,
    doc="Beyond-reference sliding (hopping) window: 1h windows every "
    "30min — each event expands in-row to exactly window/slide = 2 "
    "epoch-aligned windows (no self-join against a window table), one "
    "hash aggregation with map-side partials; the oracle derives the "
    "same two window starts by integer epoch arithmetic.",
)
def event_hopping_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = hopping_agg(_events(spark, sf_dir), "1 hour", "30 minutes")
    return out.select(
        F.unix_micros("window_start").alias("window_start_us"),
        "event_type",
        "n_events",
        "sum_value",
        "avg_value",
    )


@register(
    "event_sessions",
    """
    WITH o AS (
        SELECT user_id, ts, value,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        FROM events),
    m AS (SELECT *, CASE WHEN prev IS NULL
                              OR ts - prev >= INTERVAL 30 MINUTE
                         THEN 1 ELSE 0 END AS brk FROM o),
    s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid FROM m)
    SELECT user_id,
           CAST(epoch_us(min(ts)) AS BIGINT) AS session_start_us,
           CAST(epoch_us(max(ts) + INTERVAL 30 MINUTE) AS BIGINT) AS session_end_us,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM s GROUP BY user_id, sid
    """,
    doc="Beyond-reference sessionization: native session_window with a "
    "30-min gap (stateful merging windows in streaming; verified here "
    "against gaps-and-islands SQL). One shuffle keyed by user_id.",
    bench=True,
)
def event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = sessionize(_events(spark, sf_dir), "30 minutes")
    return out.select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "n_events",
        "sum_value",
    )


@register(
    "session_paths",
    """
    WITH o AS (
        SELECT user_id, ts, event_id, event_type,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events),
    m AS (SELECT *, CASE WHEN prev IS NULL
                              OR ts - prev >= INTERVAL 30 MINUTE
                         THEN 1 ELSE 0 END AS brk FROM o),
    s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid FROM m),
    paths AS (
        SELECT user_id, sid,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM s GROUP BY user_id, sid)
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path ASC
    LIMIT 20
    """,
    doc="Event-path mining: per session (native session_window, 30-min gap) "
    "the ordered event-type path, then the global top-20 paths by "
    "frequency. Ordered assembly via array_sort(collect_list(struct)) — "
    "deterministic at any parallelism; top-n compiles to "
    "TakeOrderedAndProject.",
    bench=True,
)
def session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    path = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda x: x["event_type"],
        ),
        ">",
    )
    paths = ev.groupBy(
        F.session_window("ts", "30 minutes"), F.col("user_id")
    ).agg(path.alias("path"))
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(20)
    )
