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
           sum(CAST(round(value * 10000) AS BIGINT)) / 10000.0 AS sum_value,
           CAST((2 * sum(CAST(round(value * 10000) AS BIGINT)) * 100 + count(*))
                // (2 * count(*)) AS BIGINT) / 1000000.0 AS avg_value
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
           sum(CAST(round(value * 10000) AS BIGINT)) / 10000.0 AS sum_value,
           CAST((2 * sum(CAST(round(value * 10000) AS BIGINT)) * 100 + count(*))
                // (2 * count(*)) AS BIGINT) / 1000000.0 AS avg_value
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
           sum(CAST(round(value * 10000) AS BIGINT)) / 10000.0 AS sum_value
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


@register(
    "cumulative_distinct_users",
    """
    WITH firsts AS (
        SELECT user_id, CAST(min(ts) AS DATE) AS first_day
        FROM events GROUP BY user_id),
    daily AS (SELECT first_day AS day, CAST(count(*) AS BIGINT) AS new_users
              FROM firsts GROUP BY first_day)
    SELECT day, new_users,
           CAST(sum(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cumulative_users
    FROM daily
    """,
    doc="Running distinct-user count via the FIRST-TOUCH identity: "
    "cumulative distinct users through day d == users whose first event "
    "is <= d, so the running COUNT(DISTINCT) frame (quadratic state or "
    "a sketch per frame) collapses to one per-user min-agg, one tiny "
    "per-day count, and a running sum over DAYS (constant-width rows). "
    "The exact-answer formulation of the growth curve every dashboard "
    "wants; the sketch alternative (running HLL union) only wins once "
    "per-entity state itself is too large.",
)
def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = _events(spark, sf_dir)
    firsts = ev.groupBy("user_id").agg(F.min("ts").cast("date").alias("first_day"))
    daily = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").alias("new_users")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    # days-per-dataset is tiny (the grain is DAYS, not events), so the
    # single-partition running-sum window is over constant-width rows —
    # the one place a global window is the right plan
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    )


@register(
    "dynamic_gap_sessions",
    """
    WITH g AS (
        SELECT user_id, ts, event_id, value,
               ts + CASE WHEN event_type = 'purchase'
                    THEN INTERVAL 45 MINUTE ELSE INTERVAL 15 MINUTE END AS e
        FROM events),
    m AS (SELECT *, max(e) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS prev_max
          FROM g),
    s AS (SELECT *, CASE WHEN prev_max IS NULL OR ts >= prev_max
                         THEN 1 ELSE 0 END AS brk FROM m),
    i AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid FROM s)
    SELECT user_id,
           CAST(epoch_us(min(ts)) AS BIGINT) AS session_start_us,
           CAST(epoch_us(max(e)) AS BIGINT) AS session_end_us,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(CAST(round(value * 10000) AS BIGINT)) / 10000.0 AS sum_value
    FROM i GROUP BY user_id, sid
    """,
    doc="Sessions whose idle timeout varies PER EVENT (purchases hold "
    "the session open 45 min, everything else 15): native "
    "session_window with a gap EXPRESSION — each event proposes "
    "[ts, ts+gap) and overlapping windows merge, identically in batch "
    "and streaming. The oracle replays the merge as gaps-and-islands "
    "with a running max of proposed ends.",
)
def dynamic_gap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import sessionize_dynamic_gap

    ev = _events(spark, sf_dir)
    gap = F.when(F.col("event_type") == "purchase", "45 minutes").otherwise(
        "15 minutes"
    )
    out = sessionize_dynamic_gap(ev, gap)
    return out.select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "n_events",
        "sum_value",
    )


@register(
    "session_path_pairs",
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
        FROM s GROUP BY user_id, sid),
    dp AS (SELECT path FROM paths GROUP BY path),
    blocked AS (
        SELECT a.path AS path_a, b.path AS path_b
        FROM dp a JOIN dp b
          ON len(string_split(a.path, '>')) = len(string_split(b.path, '>'))
         AND string_split(a.path, '>')[1] = string_split(b.path, '>')[1]
         AND a.path < b.path)
    SELECT path_a, path_b,
           CAST(levenshtein(path_a, path_b) AS INTEGER) AS distance
    FROM blocked WHERE levenshtein(path_a, path_b) <= 4
    """,
    doc="Trajectory-similarity mining over session paths (the REPOSE/"
    "EDBT trajectory-search ask on clickstream data): distinct "
    "session paths pair up only inside a (step-count, first-step) "
    "blocking key — the same selectivity economics as LSH buckets and "
    "fuzzy-name blocks — then character-level edit distance <= 4 "
    "filters inside the block sliver, JVM-side. "
    "operators/fuzzy.py::blocked_levenshtein_pairs over the collapsed "
    "per-session paths (one row per DISTINCT path, never the raw "
    "stream).",
)
def session_path_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.fuzzy import blocked_levenshtein_pairs

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
    dp = paths.select("path").distinct()
    steps = F.split(F.col("path"), ">")
    pairs = blocked_levenshtein_pairs(
        dp,
        id_col="path",
        name_col="path",
        block_expr=F.struct(F.size(steps).alias("n"), steps[0].alias("head")),
        max_distance=4,
    )
    return pairs.select(
        F.col("id_a").alias("path_a"),
        F.col("id_b").alias("path_b"),
        F.col("distance").cast("int").alias("distance"),
    )


@register(
    "event_transition_matrix",
    """
    WITH tr AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events),
    c AS (SELECT event_type AS from_type, next_type,
                 CAST(count(*) AS BIGINT) AS n
          FROM tr WHERE next_type IS NOT NULL GROUP BY 1, 2),
    t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
    SELECT c.from_type, c.next_type, c.n,
           round(c.n / CAST(t.tot AS DOUBLE), 6) AS prob
    FROM c JOIN t USING (from_type)
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: P(next_type | from_type) from one lead() pass keyed on "
    "user (ts + event_id ordering pins ties), a (from, next) count, "
    "and a broadcast per-from normalizer — the behavioral-model "
    "summary (next-action prediction, anomaly scoring) whose cost at "
    "any scale is the one per-user window the session family already "
    "pays; the matrix itself is |event types|², driver-sized.",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        ev.select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
    )
    c = tr.groupBy("from_type", "next_type").agg(F.count("*").alias("n"))
    t = c.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return c.join(F.broadcast(t), "from_type").select(
        "from_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.col("tot").cast("double"), 6).alias("prob"),
    )


@register(
    "event_rate_anomaly",
    """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2),
    stats AS (
        SELECT event_type, h, cnt,
               avg(cnt) OVER w AS mu,
               stddev_samp(cnt) OVER w AS sigma,
               CAST(count(*) OVER w AS BIGINT) AS n_prev
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
    SELECT event_type,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_s,
           cnt,
           round(mu, 6) AS mu,
           round(sigma, 6) AS sigma,
           round((cnt - mu) / nullif(sigma, 0), 6) AS z,
           abs(round((cnt - mu) / nullif(sigma, 0), 6)) > 3.0 AS is_anomaly
    FROM stats WHERE n_prev = 24
    """,
    doc="Event-rate anomaly detection: hourly counts per type scored "
    "against the trailing 24 observed buckets' mean/stddev (ROWS frame "
    "over the pre-aggregated hourly relation — the window runs on "
    "|types|×|hours| rows, never the raw stream), z-score > 3 flags "
    "the spike. The operational monitor every event pipeline runs; "
    "the only raw-data pass is one map-side-combined groupBy.",
bench=True,
)
def event_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("cnt"))
    w = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-24, -1)
    )
    z = (F.col("cnt") - F.avg("cnt").over(w)) / F.nullif(
        F.stddev_samp("cnt").over(w), F.lit(0.0)
    )
    stats = hourly.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_s"),
        "cnt",
        F.round(F.avg("cnt").over(w), 6).alias("mu"),
        F.round(F.stddev_samp("cnt").over(w), 6).alias("sigma"),
        F.round(z, 6).alias("z"),
        (F.abs(F.round(z, 6)) > 3.0).alias("is_anomaly"),
        F.count("*").over(w).alias("n_prev"),
    )
    return stats.filter(F.col("n_prev") == 24).drop("n_prev")


@register(
    "event_cusum_changepoint",
    """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2),
    stats AS (SELECT event_type, avg(cnt) AS mu0, stddev_samp(cnt) AS s0
              FROM hourly GROUP BY 1),
    cus AS (
        SELECT h.event_type, h.h,
               sum((h.cnt - s.mu0) / s.s0)
                   OVER (PARTITION BY h.event_type ORDER BY h.h
                         ROWS UNBOUNDED PRECEDING) AS cusum
        FROM hourly h JOIN stats s USING (event_type)),
    r AS (SELECT event_type, h,
                 round(cusum, 6) AS c, round(abs(cusum), 6) AS a,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY round(abs(cusum), 6) DESC, h) AS rn
          FROM cus)
    SELECT event_type,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS cp_hour_s,
           c AS peak_cusum, a AS abs_peak
    FROM r WHERE rn = 1
    """,
    doc="CUSUM changepoint detection per event type: hourly counts "
    "standardize against the type's global mean/stddev, the cumulative "
    "sum of deviations runs over the ordered hours, and the hour of "
    "peak |CUSUM| is the level-shift estimate — the offline "
    "changepoint locator next to event_rate_anomaly's online z-score. "
    "All windows run on the pre-aggregated |types|×|hours| relation; "
    "the raw stream pays one map-combined groupBy.",
)
def event_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("cnt"))
    stats = hourly.groupBy("event_type").agg(
        F.avg("cnt").alias("mu0"), F.stddev_samp("cnt").alias("s0")
    )
    wcum = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cus = (
        hourly.join(F.broadcast(stats), "event_type")
        .withColumn(
            "cusum",
            F.sum((F.col("cnt") - F.col("mu0")) / F.col("s0")).over(wcum),
        )
    )
    wr = W.partitionBy("event_type").orderBy(
        F.desc(F.round(F.abs("cusum"), 6)), F.asc("h")
    )
    return (
        cus.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("cp_hour_s"),
            F.round("cusum", 6).alias("peak_cusum"),
            F.round(F.abs("cusum"), 6).alias("abs_peak"),
        )
    )
