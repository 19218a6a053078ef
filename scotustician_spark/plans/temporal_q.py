"""Temporal-join queries over the ``events`` table (as-of + range).

Beyond-reference (SURVEY §2.3 "not present" row): the reference's
only temporal logic is interval arithmetic and ordering
(bronze_oa_text.sql:29-33, helpers.py:164-176). These exercise
``operators/temporal.py`` — the oracles are the *naive* inequality-
join formulations, so the gate proves the scalable plans compute
identical results.

Timestamps flow as epoch-microsecond BIGINTs (micro-precision on
both engines, zero formatting ambiguity — same convention as
events_windows.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.temporal import asof_join, range_join_binned, scd2_intervals
from .registry import register
from .relational import _events


@register(
    "asof_prior_purchase",
    """
    WITH l AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
         r AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
         ranked AS (
           SELECT l.event_id,
                  r.event_id AS prior_purchase_id,
                  r.ts AS r_ts,
                  r.value AS r_value,
                  row_number() OVER (
                      PARTITION BY l.event_id
                      ORDER BY r.ts DESC, r.event_id DESC) AS rn
           FROM l JOIN r ON l.user_id = r.user_id AND r.ts <= l.ts)
    SELECT l.event_id, l.user_id,
           CAST(epoch_us(l.ts) AS BIGINT) AS ts_us,
           l.value,
           k.prior_purchase_id,
           CAST(epoch_us(k.r_ts) AS BIGINT) AS prior_purchase_ts_us,
           k.r_value AS prior_purchase_value
    FROM l LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) k USING (event_id)
    """,
    doc="As-of join: each click event picks up the most recent at-or-before "
    "purchase by the same user. Spark plan is union+window (ONE shuffle on "
    "user_id, no pair explosion); the oracle is the naive inequality-join "
    "argmax — identical results, incomparable scaling.",
    bench=True,
)
def asof_prior_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        "user_id",
        F.unix_micros("ts").alias("p_ts_us"),
        F.col("value").alias("p_value"),
    )
    return asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts_us",
        right_ts="p_ts_us",
        right_payload={
            "p_event_id": "prior_purchase_id",
            "p_ts_us": "prior_purchase_ts_us",
            "p_value": "prior_purchase_value",
        },
        tie_col="p_event_id",
    )


@register(
    "range_join_follow_clicks",
    """
    WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
         c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
    SELECT e.event_id, e.user_id,
           CAST(epoch_us(e.ts) AS BIGINT) AS ts_us,
           CAST(count(c.ts) AS BIGINT) AS n_follow_clicks,
           round(coalesce(sum(c.value), 0.0), 4) AS follow_click_value
    FROM e LEFT JOIN c
      ON e.user_id = c.user_id
     AND c.ts >= e.ts
     AND c.ts < e.ts + INTERVAL 10 MINUTE
    GROUP BY e.event_id, e.user_id, e.ts
    """,
    doc="Range join: clicks within 10 minutes after each error, per user. "
    "Spark plan bins time so the join is an equi-join on (user_id, bin) "
    "with duplication factor 2; the oracle is the naive theta join.",
    bench=True,
)
def range_join_follow_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ten_min_us = 10 * 60 * 1_000_000
    ev = _events(spark, sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.unix_micros("ts").alias("c_ts_us"),
        F.col("value").alias("c_value"),
    )
    pairs = range_join_binned(
        errors,
        clicks,
        on="user_id",
        left_ts="ts_us",
        right_ts="c_ts_us",
        lower_us=0,
        upper_us=ten_min_us,
    )
    counts = pairs.groupBy("event_id").agg(
        F.count("c_ts_us").alias("n"),
        F.round(F.coalesce(F.sum("c_value"), F.lit(0.0)), 4).alias("v"),
    )
    return errors.join(counts, "event_id", "left").select(
        "event_id",
        "user_id",
        "ts_us",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_follow_clicks"),
        F.coalesce("v", F.lit(0.0)).alias("follow_click_value"),
    )


@register(
    "scd2_user_state",
    """
    WITH e AS (SELECT user_id, event_type AS state, ts, event_id FROM events),
    marked AS (
        SELECT *, lag(state) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  AS prev_state
        FROM e),
    changes AS (
        SELECT * FROM marked
        WHERE prev_state IS NULL OR state <> prev_state),
    iv AS (
        SELECT user_id, state, ts,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS valid_to,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS version
        FROM changes)
    SELECT user_id, state,
           CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
           CAST(epoch_us(valid_to) AS BIGINT) AS valid_to_us,
           CAST(version AS INTEGER) AS version,
           valid_to IS NULL AS is_current
    FROM iv
    """,
    doc="SCD Type-2 dimension build from a change log: consecutive "
    "re-observations of the same state collapse, each state change opens "
    "a validity interval closed by the next change (NULL = current). One "
    "shuffle on the key serves both window passes.",
    bench=True,
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "user_id",
        F.col("event_type").alias("state"),
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
    )
    out = scd2_intervals(
        ev, "user_id", "ts_us", ["state"], tie_col="event_id"
    )
    return out.select(
        "user_id",
        "state",
        F.col("valid_from").alias("valid_from_us"),
        F.col("valid_to").alias("valid_to_us"),
        "version",
        "is_current",
    )


@register(
    "ewma_user_value",
    """
    WITH seq AS (
        SELECT user_id, list(value ORDER BY ts, event_id) AS vals
        FROM events GROUP BY user_id)
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           vals[-1] AS last_value,
           round(list_reduce(vals,
                 (acc, x) -> acc * 0.8 + x * 0.2), 6) AS ewma
    FROM seq
    """,
    doc="Exponentially weighted moving average of each user's event "
    "values (alpha=0.2, seeded from the first value) — the standard "
    "monitoring smoother for per-entity rates. The sequential fold is "
    "inherently ordered, so it runs as one in-row lambda over the "
    "ordered collect (array_sort(collect_list(struct)) then "
    "F.aggregate) — one shuffle on user_id, the fold itself is "
    "codegen, no window and no UDF; the oracle is DuckDB's "
    "list_reduce over the identically-ordered list, so the "
    "fold order (and thus every IEEE rounding step) matches "
    "exactly. Last-value and count ride along for the monitoring "
    "readout.",
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    seq = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("s")
    )
    vals = F.col("s").getField("value")
    rest = F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0)))
    ewma = F.aggregate(
        rest,
        F.element_at(vals, 1).cast("double"),
        lambda acc, x: acc * F.lit(0.8) + x * F.lit(0.2),
    )
    return seq.select(
        "user_id",
        F.size(vals).cast("bigint").alias("n_events"),
        F.element_at(vals, -1).alias("last_value"),
        F.round(ewma, 6).alias("ewma"),
    )


@register(
    "event_seasonality",
    """
    WITH c AS (
        SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
               CAST(hour(ts) AS INTEGER) AS hr,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS value_cents
        FROM events GROUP BY 1, 2),
    t AS (SELECT CAST(sum(n_events) AS BIGINT) AS total FROM c)
    SELECT dow, hr, n_events, n_users, value_cents,
           round(n_events / CAST(t.total AS DOUBLE), 6) AS share
    FROM c CROSS JOIN t
    """,
    doc="Traffic seasonality profile: events, distinct users and exact "
    "integer-cent value per (day-of-week x hour) cell, plus each "
    "cell's share of total traffic — the capacity-planning / "
    "anomaly-baseline heatmap (event_rate_anomaly flags deviations "
    "from per-key rates; this is the calendar-shaped baseline they "
    "deviate FROM). One map-side-combined shuffle on 168 cells; "
    "value sums quantize to integer cents first, so the aggregate is "
    "exact at any parallelism (the repo's money discipline); the "
    "total rides a broadcast 1-row relation. DOW mapping pinned: "
    "DuckDB dayofweek is 0-based Sunday, Spark 1-based.",
)
def event_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    c = e.groupBy(
        F.dayofweek("ts").cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hr"),
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("value_cents"),
    )
    t = c.agg(F.sum("n_events").cast("long").alias("total"))
    return c.crossJoin(F.broadcast(t)).select(
        "dow",
        "hr",
        "n_events",
        "n_users",
        "value_cents",
        F.round(F.col("n_events") / F.col("total").cast("double"), 6).alias(
            "share"
        ),
    )
