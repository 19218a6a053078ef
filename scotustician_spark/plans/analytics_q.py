"""Warehouse-analytics extensions: statistical aggregates, rank
windows, cohort retention, calendar gap-fill, blocked fuzzy matching,
heavy hitters, histograms, set operations.

These widen SURVEY §2.4/§2.6's "not present — built-in if extended"
rows into first-class, oracle-gated queries, plus the scale-shaped
operators behind them (operators/frequency.py, timeseries.py,
fuzzy.py). All relational pieces are pure Catalyst built-ins — the
plans stay inside whole-stage codegen with map-side partial
aggregation; the scale notes live on each query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..operators.frequency import token_heavy_hitters
from ..operators.fuzzy import blocked_levenshtein_pairs
from ..operators.timeseries import gap_fill_daily
from .registry import register
from .relational import _events, _t


@register(
    "group_linear_stats",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT)                                AS n,
           round(corr(l_extendedprice, l_quantity), 6)             AS price_qty_corr,
           round(covar_samp(l_extendedprice, l_quantity), 4)       AS price_qty_covar,
           round(regr_slope(l_extendedprice, l_quantity), 4)       AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4)   AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6)          AS r2,
           round(stddev_samp(l_extendedprice), 4)                  AS price_stddev
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Per-group bivariate statistics (corr/covar/OLS slope-intercept-"
    "r2/stddev) — one groupBy, every moment accumulated map-side in the "
    "same partial-aggregation pass (Catalyst fuses the shared sum/sum-of-"
    "squares/cross-product state), so the shuffle carries one constant-"
    "width row per group regardless of fact-table size.",
)
def group_linear_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.corr(y, x), 6).alias("price_qty_corr"),
        F.round(F.covar_samp(y, x), 4).alias("price_qty_covar"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.stddev_samp(y), 4).alias("price_stddev"),
    )


@register(
    "window_ranks",
    """
    SELECT c_custkey, c_nationkey, c_acctbal,
           CAST(dense_rank()   OVER w AS BIGINT) AS bal_dense_rank,
           percent_rank() OVER w                 AS bal_pct_rank,
           cume_dist()    OVER w                 AS bal_cume_dist,
           CAST(ntile(4)  OVER w AS BIGINT)      AS bal_quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    doc="Rank-family windows (dense_rank/percent_rank/cume_dist/ntile) "
    "— the §2.6 'not present' row. ONE window spec serves all four "
    "(single sort within each nation partition); the tiebreak on "
    "c_custkey pins ntile/percent_rank determinism. Partitioned on a "
    "real key, so no single-partition global sort exists in the plan.",
)
def window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.dense_rank().over(w).cast("long").alias("bal_dense_rank"),
        F.percent_rank().over(w).alias("bal_pct_rank"),
        F.cume_dist().over(w).alias("bal_cume_dist"),
        F.ntile(4).over(w).cast("long").alias("bal_quartile"),
    )


@register(
    "cohort_retention",
    """
    WITH firsts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(date_diff('day', f.cohort_week,
                              date_trunc('week', e.ts)) / 7 AS INTEGER)
                   AS week_offset
        FROM events e JOIN firsts f ON e.user_id = f.user_id)
    SELECT CAST(cohort_week AS DATE) AS cohort_week, week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM activity
    GROUP BY cohort_week, week_offset
    """,
    doc="Cohort retention matrix: users bucketed by first-activity week, "
    "counted once per (cohort, week-offset) they return in. Two "
    "aggregations + one equi-join on user_id; the join input is one row "
    "per user on the build side (pre-aggregated firsts — the reference's "
    "pre-aggregate-then-join discipline), and the DISTINCT collapses "
    "per-user-week before the final count so the last shuffle carries "
    "user-weeks, not raw events.",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.col("cohort_week").cast("date").alias("cohort_week"), "week_offset"
    ).agg(F.count("*").alias("n_users"))


@register(
    "ts_gapfill",
    """
    WITH obs AS (
        SELECT o_orderpriority AS priority,
               CAST(o_orderdate AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue,
               round(avg(o_totalprice), 4) AS avg_price
        FROM orders GROUP BY 1, 2),
    bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM obs),
    axis AS (SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                                CAST(hi AS TIMESTAMP),
                                                INTERVAL 1 DAY)) AS DATE) AS day
             FROM bounds),
    dense AS (SELECT p.priority, axis.day
              FROM (SELECT DISTINCT priority FROM obs) p, axis)
    SELECT d.priority, d.day,
           o.n_orders IS NOT NULL AS is_observed,
           coalesce(o.n_orders, 0) AS n_orders,
           coalesce(o.revenue, 0) AS revenue,
           last_value(o.avg_price IGNORE NULLS)
               OVER (PARTITION BY d.priority ORDER BY d.day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS avg_price
    FROM dense d LEFT JOIN obs o
      ON d.priority = o.priority AND d.day = o.day
    """,
    doc="Calendar gap-fill + LOCF: daily order counts/revenue per "
    "priority densified onto the full date span — zero-filled counts, "
    "last-observation-carried-forward average price. The dense axis is "
    "born IN-ROW (sequence()+explode per key — no calendar-table cross "
    "join), the observed side is pre-aggregated to the (key, day) "
    "grain, and the LOCF window partitions per key. O(keys × span) "
    "rows, one equi-join, one window.",
    bench=True,
)
def ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    obs = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("day"),
    ).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )
    return gap_fill_daily(
        obs,
        key_col="priority",
        date_col="day",
        zero_cols=["n_orders", "revenue"],
        locf_cols=["avg_price"],
    )


@register(
    "fuzzy_name_pairs",
    """
    WITH s AS (
        SELECT c_custkey AS id, c_name AS name,
               CAST(length(c_name) AS VARCHAR) || '|' ||
                   substring(c_name, 1, 16) AS blk
        FROM customer)
    SELECT a.id AS id_a, b.id AS id_b,
           a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS INTEGER) AS distance
    FROM s a JOIN s b ON a.blk = b.blk AND a.id < b.id
    WHERE levenshtein(a.name, b.name) <= 1
    """,
    doc="Blocked fuzzy self-join (entity resolution): candidate pairs "
    "share a (length, 16-char-prefix) blocking key, then JVM-side "
    "levenshtein filters inside the block sliver only — pair cost is "
    "quadratic in BLOCK size, never corpus size (the blocking-key "
    "selectivity knob, same economics as LSH bucket sparsity).",
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.fuzzy import length_prefix_block

    c = _t(spark, sf_dir, "customer")
    return blocked_levenshtein_pairs(
        c,
        id_col="c_custkey",
        name_col="c_name",
        block_expr=length_prefix_block("c_name", prefix_len=16),
        max_distance=1,
    )


@register(
    "token_heavy_hitters",
    """
    WITH toks AS (
        SELECT unnest(regexp_split_to_array(
                   regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'),
                   '\\s+')) AS token
        FROM documents
        WHERE length(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g')) > 0)
    SELECT token, CAST(count(*) AS BIGINT) AS freq
    FROM toks GROUP BY token HAVING count(*) >= 200
    """,
    doc="Exact heavy-hitter tokens via per-partition Misra-Gries "
    "summaries (bounded k-counter state, pure map side) + exact recount "
    "of the candidate sliver only — the full token stream never "
    "shuffles, unlike the oracle's global GROUP BY. MG recall guarantee "
    "(freq > n/k survives every summary) makes the result exact.",
    bench=True,
)
def token_heavy_hitters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return token_heavy_hitters(d, "text", min_freq=200, k=4096)


@register(
    "orders_histogram",
    """
    WITH b AS (
        SELECT least(19, greatest(0,
                   CAST(floor(o_totalprice / 30000.0) AS INTEGER))) AS bucket,
               o_totalprice
        FROM orders)
    SELECT bucket,
           CAST(bucket * 30000.0 AS DOUBLE) AS bucket_lo,
           CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price,
           round(sum(o_totalprice), 2) AS sum_price
    FROM b GROUP BY bucket
    """,
    doc="Equal-width histogram (fixed 30k bins, clamped top bucket): "
    "binning is pure row-local arithmetic on the scan, so the plan is "
    "one map + one 20-group aggregation — the single-pass profile shape "
    "(cf. table_profile) for numeric distribution dashboards.",
)
def orders_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    bucket = F.least(
        F.lit(19),
        F.greatest(F.lit(0), F.floor(F.col("o_totalprice") / 30000.0).cast("int")),
    )
    return (
        o.select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            (F.col("bucket") * 30000.0).cast("double").alias("bucket_lo"),
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


@register(
    "part_flag_setops",
    """
    WITH r AS (SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'R'),
    a AS (SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'A')
    SELECT l_partkey AS partkey, 'both' AS membership
    FROM (SELECT * FROM r INTERSECT SELECT * FROM a)
    UNION ALL
    SELECT l_partkey, 'returned_only'
    FROM (SELECT * FROM r EXCEPT SELECT * FROM a)
    """,
    doc="Set operations (INTERSECT / EXCEPT) over derived key sets — "
    "parts appearing under both return flags vs only 'R'. Spark plans "
    "both as aggregated joins (left-semi / left-anti over distincts); "
    "the inputs are pre-distinct key columns, so the shuffles carry "
    "keys only.",
)
def part_flag_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey").distinct()
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey").distinct()
    both = r.intersect(a).select(
        F.col("l_partkey").alias("partkey"), F.lit("both").alias("membership")
    )
    only_r = r.exceptAll(a).select(
        F.col("l_partkey").alias("partkey"),
        F.lit("returned_only").alias("membership"),
    )
    return both.unionByName(only_r)
