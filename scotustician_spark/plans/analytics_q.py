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
    bench=True,
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
    bench=True,
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
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue,
               CAST((2 * sum(CAST(round(o_totalprice * 100) AS BIGINT)) * 100
                     + count(*)) // (2 * count(*)) AS BIGINT) / 10000.0
                   AS avg_price
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
        # exact integer cents: one float division of an exact sum (the
        # former round(sum(double), 2)/round(avg(double), 4) hit a
        # .xxxx5 summation-order boundary at sf0.1 — r10 scale sweep;
        # avg uses the (2a + n) div (2n) half-up identity, the
        # rfm_segments discipline)
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("_rc"),
    ).select(
        "priority",
        "day",
        "n_orders",
        (F.col("_rc") / F.lit(100.0)).alias("revenue"),
        (
            F.expr("(2 * _rc * 100 + n_orders) div (2 * n_orders)").cast("long")
            / F.lit(10000.0)
        ).alias("avg_price"),
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
               length(c_name) AS len,
               substring(c_name, 1, 16) AS pfx
        FROM customer)
    SELECT a.id AS id_a, b.id AS id_b,
           a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS INTEGER) AS distance
    FROM s a JOIN s b
      ON a.pfx = b.pfx AND abs(a.len - b.len) <= 1 AND a.id < b.id
    WHERE levenshtein(a.name, b.name) <= 1
    """,
    doc="Blocked fuzzy self-join (entity resolution) with a true "
    "length BAND: one side explodes to (len-1..len+1, 16-char-prefix) "
    "keys so insertion/deletion pairs collide too (the exact-length "
    "key finds substitutions only — round-7 review fix), each "
    "qualifying pair on exactly one key; JVM-side levenshtein filters "
    "inside the block sliver only — pair cost is quadratic in BLOCK "
    "size, never corpus size. operators/fuzzy.py::"
    "banded_levenshtein_pairs; the oracle states the same band as a "
    "predicate on the quadratic join.",
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.fuzzy import banded_levenshtein_pairs

    c = _t(spark, sf_dir, "customer")
    return banded_levenshtein_pairs(
        c,
        id_col="c_custkey",
        name_col="c_name",
        prefix_len=16,
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
    doc="Exact heavy-hitter tokens behind a measured auto-select "
    "(choose_heavy_hitter_strategy, VERDICT r6 #4): below 4 GiB of "
    "corpus the plain whole-stage-codegen hash aggregate wins (partial "
    "agg already shrinks the exchange to distinct tokens/partition); "
    "above it, per-partition Misra-Gries summaries (bounded k-counter "
    "state, pure map side) + exact recount of the candidate sliver "
    "keep the full token stream from ever shuffling. MG recall "
    "guarantee (freq > n/k survives every summary) makes both arms "
    "return identical rows (equality-tested).",
    bench=True,
)
def token_heavy_hitters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return token_heavy_hitters(d, "text", min_freq=200)


@register(
    "incremental_quantiles",
    """
    WITH b AS (
        SELECT o_orderpriority AS priority,
               least(63, greatest(0,
                   CAST(floor(o_totalprice / 9375.0) AS INTEGER))) AS bucket
        FROM orders WHERE o_totalprice IS NOT NULL),
    bins AS (SELECT priority, bucket, count(*) AS c FROM b GROUP BY 1, 2),
    cums AS (SELECT priority, bucket,
                    sum(c) OVER (PARTITION BY priority ORDER BY bucket) AS cum,
                    sum(c) OVER (PARTITION BY priority) AS n
             FROM bins)
    SELECT priority, CAST(max(n) AS BIGINT) AS n,
           CAST(9375.0 * min(CASE WHEN cum >= ceil(0.50 * n) THEN bucket END)
                AS DOUBLE) AS p50,
           CAST(9375.0 * min(CASE WHEN cum >= ceil(0.90 * n) THEN bucket END)
                AS DOUBLE) AS p90,
           CAST(9375.0 * min(CASE WHEN cum >= ceil(0.99 * n) THEN bucket END)
                AS DOUBLE) AS p99
    FROM cums GROUP BY priority
    """,
    doc="Mergeable quantile state (operators/quantiles.py): equal-width "
    "histogram partials (64 plain LONG columns per group — column-wise "
    "SUM merge, the mv.py discipline) built separately over a base and "
    "a delta batch, merged WITHOUT rescanning the base, finalized to "
    "step-function p50/p90/p99 (lower edge of the first bin reaching "
    "ceil(q·n)). The oracle recomputes the same estimator from the full "
    "table, so the gate proves merge(partial(base), partial(delta)) == "
    "full — the percentile leg of the incremental-MV family (sum/count/"
    "min/max in mv.py, distinct in the HLL sketches).",
)
def incremental_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantiles import (
        quantile_finalize,
        quantile_merge,
        quantile_partial,
    )

    o = _t(spark, sf_dir, "orders").withColumnRenamed("o_orderpriority", "priority")
    lo, hi, nb = 0.0, 600000.0, 64
    cutoff = "1997-01-01"
    base = o.filter(F.col("o_orderdate") < cutoff)
    delta = o.filter(F.col("o_orderdate") >= cutoff)
    state = quantile_merge(
        ["priority"],
        nb,
        quantile_partial(base, ["priority"], "o_totalprice", lo, hi, nb),
        quantile_partial(delta, ["priority"], "o_totalprice", lo, hi, nb),
    )
    return quantile_finalize(
        state, ["priority"], {"p50": 0.50, "p90": 0.90, "p99": 0.99}, lo, hi, nb
    )


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
    "event_value_outliers",
    """
    WITH med AS (SELECT event_type, median(value) AS med
                 FROM events GROUP BY event_type),
    dev AS (SELECT e.event_id, e.event_type, e.value, med.med,
                   abs(e.value - med.med) AS adev
            FROM events e JOIN med ON e.event_type = med.event_type),
    mad AS (SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type)
    SELECT d.event_id, d.event_type, d.value, d.med, mad.mad,
           0.6745 * (d.value - d.med) / mad.mad AS modified_z
    FROM dev d JOIN mad ON d.event_type = mad.event_type
    WHERE mad.mad > 0
      AND abs(0.6745 * (d.value - d.med) / mad.mad) > 3.5
    """,
    doc="Robust outlier detection via the modified z-score (median/MAD, "
    "Iglewicz-Hoaglin 3.5 cutoff) — immune to the outliers polluting "
    "the baseline, unlike mean/stddev z-scores. Two grouped medians; "
    "the per-group (med, mad) relations are one row per group and "
    "broadcast back onto the scan, so the fact rows never shuffle — "
    "the same decorrelated shape as above_customer_avg. Median is an "
    "order statistic (no summation-order noise), so the row-level "
    "modified z is emitted unrounded with exact engine parity.",
)
def event_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    z = F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        # mad = 0 (constant group) makes the score undefined: such rows
        # are unassessable, not outliers — and the guard keeps ANSI
        # Spark (error) and DuckDB (inf) behavior identical
        .filter(F.col("mad") > 0)
        .withColumn("modified_z", z)
        .filter(F.abs("modified_z") > 3.5)
        .select("event_id", "event_type", "value", "med", "mad", "modified_z")
    )


@register(
    "session_funnel_match",
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
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN regexp_matches(path,
                    'view(>\\w+)*>click(>\\w+)*>purchase')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_funnel_sessions
    FROM paths GROUP BY user_id
    """,
    doc="MATCH_RECOGNIZE-style sequence detection: per-session ordered "
    "event paths (session_window assembly, as session_paths) matched "
    "against the view→click→purchase regex — sessions completing the "
    "funnel IN ORDER within one session, counted per user. The pattern "
    "runs on the collapsed per-session string (one row per session), "
    "never the raw event stream.",
)
def session_funnel_match(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    hit = F.col("path").rlike(r"view(>\w+)*>click(>\w+)*>purchase")
    return paths.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum(hit.cast("long")).alias("n_funnel_sessions"),
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


@register(
    "entity_resolution",
    """
    WITH RECURSIVE s AS (
        SELECT c_custkey AS id, c_name AS name,
               CAST(length(c_name) AS VARCHAR) || '|' ||
                   substring(c_name, 1, 16) AS blk
        FROM customer),
    pairs AS (
        SELECT a.id AS id_a, b.id AS id_b
        FROM s a JOIN s b ON a.blk = b.blk AND a.id < b.id
        WHERE levenshtein(a.name, b.name) <= 1),
    edges AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach AS (
        SELECT c_custkey AS u, c_custkey AS comp FROM customer
        UNION
        SELECT e.v AS u, r.comp AS comp
        FROM reach r JOIN edges e ON e.u = r.u),
    comps AS (SELECT u AS c_custkey, min(comp) AS component_id
              FROM reach GROUP BY u)
    SELECT c_custkey, component_id,
           CAST(count(*) OVER (PARTITION BY component_id) AS BIGINT)
               AS component_size,
           c_custkey = component_id AS is_keeper
    FROM comps
    """,
    doc="End-to-end entity resolution: blocked fuzzy pairs (levenshtein "
    "<= 1 inside (length, prefix) blocks) -> connected components "
    "(hash-min label propagation) -> canonical record per entity "
    "cluster. Composes operators/fuzzy.py with operators/components.py "
    "exactly as dedup_components composes LSH with components; the "
    "oracle walks the same pair graph with a recursive CTE.",
)
def entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import components as CC
    from ..operators.fuzzy import length_prefix_block

    c = _t(spark, sf_dir, "customer")
    pairs = blocked_levenshtein_pairs(
        c, "c_custkey", "c_name", length_prefix_block("c_name", 16), max_distance=1
    )
    return CC.dedup_resolution(pairs, c.select("c_custkey"), id_col="c_custkey")


@register(
    "frequent_item_pairs",
    """
    WITH bi AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    fi AS (SELECT l_partkey FROM bi GROUP BY l_partkey HAVING count(*) >= 20),
    bif AS (SELECT * FROM bi WHERE l_partkey IN (SELECT l_partkey FROM fi)),
    pairs AS (SELECT a.l_partkey AS item_a, b.l_partkey AS item_b
              FROM bif a JOIN bif b
                ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
    SELECT item_a, item_b, CAST(count(*) AS BIGINT) AS support
    FROM pairs GROUP BY item_a, item_b HAVING count(*) >= 3
    """,
    doc="Market-basket frequent pairs (the first two FPGrowth levels, "
    "exact): a-priori pruning — only items frequent in >= 20 baskets "
    "enter the per-basket in-row pair expansion (quadratic only in "
    "FREQUENT items per basket), then pair support >= 3 filters. "
    "Baskets aggregate once on the order key; the frequent-item set "
    "rides a broadcast semi-join; pair counts shuffle with map-side "
    "partials. operators/baskets.py.",
)
def frequent_item_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.baskets import frequent_pairs

    li = _t(spark, sf_dir, "lineitem")
    return frequent_pairs(
        li, "l_orderkey", "l_partkey", min_support=20, pair_min_support=3
    )


@register(
    "psi_drift",
    """
    WITH b AS (
        SELECT o_orderpriority AS priority,
               CASE WHEN o_orderdate < TIMESTAMP '1997-01-01'
                    THEN 'base' ELSE 'cur' END AS period,
               least(9, greatest(0,
                   CAST(floor(o_totalprice / 60000.0) AS INTEGER))) AS bucket
        FROM orders),
    counts AS (SELECT priority, period, bucket, count(*) AS c
               FROM b GROUP BY 1, 2, 3),
    tot AS (SELECT priority, period, sum(c) AS n
            FROM counts GROUP BY 1, 2),
    grid AS (SELECT DISTINCT p.priority, gs.b AS bucket
             FROM (SELECT DISTINCT priority FROM counts) p,
                  (SELECT unnest(range(0, 10)) AS b) gs),
    probs AS (
        SELECT g.priority, g.bucket,
               (coalesce(cb.c, 0) + 1.0)
                   / (tb.n + 10.0) AS p_base,
               (coalesce(cc.c, 0) + 1.0)
                   / (tc.n + 10.0) AS p_cur
        FROM grid g
        JOIN tot tb ON tb.priority = g.priority AND tb.period = 'base'
        JOIN tot tc ON tc.priority = g.priority AND tc.period = 'cur'
        LEFT JOIN counts cb ON cb.priority = g.priority
             AND cb.period = 'base' AND cb.bucket = g.bucket
        LEFT JOIN counts cc ON cc.priority = g.priority
             AND cc.period = 'cur' AND cc.bucket = g.bucket)
    SELECT priority,
           round(sum((p_cur - p_base) * ln(p_cur / p_base)), 6) AS psi
    FROM probs GROUP BY priority
    """,
    doc="Population-stability-index drift check per group: the "
    "o_totalprice distribution before vs after 1997-01-01, Laplace-"
    "smoothed equal-width bins, PSI = sum (p_cur - p_base) * "
    "ln(p_cur/p_base). Row-local binning + two tiny aggregations + a "
    "10-row-per-group probability grid — the drift monitor every "
    "feature pipeline runs, at one scan of the fact table.",
    bench=True,
)
def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    nb = 10
    bucket = F.least(
        F.lit(nb - 1),
        F.greatest(F.lit(0), F.floor(F.col("o_totalprice") / 60000.0).cast("int")),
    )
    period = F.when(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"), "base"
    ).otherwise("cur")
    counts = o.select(
        F.col("o_orderpriority").alias("priority"),
        period.alias("period"),
        bucket.alias("bucket"),
    ).groupBy("priority", "period", "bucket").agg(F.count("*").alias("c"))
    tot = counts.groupBy("priority", "period").agg(F.sum("c").alias("n"))
    grid = (
        counts.select("priority")
        .distinct()
        .crossJoin(
            F.broadcast(
                o.sparkSession.range(nb).select(
                    F.col("id").cast("int").alias("bucket")
                )
            )
        )
    )
    tb = tot.filter(F.col("period") == "base").select("priority", F.col("n").alias("n_b"))
    tc = tot.filter(F.col("period") == "cur").select("priority", F.col("n").alias("n_c"))
    cb = counts.filter(F.col("period") == "base").select(
        "priority", "bucket", F.col("c").alias("c_b")
    )
    cc = counts.filter(F.col("period") == "cur").select(
        "priority", "bucket", F.col("c").alias("c_c")
    )
    probs = (
        grid.join(F.broadcast(tb), "priority")
        .join(F.broadcast(tc), "priority")
        .join(F.broadcast(cb), ["priority", "bucket"], "left")
        .join(F.broadcast(cc), ["priority", "bucket"], "left")
        .select(
            "priority",
            ((F.coalesce("c_b", F.lit(0)) + 1.0) / (F.col("n_b") + float(nb))).alias(
                "p_base"
            ),
            ((F.coalesce("c_c", F.lit(0)) + 1.0) / (F.col("n_c") + float(nb))).alias(
                "p_cur"
            ),
        )
    )
    return probs.groupBy("priority").agg(
        F.round(
            F.sum((F.col("p_cur") - F.col("p_base")) * F.log(F.col("p_cur") / F.col("p_base"))),
            6,
        ).alias("psi")
    )


@register(
    "lateral_top_orders",
    """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    WHERE c.c_custkey < 50
    """,
    doc="Correlated LATERAL subquery (per-customer top-2 orders): "
    "Catalyst DECORRELATES the per-row subquery into one equi-join + "
    "per-key ranking — the declarative surface of topk_per_group, "
    "proving the engine never executes the naive per-outer-row "
    "re-scan a literal reading implies. Identical SQL runs on DuckDB.",
)
def lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c.c_custkey < 50
        """
    )


@register(
    "recursive_ancestry",
    """
    WITH RECURSIVE anc AS (
        SELECT c_custkey AS id, c_custkey AS cur, 0 AS depth FROM customer
        UNION ALL
        SELECT id, cur // 10 AS cur, depth + 1 FROM anc WHERE cur > 0
    )
    SELECT id AS c_custkey,
           CAST(max(depth) AS INTEGER) AS depth_to_root,
           CAST(count(*) AS BIGINT) AS n_ancestors
    FROM anc GROUP BY id
    """,
    doc="Recursive CTE (Spark 4 WITH RECURSIVE, UNION ALL body): walk "
    "the derived decimal-digit hierarchy (parent = key DIV 10) from "
    "every customer to the root — the BOM/org-chart traversal shape. "
    "Each recursion step is one self-join round the engine iterates "
    "until fixpoint, exactly like the hand-rolled loops in "
    "operators/components.py but fully declarative. (Cyclic closure "
    "still needs the loop form: recursive UNION-distinct is not yet "
    "supported, and UNION ALL diverges on cycles.)",
)
def recursive_ancestry(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        WITH RECURSIVE anc AS (
            SELECT c_custkey AS id, c_custkey AS cur, 0 AS depth FROM customer
            UNION ALL
            SELECT id, cur DIV 10 AS cur, depth + 1 FROM anc WHERE cur > 0
        )
        SELECT id AS c_custkey,
               CAST(max(depth) AS INT) AS depth_to_root,
               CAST(count(*) AS BIGINT) AS n_ancestors
        FROM anc GROUP BY id
        """
    )


@register(
    "orderkey_gaps",
    """
    WITH ids AS (SELECT DISTINCT o_orderkey AS id FROM orders
                 WHERE o_orderpriority <> '1-URGENT'),
    l AS (SELECT id, lead(id) OVER (ORDER BY id) AS nxt FROM ids)
    SELECT id + 1 AS gap_start, nxt - 1 AS gap_end,
           nxt - id - 1 AS gap_len
    FROM l WHERE nxt > id + 1
    """,
    doc="Missing-id-range audit (dropped-batch detection) WITHOUT the "
    "textbook global-window sort: ids bucket by DIV, in-bucket gaps "
    "come from parallel per-bucket lead(), cross-bucket gaps from a "
    "lead over the bucket-grain min/max relation (one row per bucket — "
    "metadata through the single partition, never data). The oracle is "
    "the global-window formulation; operators/gaps.py proves the "
    "bucketed union is exactly equal.",
)
def orderkey_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.gaps import sequence_gaps

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return sequence_gaps(o, "o_orderkey", bucket_width=1024)


@register(
    "winsorized_order_stats",
    """
    WITH b AS (SELECT o_orderpriority,
                      round(quantile_cont(o_totalprice, 0.05), 6) AS lo,
                      round(quantile_cont(o_totalprice, 0.95), 6) AS hi
               FROM orders GROUP BY 1)
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(o_totalprice), 4) AS mean_raw,
           round(avg(least(greatest(o_totalprice, lo), hi)), 4) AS mean_winsor,
           CAST(sum(CASE WHEN o_totalprice < lo THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clip_lo,
           CAST(sum(CASE WHEN o_totalprice > hi THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clip_hi
    FROM orders o JOIN b USING (o_orderpriority)
    GROUP BY 1
    """,
    doc="Winsorized robust statistics per group: exact interpolated "
    "p05/p95 bounds (one percentile aggregation, broadcast back) clip "
    "the value column, yielding the outlier-robust mean next to the "
    "raw one plus clip counts — the standard heavy-tail preprocessing "
    "before averaging money-like columns. Two passes over the fact "
    "table, both map-side-combined aggregations; the bounds relation "
    "is |groups| rows.",
)
def winsorized_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    # bounds rounded to 6dp on BOTH engines before the clip/compare:
    # the interpolated percentile can differ cross-engine in the last
    # ulp, which would flip n_clip_lo/hi when a rank lands on a value
    b = o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.05)"), 6).alias("lo"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 6).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi"))
    return (
        o.join(F.broadcast(b), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("o_totalprice"), 4).alias("mean_raw"),
            F.round(F.avg(clipped), 4).alias("mean_winsor"),
            F.sum(F.when(F.col("o_totalprice") < F.col("lo"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clip_lo"),
            F.sum(F.when(F.col("o_totalprice") > F.col("hi"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clip_hi"),
        )
    )


@register(
    "mad_outliers",
    """
    WITH med AS (SELECT o_orderpriority,
                        round(quantile_cont(o_totalprice, 0.5), 6) AS med
                 FROM orders GROUP BY 1),
    dev AS (SELECT o.o_orderpriority, o.o_totalprice, m.med,
                   abs(o.o_totalprice - m.med) AS adev
            FROM orders o JOIN med m USING (o_orderpriority)),
    mad AS (SELECT o_orderpriority,
                   round(quantile_cont(adev, 0.5), 6) AS mad
            FROM dev GROUP BY 1)
    SELECT d.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           m2.med AS median_price,
           m3.mad,
           CAST(sum(CASE WHEN d.adev > 3 * 1.4826 * m3.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d
    JOIN med m2 USING (o_orderpriority)
    JOIN mad m3 ON m3.o_orderpriority = d.o_orderpriority
    GROUP BY 1, 3, 4
    """,
    doc="Robust outlier detection via median absolute deviation: "
    "per-group exact median (broadcast back), median of absolute "
    "deviations, flag count at the 3-sigma-equivalent 3*1.4826*MAD "
    "threshold — the heavy-tail-safe sibling of z-scoring (and of "
    "winsorized_order_stats' clipping). Both medians round to 6dp "
    "before the threshold compare, the repo's cross-engine rank-"
    "interpolation discipline. Two map-side-combined passes over the "
    "fact table; the median/MAD relations are |groups| rows.",
)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    med = o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("med")
    )
    dev = o.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        "med",
        F.abs(F.col("o_totalprice") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(adev, 0.5)"), 6).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority", "med", "mad")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(
                F.when(
                    F.col("adev") > 3 * 1.4826 * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select(
            "o_orderpriority",
            "n",
            F.col("med").alias("median_price"),
            "mad",
            "n_outliers",
        )
    )


@register(
    "kaplan_meier_retention",
    """
    WITH u AS (SELECT user_id, event_type, min(ts) AS f, max(ts) AS l
               FROM events GROUP BY user_id, event_type),
    ends AS (SELECT max(ts) AS obs_end FROM events),
    lab AS (SELECT date_diff('day', f, l) AS day,
                   CASE WHEN l >= obs_end - INTERVAL 7 DAY
                        THEN 1 ELSE 0 END AS cens
            FROM u CROSS JOIN ends),
    byday AS (SELECT day, sum(1 - cens) AS d, sum(cens) AS c
              FROM lab GROUP BY day),
    n AS (SELECT count(*) AS total FROM lab),
    w AS (SELECT day, d, c,
                 total - coalesce(sum(d + c) OVER
                     (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING), 0) AS at_risk
          FROM byday CROSS JOIN n),
    s AS (SELECT day, d, c, at_risk,
                 CASE WHEN max(CASE WHEN d >= at_risk THEN 1 ELSE 0 END)
                          OVER (ORDER BY day) = 1
                      THEN 0.0
                      ELSE exp(sum(ln(greatest(
                               1.0 - CAST(d AS DOUBLE) / at_risk,
                               1e-300))) OVER (ORDER BY day)) END AS surv
          FROM w)
    SELECT CAST(day AS INTEGER) AS day,
           CAST(d AS BIGINT) AS n_churned,
           CAST(c AS BIGINT) AS n_censored,
           CAST(at_risk AS BIGINT) AS n_at_risk,
           round(surv, 6) AS survival
    FROM s
    """,
    doc="Kaplan-Meier survival estimate of engagement lifetime per "
    "(user, event_type) subject: duration = days between the subject's "
    "first and last event, right-censored when "
    "the last event falls inside the final 7 days of observation "
    "(the user may still be active); S(t) = prod over churn days <= t "
    "of (1 - d_t/n_t) with censored-at-t users still at risk at t — "
    "the product-limit estimator survival/churn analyses report. "
    "Events collapse to one row per user, then to one row per "
    "DISTINCT DURATION DAY, so the cumulative windows run over a "
    "relation bounded by the observation span in days (metadata-"
    "sized carry-in, the repo's documented global-window exception), "
    "never over users or events. S is exp(sum(ln ...)) in exact IEEE "
    "order (ascending day), identical on both engines; the at-risk "
    "exhaustion edge (d = n) pins survival to an exact 0.",
)
def kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    u = ev.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("f"), F.max("ts").alias("l")
    )
    ends = ev.agg(F.max("ts").alias("obs_end"))
    lab = u.crossJoin(F.broadcast(ends)).select(
        F.datediff("l", "f").alias("day"),
        F.when(
            F.col("l") >= F.col("obs_end") - F.expr("INTERVAL 7 DAYS"), 1
        )
        .otherwise(0)
        .alias("cens"),
    )
    byday = lab.groupBy("day").agg(
        F.sum(1 - F.col("cens")).alias("d"), F.sum("cens").alias("c")
    )
    n = lab.agg(F.count("*").alias("total"))
    w_prev = W.orderBy("day").rowsBetween(W.unboundedPreceding, -1)
    w_cum = W.orderBy("day")
    at_risk = F.col("total") - F.coalesce(
        F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)
    )
    staged = byday.crossJoin(F.broadcast(n)).withColumn("at_risk", at_risk)
    exhausted = (
        F.max((F.col("d") >= F.col("at_risk")).cast("int")).over(w_cum) == 1
    )
    surv = F.when(exhausted, F.lit(0.0)).otherwise(
        F.exp(
            F.sum(
                F.log(
                    F.greatest(
                        1.0 - F.col("d").cast("double") / F.col("at_risk"),
                        F.lit(1e-300),
                    )
                )
            ).over(w_cum)
        )
    )
    return staged.select(
        F.col("day").cast("int").alias("day"),
        F.col("d").cast("long").alias("n_churned"),
        F.col("c").cast("long").alias("n_censored"),
        F.col("at_risk").cast("long").alias("n_at_risk"),
        F.round(surv, 6).alias("survival"),
    )


@register(
    "chi_squared_independence",
    """
    WITH obs AS (SELECT o_orderpriority AS p, o_orderstatus AS s,
                        count(*) AS c
                 FROM orders GROUP BY 1, 2),
    rm AS (SELECT p, sum(c) AS rc FROM obs GROUP BY p),
    cm AS (SELECT s, sum(c) AS cc FROM obs GROUP BY s),
    n AS (SELECT sum(c) AS tot FROM obs),
    grid AS (SELECT rm.p, cm.s, rm.rc, cm.cc FROM rm CROSS JOIN cm),
    terms AS (SELECT g.p, g.s,
                     coalesce(o.c, 0) AS oc,
                     g.rc * g.cc / CAST(tot AS DOUBLE) AS ec
              FROM grid g
              LEFT JOIN obs o ON o.p = g.p AND o.s = g.s
              CROSS JOIN n),
    agg AS (SELECT sum((oc - ec) * (oc - ec) / ec) AS chi2,
                   count(DISTINCT p) AS nr, count(DISTINCT s) AS nc
            FROM terms)
    SELECT CAST(tot AS BIGINT) AS n,
           CAST((nr - 1) * (nc - 1) AS INTEGER) AS dof,
           round(chi2, 4) AS chi2,
           round(CASE WHEN least(nr - 1, nc - 1) = 0 THEN 0.0
                      ELSE sqrt(chi2 / (tot * least(nr - 1, nc - 1))) END, 6)
               AS cramers_v
    FROM agg CROSS JOIN n
    """,
    doc="Chi-squared test of independence between order priority and "
    "order status (expected counts from the marginals), with Cramer's "
    "V effect size — the categorical-association screen next to the "
    "Benford goodness-of-fit audit. One scan collapses to the R x C "
    "contingency table; marginals, the dense grid (absent cells still "
    "contribute expectation), and the final sums are all "
    "metadata-sized. chi2 rounds to 4 (the benford_audit discipline: "
    "a ~15-term double sum is order-stable far beyond 1e-4).",
)
def chi_squared_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    obs = o.groupBy(
        F.col("o_orderpriority").alias("p"), F.col("o_orderstatus").alias("s")
    ).agg(F.count("*").alias("c"))
    rm = obs.groupBy("p").agg(F.sum("c").alias("rc"))
    cm = obs.groupBy("s").agg(F.sum("c").alias("cc"))
    n = obs.agg(F.sum("c").alias("tot"))
    grid = rm.crossJoin(F.broadcast(cm))
    terms = (
        grid.join(obs, ["p", "s"], "left")
        .crossJoin(F.broadcast(n))
        .select(
            F.coalesce("c", F.lit(0)).alias("oc"),
            (F.col("rc") * F.col("cc") / F.col("tot").cast("double")).alias("ec"),
        )
    )
    agg = terms.agg(
        F.sum((F.col("oc") - F.col("ec")) ** 2 / F.col("ec")).alias("chi2")
    )
    shape = obs.agg(
        F.countDistinct("p").alias("nr"), F.countDistinct("s").alias("nc")
    )
    return (
        agg.crossJoin(F.broadcast(shape))
        .crossJoin(F.broadcast(n))
        .select(
            F.col("tot").cast("long").alias("n"),
            ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("int").alias("dof"),
            F.round("chi2", 4).alias("chi2"),
            F.round(
                F.when(
                    F.least(F.col("nr") - 1, F.col("nc") - 1) == 0, F.lit(0.0)
                ).otherwise(
                    F.sqrt(
                        F.col("chi2")
                        / (
                            F.col("tot")
                            * F.least(F.col("nr") - 1, F.col("nc") - 1)
                        )
                    )
                ),
                6,
            ).alias("cramers_v"),
        )
    )


@register(
    "welch_ttest_sources",
    """
    WITH s AS (SELECT source,
                      CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(n_chars) AS BIGINT) AS sx,
                      CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
               FROM documents GROUP BY source),
    m AS (SELECT source, n, sx / CAST(n AS DOUBLE) AS mean,
                 (sxx - sx * (sx / CAST(n AS DOUBLE))) / (n - 1) AS var
          FROM s WHERE n >= 2),
    p AS (SELECT a.source AS source_a, b.source AS source_b,
                 a.n AS n_a, b.n AS n_b,
                 a.mean - b.mean AS mean_diff,
                 a.var / a.n + b.var / b.n AS se2,
                 a.var / a.n AS va, b.var / b.n AS vb
          FROM m a JOIN m b ON a.source < b.source)
    SELECT source_a, source_b, n_a, n_b,
           round(mean_diff, 6) AS mean_diff,
           round(mean_diff / sqrt(se2), 6) AS t_stat,
           round(se2 * se2 / (va * va / (n_a - 1) + vb * vb / (n_b - 1)), 6)
               AS welch_df
    FROM p
    """,
    doc="Welch's unequal-variance t-test of mean document length "
    "between every source pair, with the Welch-Satterthwaite degrees "
    "of freedom — the inferential companion to source_length_ks "
    "(KS asks 'same distribution?', Welch asks 'same mean, and how "
    "confidently?'). Engine determinism by construction: per-source "
    "moments come from INTEGER sums (sum(x), sum(x^2) as BIGINT — "
    "exact at any aggregation order, unlike float var_samp whose "
    "Welford vs naive rounding differs across engines), variance is "
    "the same explicit formula on both sides. One scan to a "
    "per-source row; the pair join is sources x sources — "
    "metadata-sized.",
)
def welch_ttest_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("n_chars").cast("long").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("sxx"),
    )
    m = s.filter(F.col("n") >= 2).select(
        "source",
        "n",
        (F.col("sx") / F.col("n").cast("double")).alias("mean"),
        (
            (F.col("sxx") - F.col("sx") * (F.col("sx") / F.col("n").cast("double")))
            / (F.col("n") - 1)
        ).alias("var"),
    )
    a = m.select(*[F.col(c).alias(f"a_{c}") for c in m.columns])
    b = m.select(*[F.col(c).alias(f"b_{c}") for c in m.columns])
    p = a.join(F.broadcast(b), F.col("a_source") < F.col("b_source")).select(
        F.col("a_source").alias("source_a"),
        F.col("b_source").alias("source_b"),
        F.col("a_n").alias("n_a"),
        F.col("b_n").alias("n_b"),
        (F.col("a_mean") - F.col("b_mean")).alias("mean_diff"),
        (F.col("a_var") / F.col("a_n") + F.col("b_var") / F.col("b_n")).alias("se2"),
        (F.col("a_var") / F.col("a_n")).alias("va"),
        (F.col("b_var") / F.col("b_n")).alias("vb"),
    )
    return p.select(
        "source_a",
        "source_b",
        "n_a",
        "n_b",
        F.round("mean_diff", 6).alias("mean_diff"),
        F.round(F.col("mean_diff") / F.sqrt("se2"), 6).alias("t_stat"),
        F.round(
            F.col("se2") * F.col("se2")
            / (
                F.col("va") * F.col("va") / (F.col("n_a") - 1)
                + F.col("vb") * F.col("vb") / (F.col("n_b") - 1)
            ),
            6,
        ).alias("welch_df"),
    )


@register(
    "gini_revenue_concentration",
    """
    WITH cr AS (SELECT o_orderpriority AS priority, o_custkey,
                       CAST(round(sum(o_totalprice) * 100) AS BIGINT)
                           AS rev_cents
                FROM orders GROUP BY 1, 2),
    ranked AS (SELECT priority, rev_cents,
                      row_number() OVER (PARTITION BY priority
                                         ORDER BY rev_cents, o_custkey) AS i
               FROM cr),
    g AS (SELECT priority,
                 CAST(count(*) AS BIGINT) AS n_customers,
                 CAST(sum(rev_cents) AS BIGINT) AS tot,
                 CAST(sum(i * rev_cents) AS BIGINT) AS wsum
          FROM ranked GROUP BY priority)
    SELECT priority, n_customers,
           round(tot / 100.0, 2) AS total_revenue,
           round(2.0 * wsum / (n_customers * CAST(tot AS DOUBLE))
                 - (n_customers + 1.0) / n_customers, 6) AS gini
    FROM g
    """,
    doc="Gini coefficient of revenue concentration across customers, "
    "per order priority — the Lorenz-curve inequality statistic "
    "(how much of the revenue the top customers own), the audit-side "
    "companion to key_skew_profile. Revenue quantizes to integer "
    "cents BEFORE the rank-weighted sum, so every aggregate is an "
    "exact integer at any aggregation order and the final G is one "
    "deterministic IEEE expression. Ranking window is keyed by "
    "priority (never global), ties pinned by custkey.",
)
def gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cr = o.groupBy(
        F.col("o_orderpriority").alias("priority"), "o_custkey"
    ).agg(
        F.round(F.sum("o_totalprice") * 100).cast("long").alias("rev_cents")
    )
    w = W.partitionBy("priority").orderBy("rev_cents", "o_custkey")
    ranked = cr.select(
        "priority", "rev_cents", F.row_number().over(w).alias("i")
    )
    g = ranked.groupBy("priority").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("rev_cents").cast("long").alias("tot"),
        F.sum(F.col("i") * F.col("rev_cents")).cast("long").alias("wsum"),
    )
    return g.select(
        "priority",
        "n_customers",
        F.round(F.col("tot") / 100.0, 2).alias("total_revenue"),
        F.round(
            2.0 * F.col("wsum") / (F.col("n_customers") * F.col("tot").cast("double"))
            - (F.col("n_customers") + 1.0) / F.col("n_customers"),
            6,
        ).alias("gini"),
    )


@register(
    "daily_autocorrelation",
    """
    WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
                          CAST(count(*) AS BIGINT) AS c
                   FROM orders GROUP BY 1),
    lagged AS (
        SELECT 1 AS lag, a.c AS x, b.c AS y
        FROM daily a JOIN daily b ON b.day = a.day + INTERVAL 1 DAY
        UNION ALL
        SELECT 7 AS lag, a.c AS x, b.c AS y
        FROM daily a JOIN daily b ON b.day = a.day + INTERVAL 7 DAY),
    s AS (SELECT lag, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy
          FROM lagged GROUP BY lag)
    SELECT lag, n AS n_pairs,
           round((n * sxy - sx * sy)
                 / sqrt(CAST((n * sxx - sx * sx) AS DOUBLE)
                        * (n * syy - sy * sy)), 6) AS autocorr
    FROM s
    """,
    doc="Autocorrelation of the daily order-count series at lag 1 and "
    "lag 7 (the day-over-day persistence and weekly-seasonality "
    "probes a forecasting pipeline starts from). Lag pairing is an "
    "equi-join on day+interval (missing days drop their pairs — no "
    "imputation), and the Pearson moments accumulate as EXACT BIGINT "
    "sums of integer counts, so the statistic is "
    "aggregation-order-deterministic; one final double expression. "
    "The daily rollup is map-side-combined; everything after it is "
    "metadata-sized.",
)
def daily_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count("*").cast("long").alias("c")
    )
    outs = []
    for lag in (1, 7):
        a = daily.select(F.col("day").alias("d"), F.col("c").alias("x"))
        b = daily.select(
            F.col("day").alias("d2"), F.col("c").alias("y")
        )
        pairs = a.join(b, F.col("d2") == F.date_add(F.col("d"), lag)).select(
            F.lit(lag).alias("lag"), "x", "y"
        )
        outs.append(pairs)
    lagged = outs[0].unionByName(outs[1])
    s = lagged.groupBy("lag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    return s.select(
        "lag",
        F.col("n").alias("n_pairs"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                    "double"
                )
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("autocorr"),
    )


@register(
    "rfm_segments",
    """
    WITH cust AS (
        SELECT o_custkey,
               CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                   AS d, o_totalprice AS p
        FROM orders),
    c AS (SELECT o_custkey,
                 CAST(max(d) AS BIGINT) AS rec,
                 CAST(count(*) AS BIGINT) AS freq,
                 CAST(round(sum(p) * 100) AS BIGINT) AS mon
          FROM cust GROUP BY 1),
    b AS (SELECT quantile_cont(rec, [0.2, 0.4, 0.6, 0.8]) AS br,
                 quantile_cont(freq, [0.2, 0.4, 0.6, 0.8]) AS bf,
                 quantile_cont(mon, [0.2, 0.4, 0.6, 0.8]) AS bm
          FROM c),
    scored AS (
        SELECT o_custkey, mon,
               1 + (CASE WHEN rec > round(br[1], 6) THEN 1 ELSE 0 END)
                 + (CASE WHEN rec > round(br[2], 6) THEN 1 ELSE 0 END)
                 + (CASE WHEN rec > round(br[3], 6) THEN 1 ELSE 0 END)
                 + (CASE WHEN rec > round(br[4], 6) THEN 1 ELSE 0 END) AS r,
               1 + (CASE WHEN freq > round(bf[1], 6) THEN 1 ELSE 0 END)
                 + (CASE WHEN freq > round(bf[2], 6) THEN 1 ELSE 0 END)
                 + (CASE WHEN freq > round(bf[3], 6) THEN 1 ELSE 0 END)
                 + (CASE WHEN freq > round(bf[4], 6) THEN 1 ELSE 0 END) AS f,
               1 + (CASE WHEN mon > round(bm[1], 6) THEN 1 ELSE 0 END)
                 + (CASE WHEN mon > round(bm[2], 6) THEN 1 ELSE 0 END)
                 + (CASE WHEN mon > round(bm[3], 6) THEN 1 ELSE 0 END)
                 + (CASE WHEN mon > round(bm[4], 6) THEN 1 ELSE 0 END) AS m
        FROM c CROSS JOIN b)
    SELECT CAST(r * 100 + f * 10 + m AS INTEGER) AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           -- exact HALF_UP average in integer cents, then one exact
           -- /100.0: (2*sum + n) // (2*n) is round-half-up(sum/n) for
           -- positive operands — no float division anywhere, so both
           -- engines see bit-identical doubles even at .xx5 boundaries
           CAST((2 * sum(mon) + count(*)) // (2 * count(*)) AS BIGINT)
               / 100.0 AS avg_monetary
    FROM scored GROUP BY 1
    """,
    doc="RFM customer segmentation (recency / frequency / monetary "
    "quintiles -> 125 segments) the SCALE-SAFE way: quintile "
    "BOUNDARIES come from one global interpolated-percentile "
    "aggregate (a 3x4-value broadcast), and each customer scores by "
    "comparing against the rounded boundaries — no ntile, no global "
    "window over customers. Recency is integer epoch-days, monetary "
    "integer cents, so every input to the strict-> comparisons is "
    "exact; boundaries round to 6 on both engines before comparing "
    "(an integer can only straddle a rounded boundary if they differ "
    "by >= 1e-6's neighborhood — interpolation noise is 1e-10). "
    "avg_monetary stays exact to the last step: half-up rounding of "
    "the cent average is done with the integer identity "
    "(2*sum + n) div (2*n), then one /100.0 — a float division of "
    "exact integers that is bit-identical on both engines (the r9 "
    "driver red was Spark/DuckDB disagreeing on a .885 boundary when "
    "the rounding input was itself a float quotient).",
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(
        F.max(F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01")))
        .cast("long")
        .alias("rec"),
        F.count("*").cast("long").alias("freq"),
        F.round(F.sum("o_totalprice") * 100).cast("long").alias("mon"),
    )
    qs = F.array(*[F.lit(x) for x in (0.2, 0.4, 0.6, 0.8)])
    b = c.agg(
        F.percentile("rec", qs).alias("br"),
        F.percentile("freq", qs).alias("bf"),
        F.percentile("mon", qs).alias("bm"),
    )

    def score(col, bounds):
        expr = F.lit(1)
        for i in range(1, 5):
            expr = expr + F.when(
                F.col(col) > F.round(F.element_at(bounds, i), 6), 1
            ).otherwise(0)
        return expr

    scored = c.crossJoin(F.broadcast(b)).select(
        "o_custkey",
        "mon",
        score("rec", F.col("br")).alias("r"),
        score("freq", F.col("bf")).alias("f"),
        score("mon", F.col("bm")).alias("m"),
    )
    return scored.groupBy(
        (F.col("r") * 100 + F.col("f") * 10 + F.col("m"))
        .cast("int")
        .alias("segment")
    ).agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("mon").cast("long").alias("_sum_mon"),
    ).select(
        "segment",
        "n_customers",
        # round-half-up(sum/n) in pure integer arithmetic (positive
        # operands), then a single exact /100.0 — see oracle comment
        (
            F.expr(
                "(2 * _sum_mon + n_customers) div (2 * n_customers)"
            ).cast("long")
            / F.lit(100.0)
        ).alias("avg_monetary"),
    )


from .registry import QUERY_REGISTRY as _REGA  # noqa: E402  (composes
# the token_heavy_hitters oracle registered above)

_CMS_WIDTH = 8192
_CMS_HASH_ROWS = "(VALUES (0, 1), (1, 9), (2, 17), (3, 25)) AS h(r, off)"
_CMS_BUCKET = (
    f"CAST(CAST(concat('0x', substring(md5(token), off, 8)) AS UBIGINT)"
    f" % {_CMS_WIDTH} AS BIGINT)"
)


@register(
    "cms_token_error",
    f"""
    WITH toks AS (
        SELECT unnest(regexp_split_to_array(
                   regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'),
                   '\\s+')) AS token
        FROM documents
        WHERE length(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g')) > 0),
    cells AS (
        SELECT r, {_CMS_BUCKET} AS bucket, CAST(count(*) AS BIGINT) AS c
        FROM toks, {_CMS_HASH_ROWS}
        GROUP BY 1, 2),
    hh AS ({{hh}}),
    keys AS (
        SELECT token, r, {_CMS_BUCKET} AS bucket
        FROM hh, {_CMS_HASH_ROWS}),
    est AS (
        -- LEFT + coalesce(0): sparse cell relation, empty cells must
        -- count as 0 in the min (twin of cms_estimate's left join;
        -- identical here since heavy hitters never hit empty cells)
        SELECT token, CAST(min(coalesce(c, 0)) AS BIGINT) AS cms_est
        FROM keys LEFT JOIN cells USING (r, bucket)
        GROUP BY token)
    SELECT h.token, h.freq, e.cms_est,
           CAST(e.cms_est - h.freq AS BIGINT) AS overcount
    FROM hh h JOIN est e USING (token)
    """.format(hh=_REGA["token_heavy_hitters"].oracle),
    doc="Count-min sketch self-calibration (Cormode & Muthukrishnan "
    "2005): sketch the whole token stream into a FIXED 4x8192-cell "
    "relation (operators/frequency.py::cms_cells — per-token cell "
    "keys are in-row md5-slice expressions, the groupBy partial-"
    "aggregates map-side, so the only exchange carries at most "
    "4*width cells per input partition regardless of vocabulary "
    "size), then point-query every exact heavy hitter and report "
    "est - true, the sketch's one-sided error ON THIS CORPUS. The "
    "sketch relation is mergeable by summing cells — the incremental"
    "/streaming twin of exact counting, and the calibration answer "
    "to 'what width does this corpus need'. Same self-diagnostic "
    "shape as minhash_estimate_error. Oracle replays the identical "
    "md5-slice buckets cross-engine (hash recipe of corpus.py::"
    "hash_bucket); all-integer arithmetic, no float parity risk.",
)
def cms_token_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens
    from ..operators.frequency import cms_cells, cms_estimate
    from ..session import repartition_for_compute

    d = _t(spark, sf_dir, "documents")
    toks = repartition_for_compute(d).select(
        F.explode(tokens(F.lower(F.col("text")))).alias("token")
    )
    cells = cms_cells(toks, "token", width=_CMS_WIDTH)
    hh = token_heavy_hitters(d, "text", min_freq=200)
    est = cms_estimate(cells, hh.select("token"), "token", width=_CMS_WIDTH)
    return hh.join(est, "token").select(
        "token",
        F.col("freq").cast("long").alias("freq"),
        "cms_est",
        (F.col("cms_est") - F.col("freq")).cast("long").alias("overcount"),
    )
