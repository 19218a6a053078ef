"""Relational query library — SURVEY.md §2.2–2.7 operators re-expressed
over the driver's TPC-H-ish tables so a DuckDB oracle can verify them.

Each query mirrors a concrete reference construct (citation in the
docstring is ``path:line`` into ``/root/reference``) but is written
Spark-first: declarative DataFrame plans that Catalyst compiles to
pushed-down scans, broadcast/SMJ joins and whole-stage codegen.

Scale notes (100 TB design intent), applied throughout:
- aggregations are expressed as single groupBy.agg so partial
  (map-side) aggregation happens before the shuffle;
- dimension joins (region/nation/customer/supplier) are broadcast;
- pre-aggregate-then-join shapes from the reference SQL are preserved
  (they bound the shuffle to one row per group, not per fact row);
- windows partition on high-cardinality keys (orderkey / custkey) so
  no single partition exceeds executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .registry import register
from .tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Memoized per (session, path); NTZ→TIMESTAMP normalization and the
    # rationale live in plans/tables.py.
    return load_table(spark, sf_dir, name, normalize_ntz=True)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table loader.

    Driver testdata has shipped ``ts`` both as TIMESTAMP(NANOS) (which
    Spark's vectorized reader rejects — read nanos as long, convert)
    and as TIMESTAMP(MICROS, isAdjustedToUTC=false) (NTZ — re-tagged in
    ``_t``); this keeps every variant converging on one micros
    TIMESTAMP column.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = _t(spark, sf_dir, "events")
    if dict(df.dtypes).get("ts") == "bigint":
        # integer division: `/` would round-trip through double and lose
        # sub-microsecond-exactness above 2^53 ns (~1970+104 days)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df

# Float-parity policy (Spark vs DuckDB oracle):
# - row-level expressions (ratios, arithmetic) are IEEE-deterministic on
#   identical inputs → emit UNROUNDED (round() tie-breaking differs
#   between engines on grid-valued data, e.g. x.xx5);
# - sums/avgs of continuous doubles accumulate in engine-specific order
#   → round(…, 2..4) to absorb last-ulp noise;
# - passthrough columns → never transformed.


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4)
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT)                                   AS n_rows,
           round(sum(l_quantity), 2)                                  AS sum_qty,
           round(sum(l_extendedprice), 2)                             AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)          AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                  AS avg_qty,
           round(avg(l_extendedprice), 4)                             AS avg_price,
           round(avg(l_discount), 4)                                  AS avg_disc
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: the reference's grouped-stats pattern "
    "(silver_case_summaries.sql:7-21, clustering/helpers.py:31-42) on lineitem.",
    bench=True,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "2001-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        )
    )


@register(
    "group_stats",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(count(*) AS BIGINT)                  AS n_orders,
           round(sum(o_totalprice), 2)               AS sum_price,
           round(avg(o_totalprice), 4)               AS avg_price,
           strftime(min(o_orderdate), '%Y-%m-%d')    AS first_order,
           strftime(max(o_orderdate), '%Y-%m-%d')    AS last_order
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    HAVING count(*) >= 1
    """,
    doc="A2/A3: COUNT DISTINCT + SUM/AVG/MIN/MAX + HAVING "
    "(silver_case_summaries.sql:7-21; clustering/helpers.py:31-42).",
)
def group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_order"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_order"),
        )
        .filter(F.col("n_orders") >= 1)
    )


@register(
    "conditional_counts",
    """
    SELECT o_orderstatus,
           CAST(count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT)  AS urgent_orders,
           CAST(count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS BIGINT)    AS high_orders,
           CAST(count(CASE WHEN o_orderpriority IN ('3-MEDIUM','4-NOT SPECIFIED') THEN 1 END) AS BIGINT) AS mid_orders,
           CAST(count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS BIGINT)     AS low_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="A4 conditional pivot counts (silver_case_summaries.sql:23-33).",
)
def conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    p = F.col("o_orderpriority")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.when(p == "1-URGENT", 1)).alias("urgent_orders"),
        F.count(F.when(p == "2-HIGH", 1)).alias("high_orders"),
        F.count(F.when(p.isin("3-MEDIUM", "4-NOT SPECIFIED"), 1)).alias("mid_orders"),
        F.count(F.when(p == "5-LOW", 1)).alias("low_orders"),
    )


# (column, numeric expr for Spark, numeric expr for the DuckDB oracle) —
# dates profile as epoch days, each engine's own spelling
_PROFILE_COLS = [
    ("o_orderkey", "CAST(o_orderkey AS DOUBLE)", "CAST(o_orderkey AS DOUBLE)"),
    ("o_custkey", "CAST(o_custkey AS DOUBLE)", "CAST(o_custkey AS DOUBLE)"),
    ("o_totalprice", "o_totalprice", "o_totalprice"),
    (
        "o_orderdate",
        "CAST(datediff(o_orderdate, DATE '1970-01-01') AS DOUBLE)",
        "CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS DOUBLE)",
    ),
    ("o_orderstatus", None, None),
    ("o_orderpriority", None, None),
]


@register(
    "table_profile",
    "\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS column_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           {f"CAST(min({duck}) AS DOUBLE)" if duck else "CAST(NULL AS DOUBLE)"} AS min_val,
           {f"CAST(max({duck}) AS DOUBLE)" if duck else "CAST(NULL AS DOUBLE)"} AS max_val
    FROM orders
    """
        for c, _num, duck in _PROFILE_COLS
    ),
    doc="Data-profiling pass (the ANALYZE/summary capability): per-column "
    "null count, exact distinct count, numeric/date min-max — ONE scan, "
    "long-form output. Exact multi-column distinct costs an Expand "
    "(row per profiled column); the 100 TB swap is hll_sketch_agg per "
    "column (tests/test_sketches.py pins that family), trading the "
    "Expand for fixed-size mergeable sketch state.",
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    aggs = [F.count("*").alias("n_rows")]
    stack_parts = []
    for c, num, _duck in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            (F.min(F.expr(num)) if num else F.lit(None).cast("double")).alias(f"mn_{c}"),
            (F.max(F.expr(num)) if num else F.lit(None).cast("double")).alias(f"mx_{c}"),
        ]
        stack_parts.append(
            f"'{c}', n_rows, CAST(n_rows - nn_{c} AS BIGINT), nd_{c}, mn_{c}, mx_{c}"
        )
    wide = o.agg(*aggs)
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {', '.join(stack_parts)}) AS "
            "(column_name, n_rows, n_nulls, n_distinct, min_val, max_val)"
        )
    )


@register(
    "priority_unpivot",
    """
    WITH wide AS (
        SELECT o_orderstatus,
               CAST(count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT)  AS urgent_orders,
               CAST(count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS BIGINT)    AS high_orders,
               CAST(count(CASE WHEN o_orderpriority IN ('3-MEDIUM','4-NOT SPECIFIED') THEN 1 END) AS BIGINT) AS mid_orders,
               CAST(count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS BIGINT)     AS low_orders
        FROM orders GROUP BY o_orderstatus)
    SELECT o_orderstatus, 'urgent_orders' AS priority_class, urgent_orders AS n_orders FROM wide
    UNION ALL
    SELECT o_orderstatus, 'high_orders', high_orders FROM wide
    UNION ALL
    SELECT o_orderstatus, 'mid_orders', mid_orders FROM wide
    UNION ALL
    SELECT o_orderstatus, 'low_orders', low_orders FROM wide
    """,
    doc="Native unpivot/melt (wide→long, the inverse of the A4 "
    "conditional pivot): Spark's unpivot is a zero-shuffle in-row "
    "Expand — the oracle states the same op as a 4-way UNION ALL.",
)
def priority_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = conditional_counts(spark, sf_dir)
    return wide.unpivot(
        ["o_orderstatus"],
        ["urgent_orders", "high_orders", "mid_orders", "low_orders"],
        "priority_class",
        "n_orders",
    )


@register(
    "percentiles_by_group",
    """
    SELECT c_mktsegment,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="A12 box-plot quartiles per group (visualization/helpers.py:253-268); "
    "exact interpolated percentile so the oracle matches. Rounded at 4 "
    "digits, not 2: at p in {.25,.5,.75} the interpolation fraction is a "
    "multiple of 0.25, so exact quartiles of 2-decimal prices land ON the "
    "1e-4 grid (tie-free), whereas 2-digit rounding hits exact .xx5 "
    "half-way ties that round differently across engines.",
)
def percentiles_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("p25"),
            F.round(F.expr("percentile(o_totalprice, 0.50)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.75)"), 4).alias("p75"),
        )
    )


@register(
    "rollup_revenue",
    """
    SELECT r_name, n_name,
           round(sum(c_acctbal), 2)  AS sum_acctbal,
           CAST(count(*) AS BIGINT)  AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="Beyond-reference rollup (SURVEY §2.4 'not present' row): hierarchical "
    "totals region→nation; dims broadcast, single shuffle on grouping sets.",
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
            F.count("*").alias("n_customers"),
        )
    )


@register(
    "approx_distinct",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_supps
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact distinct for the oracle; the scale path is approx_count_distinct "
    "(HLL sketch, no shuffle of distinct values) — see bench.py variant.",
)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_supps"),
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3) + medallion plan shapes (§3.2)
# ---------------------------------------------------------------------------


@register(
    "case_summaries",
    """
    WITH line_stats AS (
        SELECT l_orderkey,
               CAST(count(DISTINCT l_linenumber) AS BIGINT) AS total_lines,
               CAST(count(DISTINCT l_suppkey) AS BIGINT)    AS unique_suppliers,
               round(sum(l_quantity), 2)                    AS total_qty,
               round(sum(l_extendedprice), 2)               AS total_price,
               -- exact decimal average: discounts sit on a 1e-4 grid, so
               -- accumulate as scaled integers (order-independent)
               sum(CAST(round(l_discount * 10000) AS BIGINT)) / 10000.0 / count(*)
                   AS avg_discount
        FROM lineitem GROUP BY l_orderkey
    ),
    flag_breakdown AS (
        SELECT l_orderkey,
               CAST(count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS BIGINT) AS returned_lines,
               CAST(count(CASE WHEN l_returnflag = 'A' THEN 1 END) AS BIGINT) AS accepted_lines,
               CAST(count(CASE WHEN l_returnflag = 'N' THEN 1 END) AS BIGINT) AS neutral_lines
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice,
           ls.total_lines, ls.unique_suppliers, ls.total_qty, ls.total_price,
           ls.avg_discount,
           fb.returned_lines, fb.accepted_lines, fb.neutral_lines
    FROM orders o
    LEFT JOIN line_stats ls ON o.o_orderkey = ls.l_orderkey
    LEFT JOIN flag_breakdown fb ON o.o_orderkey = fb.l_orderkey
    """,
    doc="silver_case_summaries.sql:7-69 shape: pre-aggregate two stat CTEs then "
    "LEFT JOIN the dimension — keeps the join input at one row per group (J1/J2).",
    bench=True,
)
def case_summaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import repartition_for_compute

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    rf = F.col("l_returnflag")
    # keyed widening (r10): groups are ≤7 rows, so map-side collect_set
    # partials reduce almost nothing while their CPU serializes onto
    # the scan's few splits (3 at sf0.1 — the stage profile charged the
    # agg 1.1 s CPU on 3 tasks). An explicit repartition BY THE GROUP
    # KEY is still one shuffle (it satisfies the aggregate's
    # distribution) but runs the aggregation at session width; no-op at
    # 100 TB where the scan is already wide. Measured 1.22 → 0.80 s.
    li = repartition_for_compute(
        li.select(
            "l_orderkey",
            "l_linenumber",
            "l_suppkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_returnflag",
        ),
        by=["l_orderkey"],
    )
    # Two countDistincts over different columns would force an Expand
    # (doubling the shuffle input). Per-group cardinalities are tiny
    # (lines-per-order ≤ 7), so size(collect_set) computes the same
    # distinct counts in ONE pass with no Expand — ~40% faster, and the
    # saving grows with fact-table width at 100 TB.
    line_stats = li.groupBy("l_orderkey").agg(
        F.size(F.collect_set("l_linenumber")).cast("long").alias("total_lines"),
        F.size(F.collect_set("l_suppkey")).cast("long").alias("unique_suppliers"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        (
            F.sum(F.round(F.col("l_discount") * 10000).cast("long")) / 10000.0 / F.count("*")
        ).alias("avg_discount"),
        F.count(F.when(rf == "R", 1)).alias("returned_lines"),
        F.count(F.when(rf == "A", 1)).alias("accepted_lines"),
        F.count(F.when(rf == "N", 1)).alias("neutral_lines"),
    )
    # The reference declares two CTEs over the same scan; Spark-first we fuse
    # them into ONE aggregation (one scan, one shuffle) — same result columns.
    #
    # shuffle_hash, not sort-merge: both sides already exchange on the
    # order key, and SMJ would additionally SORT 150k+150k rows per
    # partition. The build side is the pre-aggregated stats (exactly one
    # bounded-width row per order), so per-partition build memory is
    # |orders| / shuffle.partitions — a knob that scales with the data.
    # Measured 3x faster at sf0.1.
    return o.join(
        line_stats.hint("shuffle_hash"), o.o_orderkey == line_stats.l_orderkey, "left"
    ).select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        "total_lines",
        "unique_suppliers",
        "total_qty",
        "total_price",
        "avg_discount",
        "returned_lines",
        "accepted_lines",
        "neutral_lines",
    )


@register(
    "speaker_analytics",
    """
    WITH supp_stats AS (
        SELECT l_suppkey, l_returnflag,
               CAST(count(*) AS BIGINT)       AS total_lines,
               round(sum(l_quantity), 2)      AS total_qty,
               round(sum(l_extendedprice), 2) AS total_value,
               -- exact HALF_UP 4dp average of cents-exact prices via
               -- the integer identity (2a + n) div (2n) — the
               -- rfm_segments discipline; round(avg(double), 4) hit a
               -- .xxxx5 summation-order boundary at sf0.1 (r10 sweep)
               CAST((2 * sum(CAST(round(l_extendedprice * 100) AS BIGINT)) * 100
                     + count(*)) // (2 * count(*)) AS BIGINT) / 10000.0
                   AS avg_line_value,
               CAST(min(l_linenumber) AS INTEGER) AS first_line,
               CAST(max(l_linenumber) AS INTEGER) AS last_line
        FROM lineitem
        WHERE l_suppkey IS NOT NULL
        GROUP BY l_suppkey, l_returnflag
    ),
    supp_dim AS (
        SELECT DISTINCT s_suppkey, s_name, s_nationkey FROM supplier
    )
    SELECT ss.l_suppkey, sd.s_name, sd.s_nationkey, ss.l_returnflag,
           ss.total_lines, ss.total_qty, ss.total_value, ss.avg_line_value,
           (ss.last_line - ss.first_line + 1) AS line_span,
           CASE WHEN ss.total_lines > 1
                THEN round(CAST(ss.last_line - ss.first_line AS DOUBLE) / (ss.total_lines - 1), 2)
                ELSE 0 END AS avg_line_gap,
           CASE WHEN ss.total_qty > 0
                THEN round(ss.total_value / ss.total_qty, 2)
                ELSE NULL END AS value_per_unit
    FROM supp_stats ss
    LEFT JOIN supp_dim sd ON ss.l_suppkey = sd.s_suppkey
    """,
    doc="gold_speaker_analytics.sql:12-69 ported: grouped stats, span/gap/ratio "
    "derivations with NULLIF-style guards, broadcast DISTINCT dimension (J3, A6, A7).",
    bench=True,
)
def speaker_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    ss = (
        li.filter(F.col("l_suppkey").isNotNull())
        .groupBy("l_suppkey", "l_returnflag")
        .agg(
            F.count("*").alias("total_lines"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_value"),
            # exact integer cents for the 4dp average (see oracle)
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "_spc"
            ),
            F.min("l_linenumber").alias("first_line"),
            F.max("l_linenumber").alias("last_line"),
        )
        .withColumn(
            "avg_line_value",
            F.expr("(2 * _spc * 100 + total_lines) div (2 * total_lines)").cast(
                "long"
            )
            / F.lit(10000.0),
        )
        .drop("_spc")
    )
    sd = s.select("s_suppkey", "s_name", "s_nationkey").distinct()
    joined = ss.join(F.broadcast(sd), ss.l_suppkey == sd.s_suppkey, "left")
    span = F.col("last_line") - F.col("first_line")
    return joined.select(
        "l_suppkey",
        "s_name",
        "s_nationkey",
        "l_returnflag",
        "total_lines",
        "total_qty",
        "total_value",
        "avg_line_value",
        (span + 1).alias("line_span"),
        F.when(
            F.col("total_lines") > 1,
            F.round(span.cast("double") / (F.col("total_lines") - 1), 2),
        )
        .otherwise(0.0)
        .alias("avg_line_gap"),
        F.when(
            F.col("total_qty") > 0, F.round(F.col("total_value") / F.col("total_qty"), 2)
        ).alias("value_per_unit"),
    )


@register(
    "order_analytics",
    """
    WITH cust_info AS (
        SELECT DISTINCT c_custkey, c_name, c_mktsegment
        FROM customer WHERE c_name IS NOT NULL
    ),
    order_metrics AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice AS total_price,
               CAST(count(*) AS BIGINT) AS n_lines,
               round(sum(l_quantity), 2) AS total_qty,
               CAST(count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS BIGINT) AS returned_lines
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderkey, o_custkey, o_orderstatus, o_totalprice
    )
    SELECT ci.c_custkey, ci.c_name, ci.c_mktsegment,
           om.o_orderkey, om.o_orderstatus, om.total_price, om.n_lines, om.total_qty,
           CAST(om.returned_lines AS DOUBLE) / NULLIF(om.n_lines, 0) * 100 AS returned_pct,
           om.total_price / NULLIF(om.total_qty, 0) AS price_per_unit
    FROM cust_info ci
    JOIN order_metrics om ON ci.c_custkey = om.o_custkey
    """,
    doc="gold_oral_arguments_analytics.sql:12-51 ported: DISTINCT dim INNER JOIN "
    "fact metrics + NULLIF participation ratios (J4, A7).",
)
def order_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    om = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("returned_lines"),
        )
        .withColumn("total_price", F.col("o_totalprice"))
    )
    ci = c.filter(F.col("c_name").isNotNull()).select("c_custkey", "c_name", "c_mktsegment").distinct()
    return (
        F.broadcast(ci)
        .join(om, ci.c_custkey == om.o_custkey)
        .select(
            "c_custkey",
            "c_name",
            "c_mktsegment",
            "o_orderkey",
            "o_orderstatus",
            "total_price",
            "n_lines",
            "total_qty",
            (
                F.col("returned_lines").cast("double")
                / F.nullif(F.col("n_lines"), F.lit(0))
                * 100
            ).alias("returned_pct"),
            (F.col("total_price") / F.nullif(F.col("total_qty"), F.lit(0))).alias(
                "price_per_unit"
            ),
        )
    )


@register(
    "anti_join_incremental",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="P11/P13/J5 incremental anti-join: 'new keys not yet processed' "
    "(processors.py:86-116, ingest/main.py:74-94) as left_anti.",
)
def anti_join_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(
        o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "semi_join_membership",
    """
    SELECT p_partkey, p_name, p_brand
    FROM part p
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45
    )
    """,
    doc="J6 membership lookup (visualization/helpers.py:165-186) as left_semi.",
)
def semi_join_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    keys = li.filter(F.col("l_quantity") > 45).select(F.col("l_partkey").alias("p_partkey"))
    return p.join(keys, "p_partkey", "left_semi").select("p_partkey", "p_name", "p_brand")


@register(
    "distinct_dim",
    """
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
    doc="A14 SELECT DISTINCT dedup dimension (gold_speaker_analytics.sql:31-37).",
)
def distinct_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@register(
    "star_join_revenue",
    """
    SELECT r_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY r_name, n_name
    """,
    doc="TPC-H Q5-ish star join: fact-fact shuffle join on orderkey, then "
    "broadcast snowflake dims; filter pushed below the join.",
    bench=True,
)
def star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # revenue pre-projects BEFORE the fact-fact join: one double (not
    # two) rides the orderkey shuffle and the three broadcast joins,
    # and the multiply runs in the scan stage — measured ~36% faster at
    # the x10 tier (1.13 s → 0.73 s; the live formulation A/B is
    # regenerated into SCALING.md each audit run). The deeper rewrite
    # (pre-aggregate by orderkey before the join) measured NO win there
    # (1.13 s) and was rejected besides: re-grouping the double sum
    # changes float summation order enough to flip the 2dp-rounded
    # total at rounding boundaries (5 groups flipped at x10) — an
    # oracle-parity hazard.
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum("rev"), 2).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Windows / ranking / ordering (SURVEY §2.6)
# ---------------------------------------------------------------------------


@register(
    "running_offsets",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(sum(CAST(l_quantity AS BIGINT))
                    OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS BIGINT) AS qty_offset,
           CAST(row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) - 1
                AS BIGINT) AS line_index
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    """,
    doc="P6 running char offsets + P7 global utterance index "
    "(helpers.py:132-176): cumulative sum over preceding rows and dense "
    "0-based row_number per partition key.",
)
def running_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("bigint"))
        .over(w.rowsBetween(W.unboundedPreceding, -1))
        .alias("qty_offset"),
        (F.row_number().over(w) - 1).cast("bigint").alias("line_index"),
    )


@register(
    "topk_per_group",
    """
    SELECT * FROM (
        SELECT o_custkey, o_orderkey,
               round(o_totalprice, 2) AS total_price,
               CAST(row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice DESC, o_orderkey)
                    AS BIGINT) AS rnk
        FROM orders
    ) WHERE rnk <= 3
    """,
    doc="W1/W2 top-k per group (clustering/helpers.py:177-226): deterministic "
    "tie-break on orderkey; at scale AQE handles per-key skew, and rank "
    "pushdown (WindowGroupLimit) keeps only k rows per key before the sort.",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            F.row_number().over(w).cast("bigint").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@register(
    "ordered_topn",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total_price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="W3/W5 global order + limit (gold_speaker_analytics.sql:69): Spark "
    "executes as TakeOrderedAndProject — no full sort materialization.",
)
def ordered_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total_price"))
        .orderBy(F.desc("total_price"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "lag_lead_deltas",
    """
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           CAST(floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) AS BIGINT) AS secs_since_prev,
           value - lag(value) OVER w AS value_delta
    FROM events
    WHERE user_id % 25 = 0
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Beyond-reference lag/lead (SURVEY §2.6 'not present' row): "
    "inter-event deltas per user, the building block for sessionization.",
)
def lag_lead_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).filter(F.col("user_id") % 25 == 0)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return e.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)).cast("bigint").alias(
            "secs_since_prev"
        ),
        (F.col("value") - F.lag("value").over(w)).alias("value_delta"),
    )


# ---------------------------------------------------------------------------
# Scalar function library (SURVEY §2.7)
# ---------------------------------------------------------------------------


@register(
    "string_scalars",
    """
    SELECT p_partkey,
           split_part(p_name, ' ', 1)                         AS first_word,
           upper(p_type)                                      AS type_upper,
           CAST(length(p_name) AS INTEGER)                    AS name_len,
           replace(p_brand, '#', '_')                         AS brand_key,
           concat_ws('_', p_brand, p_type)                    AS brand_type,
           CASE WHEN upper(p_name) LIKE '%RED%' THEN 'warm'
                WHEN upper(p_name) LIKE '%BLUE%' THEN 'cool'
                ELSE 'other' END                              AS color_class,
           coalesce(nullif(p_size, 0), -1)                    AS size_or_default,
           p_retailprice / nullif(p_size, 0)                  AS price_per_size,
           regexp_extract(p_brand, '([0-9]+)', 1)             AS brand_num,
           substr(p_name, 1, 5)                               AS name_prefix,
           CAST(strpos(p_name, ' ') AS INTEGER)               AS space_pos
    FROM part
    """,
    doc="§2.7 scalar library: split_part, ILIKE-style classification "
    "(bronze_oa_text.sql:34-39), replace/concat (clustering/helpers.py:24-45), "
    "NULLIF guards, regexp extraction (macros/get_term_year.sql).",
)
def string_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    up = F.upper("p_name")
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.upper("p_type").alias("type_upper"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_brand"), F.lit("#"), F.lit("_")).alias("brand_key"),
        F.concat_ws("_", "p_brand", "p_type").alias("brand_type"),
        F.when(up.like("%RED%"), "warm")
        .when(up.like("%BLUE%"), "cool")
        .otherwise("other")
        .alias("color_class"),
        F.coalesce(F.nullif("p_size", F.lit(0)), F.lit(-1)).alias("size_or_default"),
        (F.col("p_retailprice") / F.nullif("p_size", F.lit(0))).alias("price_per_size"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.instr(F.col("p_name"), " ").alias("space_pos"),
    )


@register(
    "date_scalars",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)            AS order_year,
           CAST(month(o_orderdate) AS INTEGER)           AS order_month,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER)   AS order_dow,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')    AS due_date,
           CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER)
               AS days_since_epoch_start
    FROM orders
    WHERE o_orderkey % 20 = 0
    """,
    doc="§2.7 date/time library (ingest/main.py:105-108 strftime, "
    "get_term_year.sql year extraction): year/month/dow/trunc/interval/diff. "
    "DuckDB dayofweek is 0-based Sunday; Spark dayofweek is 1-based Sunday.",
)
def date_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"
        ).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).alias(
            "days_since_epoch_start"
        ),
    )


@register(
    "json_scalars",
    """
    SELECT event_id, event_type,
           CAST(json_extract(props, '$.k') AS INTEGER) AS prop_k,
           CASE WHEN CAST(json_extract(props, '$.k') AS INTEGER) >= 50
                THEN 'high' ELSE 'low' END AS k_band
    FROM events
    WHERE event_id % 10 = 0
    """,
    doc="§2.7 JSON access (schema.sql JSONB columns; get_json_object analog): "
    "typed extraction from a JSON string column.",
)
def json_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).filter(F.col("event_id") % 10 == 0)
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id",
        "event_type",
        k.alias("prop_k"),
        F.when(k >= 50, "high").otherwise("low").alias("k_band"),
    )


@register(
    "variant_props_agg",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS min_k,
           CAST(max(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k,
           CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)  AS sum_k
    FROM events
    GROUP BY event_type
    """,
    doc="Semi-structured JSONB columns via Spark 4 VARIANT (§1.1 "
    "speaker_list/raw_json/metadata JSONB → parse_json once, typed "
    "variant_get paths after): the binary variant encoding replaces "
    "re-parsing the JSON string at every access, which is the difference "
    "between one parse and N parses per row at 100 TB. Oracle uses plain "
    "JSON extraction — identical values.",
)
def variant_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").cast("long").alias("sum_k"),
        )
    )


@register(
    "partition_slice",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders ORDER BY o_orderkey
    LIMIT 500 OFFSET 1000
    """,
    doc="P12 skip/limit shard slice (processors.py:152-162 array-job "
    "sharding: ds.skip(start).limit(n)): offset+limit over a sorted key "
    "— Spark ≥3.4 native offset; at scale sharding is done by partition "
    "pruning instead, but the operator parity is exact.",
)
def partition_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey")
        .offset(1000)
        .limit(500)
    )


@register(
    "cube_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="Beyond-reference grouping-sets family (SURVEY §2.4 'not present' "
    "row): CUBE over (returnflag, linestatus) — Catalyst Expand feeds one "
    "hash aggregation, map-side partials intact (rollup_revenue covers "
    "ROLLUP).",
)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
    )


@register(
    "grouping_sets_revenue",
    """
    SELECT coalesce(o_orderstatus, 'ALL')   AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(count(*) AS BIGINT)         AS n_orders,
           round(sum(o_totalprice), 2)      AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
    doc="Explicit GROUPING SETS (the general form — rollup_revenue and "
    "cube_revenue cover the shorthands): one Expand feeding one hash "
    "aggregation, map-side partials intact. Keys are never NULL in the "
    "data, so coalesce labels the rollup levels unambiguously.",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    ).select(
        F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
        F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
        "n_orders",
        "revenue",
    )


@register(
    "above_customer_avg",
    """
    WITH ca AS (SELECT o_custkey, round(avg(o_totalprice), 6) AS cust_avg
                FROM orders GROUP BY o_custkey)
    SELECT o_orderkey, o.o_custkey, o_totalprice, cust_avg
    FROM orders o JOIN ca USING (o_custkey)
    WHERE o_totalprice > cust_avg
    """,
    doc="Correlated-subquery shape (orders above their customer's average), "
    "decorrelated Spark-first into ONE window pass over the orders scan — "
    "no second scan, no self-join; the oracle keeps the textbook correlated "
    "formulation. The average is rounded identically on both sides before "
    "the comparison so engine-specific summation order cannot flip rows at "
    "the boundary.",
)
def above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey")
    return (
        o.withColumn("cust_avg", F.round(F.avg("o_totalprice").over(w), 6))
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "cust_avg")
    )


@register(
    "skew_salted_agg",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT)       AS n_rows,
           round(sum(l_quantity), 2)      AS sum_qty,
           min(l_shipdate)                AS first_ship,
           max(l_shipdate)                AS last_ship,
           round(sum(l_extendedprice), 4) / count(*) AS avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Skew-resistant two-phase aggregation (operators/skew.py): a "
    "3-key groupBy over the fact table — the pathological shape at "
    "100 TB — salted over 16 sub-keys then merged; algebraic partials "
    "make the result identical to the plain groupBy the oracle runs.",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_agg

    li = _t(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        ["l_returnflag"],
        [
            ("*", "count", "n_rows"),
            ("l_quantity", "sum", "sum_qty"),
            ("l_shipdate", "min", "first_ship"),
            ("l_shipdate", "max", "last_ship"),
            ("l_extendedprice", "avg", "avg_price"),
        ],
        n_salts=16,
    )
    # round the continuous sums AFTER the merge (float-parity policy);
    # avg re-derives from the rounded sum so the oracle can reproduce it
    return out.select(
        "l_returnflag",
        "n_rows",
        F.round("sum_qty", 2).alias("sum_qty"),
        "first_ship",
        "last_ship",
        (F.round(F.col("avg_price") * F.col("n_rows"), 4) / F.col("n_rows")).alias(
            "avg_price"
        ),
    )


@register(
    "bloom_semi_revenue",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_orderkey = lineitem.l_orderkey
          AND o.o_orderpriority = '1-URGENT'
    )
    GROUP BY l_returnflag
    """,
    doc="Semi join with an explicit bloom pre-filter: the dim key set is "
    "distilled to an array<long> bit set (one aggregation, never leaves the "
    "cluster), broadcast to the fact scan, and non-matching fact rows die "
    "before the exchange; the exact semi join settles false positives. "
    "Identical results to the plain semi join at any bloom size.",
    bench=True,
)
def bloom_semi_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bloom import bloom_semi_join

    li = _t(spark, sf_dir, "lineitem")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    kept = bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey")
    return kept.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
    )


@register(
    "semi_join_auto",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_orderkey = lineitem.l_orderkey
          AND o.o_orderpriority = '1-URGENT'
    )
    GROUP BY l_returnflag
    """,
    doc="Profile-gated membership filter (operators/bloom.py::"
    "auto_semi_join): choose_semi_strategy reads the dim's Catalyst "
    "size estimate — the same statistic Spark's broadcast decision "
    "uses — and picks plain broadcast semi (dim fits the broadcast "
    "budget; this is what it picks here and at sf0.1), bloom pre-"
    "filter (dim too big to broadcast), or bloom+salted settle (fact "
    "skewed on the key). Same semantics as bloom_semi_revenue at "
    "every size; only the plan shape changes.",
    bench=True,
)
def semi_join_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bloom import auto_semi_join

    li = _t(spark, sf_dir, "lineitem")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    kept = auto_semi_join(li, urgent, "l_orderkey", "o_orderkey")
    return kept.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
    )


@register(
    "incremental_mv_orders",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price,
           round(sum(o_totalprice) / count(o_totalprice), 4) AS avg_price,
           max(o_totalprice) AS max_price,
           min(o_orderdate) AS first_order
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
    doc="Incremental materialized-view maintenance: the orders table is "
    "processed as a base batch plus a later increment; each batch becomes "
    "algebraic partial state (sum/count/min/max per group) and the states "
    "MERGE without rescanning the base — the oracle is the full recompute, "
    "so the gate proves merge(partial(base), partial(delta)) == full.",
    bench=True,
)
def incremental_mv_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mv import mv_finalize, mv_merge, mv_partial

    o = _t(spark, sf_dir, "orders")
    specs = {
        "n_orders": ("count", "*"),
        "total_price": ("sum", "o_totalprice"),
        "avg_price": ("avg", "o_totalprice"),
        "max_price": ("max", "o_totalprice"),
        "first_order": ("min", "o_orderdate"),
    }
    keys = ["o_orderstatus", "o_orderpriority"]
    cutoff = "1997-01-01"
    base = o.filter(F.col("o_orderdate") < cutoff)
    delta = o.filter(F.col("o_orderdate") >= cutoff)
    state = mv_merge(
        keys, specs, mv_partial(base, keys, specs), mv_partial(delta, keys, specs)
    )
    out = mv_finalize(state, keys, specs, round_avg=4)
    return out.select(
        *keys,
        "n_orders",
        F.round("total_price", 2).alias("total_price"),
        "avg_price",
        "max_price",
        "first_order",
    )


@register(
    "rolling_7d_revenue",
    """
    SELECT o_orderkey, o_custkey,
           CAST(epoch(o_orderdate) AS BIGINT) AS ts_s,
           o_totalprice,
           round(sum(o_totalprice) OVER w, 2) AS rolling_7d_total,
           CAST(count(*) OVER w AS BIGINT) AS rolling_7d_orders
    FROM orders
    WINDOW w AS (
        PARTITION BY o_custkey
        ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
        RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
    """,
    doc="RANGE-frame window (time-based sliding aggregate): per customer, "
    "revenue and order count over the trailing 7 days including peers at "
    "the same timestamp — the frame the reference's row-offset windows "
    "cannot express (SURVEY §2.6 'not present' row).",
    bench=True,
)
def rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    o = _t(spark, sf_dir, "orders")
    ts = F.unix_timestamp("o_orderdate").alias("ts_s")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("ts_s"))
        .rangeBetween(-604800, 0)
    )
    return o.select("o_orderkey", "o_custkey", ts, "o_totalprice").select(
        "o_orderkey",
        "o_custkey",
        "ts_s",
        "o_totalprice",
        F.round(F.sum("o_totalprice").over(w), 2).alias("rolling_7d_total"),
        F.count("*").over(w).cast("long").alias("rolling_7d_orders"),
    )


@register(
    "pivot_status_by_priority",
    """
    SELECT o_orderpriority,
           CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_f,
           CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_o,
           CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS n_p,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS total_f,
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS total_o,
           round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS total_p
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="True pivot (groupBy().pivot() with explicit values — one pass, no "
    "per-value scans; values pinned so the schema is static and no "
    "distinct-values pre-query runs). A4's pivot alternative surfaced as "
    "its own operator.",
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )
    return p.select(
        "o_orderpriority",
        F.coalesce("F_n", F.lit(0)).cast("long").alias("n_f"),
        F.coalesce("O_n", F.lit(0)).cast("long").alias("n_o"),
        F.coalesce("P_n", F.lit(0)).cast("long").alias("n_p"),
        F.coalesce("F_total", F.lit(0.0)).alias("total_f"),
        F.coalesce("O_total", F.lit(0.0)).alias("total_o"),
        F.coalesce("P_total", F.lit(0.0)).alias("total_p"),
    )
