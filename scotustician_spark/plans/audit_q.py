"""Audit / mining queries: Pareto frontier, sweep-line concurrency,
snapshot reconciliation, Benford digit audit, co-purchase similarity
and triangle analytics.

Beyond-reference (SURVEY §2 "not present" rows): these are the
data-auditing and graph-mining asks a warehouse team runs over the
same tables — each one a distinct at-scale execution pattern:
dominance without the quadratic self-join (``operators/skyline.py``),
interval concurrency without a global-window sort
(``operators/sweep.py``), table diff shipping 8-byte fingerprints
instead of full rows (``operators/diff.py``), and triangle counting
with degree-ordered orientation (``operators/graph.py``). Oracles are
the naive formulations (NOT EXISTS dominance, global-window sweep,
full-width IS DISTINCT FROM compare, id-ordered triple join) —
identical results, incomparable scaling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.baskets import frequent_items, frequent_pairs
from ..operators.diff import snapshot_diff
from ..operators.graph import triangle_counts
from ..operators.skyline import skyline_2d
from ..operators.sweep import interval_concurrency
from .registry import register
from .relational import _events, _t

HOUR_US = 3_600_000_000


@register(
    "pareto_frontier",
    """
    SELECT p.p_brand, p.p_partkey, CAST(p.p_size AS INTEGER) AS p_size,
           p.p_retailprice
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_brand = p.p_brand
          AND q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
    """,
    doc="Per-brand 2-D skyline (cheapest price at every size level not "
    "beaten from above): two-phase plan — collapse to one row per "
    "(brand, size) with the level-best price (map-side combinable), "
    "window over that size-cardinality-bounded relation for the best "
    "price among strictly larger sizes, then join the surviving levels "
    "back. The oracle is the O(n²) NOT EXISTS dominance self-join. "
    "operators/skyline.py.",
    bench=True,
)
def pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return skyline_2d(
        p.select("p_brand", "p_partkey", "p_size", "p_retailprice"),
        group_cols=["p_brand"],
        min_col="p_retailprice",
        max_col="p_size",
    )


@register(
    "interval_concurrency_peaks",
    f"""
    WITH iv AS (
        SELECT CAST(epoch_us(ts) AS BIGINT) AS s,
               CAST(epoch_us(ts) AS BIGINT)
                   + CAST(floor(value * 60000000.0) AS BIGINT) AS e
        FROM events WHERE event_type = 'view'),
    b AS (SELECT s AS t, 1 AS d FROM iv
          UNION ALL SELECT e AS t, -1 AS d FROM iv),
    pt AS (SELECT t, sum(d) AS net,
                  sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS n_starts
           FROM b GROUP BY t),
    r AS (SELECT t,
                 coalesce(sum(net) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     + n_starts AS conc
          FROM pt)
    SELECT t - (t % {HOUR_US}) AS hour_us,
           CAST(max(conc) AS BIGINT) AS peak_concurrency
    FROM r GROUP BY 1
    """,
    doc="Peak concurrent 'view' sessions per hour (interval = [ts, ts + "
    "value minutes)): sweep-line as bucketed prefix sums — boundary "
    "deltas aggregate per distinct timestamp, in-bucket running sums "
    "parallelize per hour bucket, and the cross-bucket carry-in is a "
    "window over the bucket-grain (metadata-sized) relation. The "
    "oracle runs the same sweep through ONE global window. "
    "operators/sweep.py.",
    bench=True,
)
def interval_concurrency_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "view")
    iv = ev.select(
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + F.floor(F.col("value") * 60_000_000.0).cast("long")
        ).alias("e"),
    )
    conc = interval_concurrency(iv, "s", "e", bucket_width=HOUR_US)
    return conc.groupBy(
        (F.col("t") - (F.col("t") % HOUR_US)).alias("hour_us")
    ).agg(F.max("concurrency").cast("long").alias("peak_concurrency"))


_RECON_COLS = [
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


@register(
    "snapshot_reconcile",
    """
    WITH cur AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_orderkey % 97 = 0
                    THEN o_totalprice * 1.05 ELSE o_totalprice END
                   AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 101 <> 0
        UNION ALL
        SELECT -o_orderkey - 1, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 103 = 0)
    , j AS (
        SELECT coalesce(b.o_orderkey, c.o_orderkey) AS o_orderkey,
               CASE WHEN b.o_orderkey IS NULL THEN 'added'
                    WHEN c.o_orderkey IS NULL THEN 'removed'
                    WHEN b.o_custkey       IS DISTINCT FROM c.o_custkey
                      OR b.o_orderstatus   IS DISTINCT FROM c.o_orderstatus
                      OR b.o_totalprice    IS DISTINCT FROM c.o_totalprice
                      OR b.o_orderdate     IS DISTINCT FROM c.o_orderdate
                      OR b.o_orderpriority IS DISTINCT FROM c.o_orderpriority
                    THEN 'changed' END AS change_type
        FROM orders b FULL OUTER JOIN cur c ON b.o_orderkey = c.o_orderkey)
    SELECT o_orderkey, change_type FROM j WHERE change_type IS NOT NULL
    """,
    doc="Snapshot reconciliation: base orders vs a deterministically "
    "mutated 'current' snapshot (keys %101 removed, %97 repriced "
    "×1.05, %103 re-inserted under new negative keys). The Spark plan "
    "ships (key, xxhash64-fingerprint) through the full-outer join — "
    "8 bytes per row regardless of row width; the oracle compares "
    "every column with IS DISTINCT FROM. operators/diff.py.",
    bench=True,
)
def snapshot_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    cur = (
        o.filter(k % 101 != 0)
        .withColumn(
            "o_totalprice",
            F.when(k % 97 == 0, F.col("o_totalprice") * 1.05).otherwise(
                F.col("o_totalprice")
            ),
        )
        .unionByName(
            o.filter(k % 103 == 0).withColumn("o_orderkey", -k - 1)
        )
    )
    return snapshot_diff(o, cur, ["o_orderkey"], compare_cols=_RECON_COLS)


@register(
    "benford_audit",
    """
    WITH d AS (
        SELECT o_orderpriority AS priority,
               CAST(substr(regexp_replace(CAST(o_totalprice AS VARCHAR),
                                          '[^1-9]', '', 'g'),
                           1, 1) AS INTEGER) AS digit
        FROM orders WHERE o_totalprice > 0),
    counts AS (SELECT priority, digit, count(*) AS c
               FROM d GROUP BY 1, 2),
    tot AS (SELECT priority, sum(c) AS n FROM counts GROUP BY 1),
    grid AS (SELECT p.priority, gs.digit
             FROM (SELECT DISTINCT priority FROM counts) p,
                  (SELECT unnest(range(1, 10)) AS digit) gs),
    terms AS (
        SELECT g.priority, t.n,
               coalesce(c.c, 0) AS obs,
               t.n * log10(1.0 + 1.0 / g.digit) AS exp
        FROM grid g
        JOIN tot t ON t.priority = g.priority
        LEFT JOIN counts c
          ON c.priority = g.priority AND c.digit = g.digit)
    SELECT priority, CAST(max(n) AS BIGINT) AS n,
           round(sum((obs - exp) * (obs - exp) / exp), 4) AS chi2
    FROM terms GROUP BY priority
    """,
    doc="Benford first-digit audit per order priority: χ² of the "
    "observed first-significant-digit distribution of o_totalprice "
    "against log10(1+1/d) — the standard fabricated-numbers screen. "
    "One scan, a 9-digit dense grid (missing digits still contribute "
    "their expectation), all JVM-side string/log arithmetic.",
)
def benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = o.select(
        F.col("o_orderpriority").alias("priority"),
        F.substring(
            F.regexp_replace(
                F.col("o_totalprice").cast("string"), "[^1-9]", ""
            ),
            1,
            1,
        )
        .cast("int")
        .alias("digit"),
    )
    counts = d.groupBy("priority", "digit").agg(F.count("*").alias("c"))
    tot = counts.groupBy("priority").agg(F.sum("c").alias("n"))
    grid = tot.select("priority", "n").crossJoin(
        F.broadcast(
            spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
        )
    )
    exp = F.col("n") * F.log10(1.0 + 1.0 / F.col("digit"))
    terms = grid.join(counts, ["priority", "digit"], "left").select(
        "priority",
        "n",
        F.coalesce("c", F.lit(0)).alias("obs"),
        exp.alias("exp"),
    )
    chi = (F.col("obs") - F.col("exp")) ** 2 / F.col("exp")
    return terms.groupBy("priority").agg(
        F.max("n").cast("long").alias("n"),
        F.round(F.sum(chi), 4).alias("chi2"),
    )


_COPURCHASE_EDGES_SQL = """
    bi AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    fi AS (SELECT l_partkey, count(*) AS s FROM bi
           GROUP BY l_partkey HAVING count(*) >= 10),
    bif AS (SELECT bi.l_orderkey, bi.l_partkey
            FROM bi JOIN fi USING (l_partkey)),
    pairs AS (SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
                     count(*) AS c
              FROM bif a JOIN bif b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING count(*) >= 2)
"""


@register(
    "copurchase_similarity",
    f"""
    WITH {_COPURCHASE_EDGES_SQL}
    SELECT item_a, item_b, CAST(c AS BIGINT) AS support,
           round(c / sqrt(sa.s * sb.s), 6) AS cosine_sim
    FROM pairs
    JOIN fi sa ON sa.l_partkey = item_a
    JOIN fi sb ON sb.l_partkey = item_b
    ORDER BY c / sqrt(sa.s * sb.s) DESC, item_a, item_b
    LIMIT 50
    """,
    doc="Item-item collaborative-filtering similarity from co-purchase "
    "counts: cosine = pair_support / √(support_a · support_b) over the "
    "a-priori-pruned frequent-pair graph (operators/baskets.py), "
    "supports joined back from the broadcast frequent-item set, top-50 "
    "via TakeOrderedAndProject (tie-broken on the pair). Exact ranking "
    "parity: cosine is one IEEE sqrt+divide on integers.",
)
def copurchase_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    fi = frequent_items(li, "l_orderkey", "l_partkey", min_support=10)
    pairs = frequent_pairs(
        li, "l_orderkey", "l_partkey", min_support=10, pair_min_support=2
    )
    sa = fi.select(
        F.col("l_partkey").alias("item_a"), F.col("support").alias("s_a")
    )
    sb = fi.select(
        F.col("l_partkey").alias("item_b"), F.col("support").alias("s_b")
    )
    cos = F.col("support") / F.sqrt(F.col("s_a") * F.col("s_b"))
    return (
        pairs.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .select(
            "item_a",
            "item_b",
            "support",
            F.round(cos, 6).alias("cosine_sim"),
            cos.alias("_rank"),
        )
        .orderBy(F.col("_rank").desc(), "item_a", "item_b")
        .limit(50)
        .drop("_rank")
    )


@register(
    "copurchase_triangles",
    f"""
    WITH {_COPURCHASE_EDGES_SQL},
    e AS (SELECT item_a, item_b FROM pairs),
    tri AS (SELECT e1.item_a AS x, e1.item_b AS y, e2.item_b AS z
            FROM e e1
            JOIN e e2 ON e2.item_a = e1.item_b
            JOIN e e3 ON e3.item_a = e1.item_a AND e3.item_b = e2.item_b),
    corners AS (SELECT x AS vertex FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri)
    SELECT vertex AS l_partkey, CAST(count(*) AS BIGINT) AS n_triangles
    FROM corners GROUP BY vertex
    """,
    doc="Per-item triangle counts over the co-purchase graph (items "
    "bought together in ≥2 orders, both items in ≥10 orders): triangle "
    "density separates genuine product communities from hub items. "
    "Degree-ordered orientation bounds every wedge fan-out by O(√m) "
    "(Schank–Wagner); the oracle enumerates id-ordered triples with a "
    "3-way self-join. operators/graph.py::triangle_counts.",
    bench=True,
)
def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pairs = frequent_pairs(
        li, "l_orderkey", "l_partkey", min_support=10, pair_min_support=2
    )
    return triangle_counts(pairs, src="item_a", dst="item_b").select(
        F.col("vertex").alias("l_partkey"), "n_triangles"
    )


SEVEN_D_US = 7 * 24 * 3_600_000_000


@register(
    "linear_attribution",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts,
                 CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS channel
          FROM events WHERE event_type = 'click'),
    m AS (SELECT p.event_id, c.channel
          FROM p JOIN c
            ON p.user_id = c.user_id
           AND epoch_us(c.ts) <= epoch_us(p.ts)
           AND epoch_us(c.ts) >= epoch_us(p.ts) - 604800000000),
    sh AS (SELECT event_id, channel,
                  1.0 / count(*) OVER (PARTITION BY event_id) AS credit
           FROM m)
    SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
           round(sum(credit), 4) AS credit
    FROM sh GROUP BY channel
    """,
    doc="Linear multi-touch attribution: every purchase splits one unit "
    "of credit equally across the same user's clicks in the prior 7 "
    "days, aggregated per click channel (props.k mod 10). Spark plan: "
    "time-binned equi-join (operators/temporal.py::range_join_binned — "
    "bounded fan-out, never a theta join) + one per-purchase count "
    "window + channel rollup; the oracle is the naive inequality join.",
    bench=True,
)
def linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from ..operators.temporal import range_join_binned

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros("ts").alias("p_ts_us")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.unix_micros("ts").alias("c_ts_us"),
        (F.get_json_object("props", "$.k").cast("int") % 10).alias("channel"),
    )
    # right_ts in [left_ts - 7d, left_ts]: upper bound is exclusive, so
    # +1 micro includes clicks at exactly the purchase instant
    m = range_join_binned(
        purchases,
        clicks,
        on="user_id",
        left_ts="p_ts_us",
        right_ts="c_ts_us",
        lower_us=-SEVEN_D_US,
        upper_us=1,
    )
    w = W.partitionBy("event_id")
    sh = m.select(
        "channel", (F.lit(1.0) / F.count("*").over(w)).alias("credit")
    )
    return sh.groupBy("channel").agg(
        F.count("*").alias("n_touches"),
        F.round(F.sum("credit"), 4).alias("credit"),
    )


@register(
    "sliding_active_users",
    """
    WITH ud AS (SELECT DISTINCT user_id,
                       date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                           AS day
                FROM events),
    days AS (SELECT DISTINCT day + o AS d
             FROM ud, (SELECT unnest(range(0, 7)) AS o))
    SELECT d AS day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS active_7d
    FROM days JOIN ud u ON u.day BETWEEN d - 6 AND d
    GROUP BY d
    """,
    doc="7-day sliding distinct active users per day: collapse to the "
    "(user, day) grain first (the only wide stage over raw events), "
    "then each user-day covers its next 7 calendar days via an IN-ROW "
    "sequence+explode (bounded duplication factor 7, the same trick as "
    "the binned range join) and a distinct count per covered day. The "
    "oracle recomputes each day's window with a naive BETWEEN self-join. "
    "Trailing days beyond the last activity keep their look-back "
    "coverage (both formulations include them).",
    bench=True,
)
def sliding_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    ud = ev.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day"),
    ).distinct()
    covered = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + 6)
        ).alias("day"),
    )
    return covered.groupBy("day").agg(
        F.countDistinct("user_id").alias("active_7d")
    )


@register(
    "pps_sample_orders",
    """
    WITH w AS (SELECT o_orderkey,
                      CAST(round(o_totalprice * 100) AS BIGINT) AS w_cents
               FROM orders),
    r AS (SELECT o_orderkey, w_cents,
                 coalesce(sum(w_cents) OVER (ORDER BY o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS c,
                 sum(w_cents) OVER () AS total
          FROM w),
    p AS (SELECT *, greatest(1, total // 200) AS stride FROM r),
    q AS (SELECT o_orderkey, w_cents,
                 least(200, (greatest(0, (c + w_cents) - (stride // 2))
                             + stride - 1) // stride)
               - least(200, (greatest(0, c - (stride // 2))
                             + stride - 1) // stride) AS n_hits
          FROM p)
    SELECT o_orderkey, w_cents, CAST(n_hits AS BIGINT) AS n_hits
    FROM q WHERE n_hits > 0
    """,
    doc="Systematic PPS sample of ~200 orders with probability "
    "proportional to price: weights scaled to integer cents, 200 "
    "equally-spaced points along the exact BIGINT cumulative-weight "
    "line (stride = total div 200, midpoint offset) — zero RNG, "
    "engine- and partitioning-independent. Spark computes the running "
    "position as a bucketed prefix sum (no single-partition window); "
    "the oracle uses the naive global window. "
    "operators/corpus.py::pps_systematic.",
    bench=True,
)
def pps_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import pps_systematic

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("w_cents"),
    )
    return pps_systematic(
        o, order_col="o_orderkey", weight_col="w_cents", n_select=200
    ).select("o_orderkey", "w_cents", F.col("n_hits").cast("long").alias("n_hits"))


@register(
    "key_skew_profile",
    """
    WITH counts AS (SELECT l_suppkey AS key, CAST(count(*) AS BIGINT) AS cnt
                    FROM lineitem GROUP BY 1),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS n_keys FROM counts),
    top AS (SELECT key, cnt FROM counts ORDER BY cnt DESC, key LIMIT 10)
    SELECT CAST(row_number() OVER (ORDER BY cnt DESC, key) AS INT) AS rnk,
           key, cnt,
           round(cnt / CAST(total AS DOUBLE), 6) AS share,
           n_keys,
           round(cnt * n_keys / CAST(total AS DOUBLE), 6) AS skew_ratio
    FROM top CROSS JOIN tot
    """,
    doc="Key-distribution skew diagnostics "
    "(operators/skew.py::key_skew_profile): top-10 heaviest lineitem "
    "supplier keys with table share and skew_ratio (count ÷ mean "
    "rows-per-key) — the measurement that decides between plain "
    "groupBy, salted_agg and AQE skew handling BEFORE a 100 TB job "
    "launches. Top-N via TakeOrderedAndProject (no global sort); the "
    "rank window runs over 10 rows, never the key universe.",
)
def key_skew_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import key_skew_profile

    return key_skew_profile(_t(spark, sf_dir, "lineitem"), "l_suppkey", top_n=10)


@register(
    "integrity_audit",
    """
    SELECT 0 AS check_idx, 'dup_lineitem_pk' AS check_name,
           (SELECT CAST(coalesce(sum(c - 1), 0) AS BIGINT)
            FROM (SELECT count(*) AS c FROM lineitem
                  GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1))
               AS n_violations
    UNION ALL
    SELECT 1, 'orphan_lineitem_order',
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 2, 'orphan_order_customer',
           (SELECT CAST(count(*) AS BIGINT) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 3, 'nonpositive_quantity',
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem WHERE l_quantity <= 0)
    """,
    doc="Declarative data-contract audit (the reference's dbt "
    "unique/not_null/relationship test strategy, SURVEY §5, as ONE "
    "query): duplicate-primary-key surplus, two referential-integrity "
    "orphan checks (anti-join — the processed-keys discipline applied "
    "to FK validation), and a domain predicate, unioned into a "
    "(check, n_violations) relation a pipeline gate can assert on. "
    "Each check is one keyed aggregation or anti-join; at scale the "
    "orphan checks broadcast-or-shuffle on the key like any semi join.",
bench=True,
)
def integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r10 single-pass shape (guide §2.3 "aggregate before you shuffle",
    # §2.4): the three lineitem checks share ONE scan + ONE (orderkey,
    # linenumber) pre-aggregation — dup surplus and the domain count
    # fold into it directly, and the orphan check anti-joins the
    # GROUPED relation (each surviving group contributes its row count
    # c, so sum(c) over orphan groups == the former per-row anti-join
    # count). The former plan scanned lineitem three times and unioned
    # four single-row subplans; now it is 2 scans total (li + orders)
    # + an in-row unpivot of one 4-column row.
    li = _t(spark, sf_dir, "lineitem")
    # ONE orders scan feeds both orders-side checks (r11, guide §2.3 /
    # §6): the 2-column projection materializes lazily once and the
    # orphan-lineitem probe and the customer anti-join both read it —
    # the former plan scanned orders separately per consumer (pushed
    # per-branch projections defeat scan reuse, the winnowing lesson).
    o = (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .localCheckpoint(eager=False)
    )
    c = _t(spark, sf_dir, "customer")
    g = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.count("*").alias("c"),
        F.count(F.when(F.col("l_quantity") <= 0, 1)).alias("np"),
    )
    a = g.agg(
        F.coalesce(F.sum(F.when(F.col("c") > 1, F.col("c") - 1)), F.lit(0))
        .cast("bigint")
        .alias("dup_v"),
        F.coalesce(F.sum("np"), F.lit(0)).cast("bigint").alias("nonpos_v"),
    )
    orphan_li = (
        g.join(o.select("o_orderkey"), g["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("orphan_li_v"))
    )
    orphan_o = (
        o.join(c.select("c_custkey"), o["o_custkey"] == c["c_custkey"], "left_anti")
        .agg(F.count("*").cast("bigint").alias("orphan_o_v"))
    )
    checks = F.array(
        F.struct(
            F.lit(0).cast("int").alias("check_idx"),
            F.lit("dup_lineitem_pk").alias("check_name"),
            F.col("dup_v").alias("n_violations"),
        ),
        F.struct(
            F.lit(1).cast("int").alias("check_idx"),
            F.lit("orphan_lineitem_order").alias("check_name"),
            F.col("orphan_li_v").alias("n_violations"),
        ),
        F.struct(
            F.lit(2).cast("int").alias("check_idx"),
            F.lit("orphan_order_customer").alias("check_name"),
            F.col("orphan_o_v").alias("n_violations"),
        ),
        F.struct(
            F.lit(3).cast("int").alias("check_idx"),
            F.lit("nonpositive_quantity").alias("check_name"),
            F.col("nonpos_v").alias("n_violations"),
        ),
    )
    return (
        a.crossJoin(F.broadcast(orphan_li))
        .crossJoin(F.broadcast(orphan_o))
        .select(F.explode(checks).alias("k"))
        .select("k.check_idx", "k.check_name", "k.n_violations")
    )


def _kcore_oracle(k: int = 2, rounds: int = 6) -> str:
    # the peel loop unrolled: each round keeps vertices with degree>=k
    # in the previous round's induced subgraph
    parts = [
        _COPURCHASE_EDGES_SQL.strip(),
        # AS MATERIALIZED: every eN is referenced three times by round
        # N+1; without the hint DuckDB inlines single-plan copies and the
        # unrolled chain expands exponentially (measured: >120 s at
        # sf0.01 inlined vs sub-second materialized)
        "e0 AS MATERIALIZED (SELECT item_a AS u, item_b AS v FROM pairs"
        " UNION ALL SELECT item_b, item_a FROM pairs)",
    ]
    prev = "e0"
    for r in range(1, rounds + 1):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT u FROM {prev} GROUP BY u"
            f" HAVING count(*) >= {k})"
        )
        parts.append(
            f"e{r} AS MATERIALIZED (SELECT e.u, e.v FROM {prev} e"
            f" JOIN d{r} a ON e.u = a.u"
            f" JOIN d{r} b ON e.v = b.u)"
        )
        prev = f"e{r}"
    return (
        "WITH " + ",\n    ".join(parts)
        + f"\n    SELECT u AS l_partkey, CAST(count(*) AS BIGINT)"
        f" AS core_degree FROM {prev} GROUP BY u"
    )


@register(
    "kcore_copurchase",
    _kcore_oracle(),
    doc="2-core of the co-purchase graph via 6 bounded peeling rounds "
    "(operators/graph.py::kcore_peel): repeatedly drop vertices with "
    "degree < 2 in the current induced subgraph — strips pendant "
    "chains, leaving the community skeleton triangle counting scores. "
    "Bounded form = the loop unrolled to 6 CTE pairs so the oracle "
    "replays it exactly; equal to the true 2-core when peeling "
    "converges within 6 rounds (fixpoint asserted in tests; at scale "
    "run to convergence with the components-style checksum loop). "
    "Each round is one map-side-combined degree count + two "
    "semi-joins keyed on vertex ids.",
)
def kcore_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import kcore_peel

    li = _t(spark, sf_dir, "lineitem")
    pairs = frequent_pairs(
        li, "l_orderkey", "l_partkey", min_support=10, pair_min_support=2
    )
    return kcore_peel(pairs, k=2, rounds=6).select(
        F.col("vertex").alias("l_partkey"), "core_degree"
    )


def _lpa_oracle(rounds: int = 4) -> str:
    # synchronous LPA unrolled: each round every vertex takes the mode
    # of its neighbors' previous-round labels (ties -> smallest label).
    # AS MATERIALIZED for the same reason as the k-core oracle: lN is
    # referenced by round N+1's join and would otherwise inline
    # exponentially.
    parts = [
        _COPURCHASE_EDGES_SQL.strip(),
        "e0 AS MATERIALIZED (SELECT item_a AS u, item_b AS v FROM pairs"
        " UNION ALL SELECT item_b, item_a FROM pairs)",
        "l0 AS MATERIALIZED (SELECT DISTINCT u AS v, u AS lbl FROM e0)",
    ]
    prev = "l0"
    for r in range(1, rounds + 1):
        parts.append(
            f"c{r} AS (SELECT e.u, l.lbl, count(*) AS c"
            f" FROM e0 e JOIN {prev} l ON e.v = l.v GROUP BY 1, 2)"
        )
        parts.append(
            f"l{r} AS MATERIALIZED (SELECT u AS v, lbl FROM"
            f" (SELECT u, lbl, row_number() OVER (PARTITION BY u"
            f" ORDER BY c DESC, lbl) AS rn FROM c{r}) WHERE rn = 1)"
        )
        prev = f"l{r}"
    return (
        "WITH " + ",\n    ".join(parts)
        + f"\n    SELECT v AS l_partkey, CAST(lbl AS BIGINT) AS community"
        f" FROM {prev}"
    )


@register(
    "label_propagation_communities",
    _lpa_oracle(rounds=4),
    doc="Community detection over the co-purchase graph via synchronous "
    "label propagation (Raghavan et al. 2007), 4 determinized rounds: "
    "every vertex adopts the most frequent neighbor label, ties to the "
    "smallest — near-linear community structure without the modularity "
    "machinery, the standard first-pass next to k-core/triangles. "
    "operators/graph.py::label_propagation; per round one vertex-keyed "
    "join + count + per-vertex row_number (no global window), lineage "
    "cut per round. Oracle replays the recurrence as an unrolled "
    "MATERIALIZED-CTE chain like the k-core peel.",
    bench=True,
)
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import label_propagation

    li = _t(spark, sf_dir, "lineitem")
    pairs = frequent_pairs(
        li, "l_orderkey", "l_partkey", min_support=10, pair_min_support=2
    )
    return label_propagation(pairs, src="item_a", dst="item_b", rounds=4).select(
        F.col("vertex").alias("l_partkey"),
        F.col("community").cast("long").alias("community"),
    )


@register(
    "lpa_modularity",
    f"""
    WITH lpa AS ({_lpa_oracle(rounds=4)}),
    {_COPURCHASE_EDGES_SQL},
    e AS (SELECT item_a AS a, item_b AS b FROM pairs),
    m AS (SELECT CAST(count(*) AS BIGINT) AS m_edges FROM e),
    el AS (SELECT la.community AS ca, lb.community AS cb
           FROM e
           JOIN lpa la ON la.l_partkey = e.a
           JOIN lpa lb ON lb.l_partkey = e.b),
    ein AS (SELECT ca AS community, CAST(count(*) AS BIGINT) AS e_in
            FROM el WHERE ca = cb GROUP BY 1),
    degc AS (SELECT community, CAST(sum(cnt) AS BIGINT) AS deg_sum
             FROM (SELECT v, CAST(count(*) AS BIGINT) AS cnt
                   FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e)
                   GROUP BY v) d
             JOIN lpa l ON l.l_partkey = d.v
             GROUP BY community),
    terms AS (SELECT d.community,
                     coalesce(ein.e_in, 0) AS e_in, d.deg_sum, m.m_edges
              FROM degc d LEFT JOIN ein USING (community) CROSS JOIN m)
    SELECT CAST(count(*) AS BIGINT) AS n_communities,
           CAST(max(m_edges) AS BIGINT) AS m_edges,
           round(sum(e_in / CAST(m_edges AS DOUBLE)
                     - (deg_sum / (2.0 * m_edges))
                       * (deg_sum / (2.0 * m_edges))), 6) AS modularity
    FROM terms
    """,
    doc="Newman modularity of the label-propagation partition over the "
    "co-purchase graph: Q = sum_c [ e_in_c/m - (deg_c/2m)^2 ] — the "
    "standard did-the-communities-mean-anything score (Q near 0 = "
    "random cut, 0.3+ = real structure), closing the loop on "
    "label_propagation_communities the way silhouette closes it on "
    "clustering. Composes the registered LPA oracle as a nested-WITH "
    "CTE; every accumulator is an exact integer (edge counts, degree "
    "sums) until the one final double expression, so Q is "
    "aggregation-order-deterministic. Spark side reuses the operator "
    "and two broadcast label joins.",
)
def lpa_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import label_propagation

    li = _t(spark, sf_dir, "lineitem")
    pairs = frequent_pairs(
        li, "l_orderkey", "l_partkey", min_support=10, pair_min_support=2
    )
    labels = label_propagation(
        pairs, src="item_a", dst="item_b", rounds=4
    ).select(
        F.col("vertex").alias("v"), F.col("community").cast("long").alias("c")
    ).localCheckpoint(eager=True)
    e = pairs.select(F.col("item_a").alias("a"), F.col("item_b").alias("b"))
    m = e.agg(F.count("*").cast("long").alias("m_edges"))
    el = (
        e.join(labels.select(F.col("v").alias("a"), F.col("c").alias("ca")), "a")
        .join(labels.select(F.col("v").alias("b"), F.col("c").alias("cb")), "b")
    )
    ein = (
        el.filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count("*").cast("long").alias("e_in"))
    )
    deg = (
        e.select(F.explode(F.array("a", "b")).alias("v"))
        .groupBy("v")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    degc = (
        deg.join(labels, "v")
        .groupBy(F.col("c").alias("community"))
        .agg(F.sum("cnt").cast("long").alias("deg_sum"))
    )
    terms = (
        degc.join(ein, "community", "left")
        .crossJoin(F.broadcast(m))
        .select(
            F.coalesce("e_in", F.lit(0)).alias("e_in"), "deg_sum", "m_edges"
        )
    )
    contrib = F.col("e_in") / F.col("m_edges").cast("double") - (
        F.col("deg_sum") / (2.0 * F.col("m_edges"))
    ) * (F.col("deg_sum") / (2.0 * F.col("m_edges")))
    return terms.agg(
        F.count("*").cast("long").alias("n_communities"),
        F.max("m_edges").cast("long").alias("m_edges"),
        F.round(F.sum(contrib), 6).alias("modularity"),
    )


@register(
    "degree_assortativity",
    f"""
    WITH {_COPURCHASE_EDGES_SQL},
    e AS (SELECT item_a AS a, item_b AS b FROM pairs),
    deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d
            FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e)
            GROUP BY v),
    de AS (SELECT da.d AS x, db.d AS y
           FROM e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b
           UNION ALL
           SELECT db.d, da.d
           FROM e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy
          FROM de)
    SELECT n AS n_directed_edges,
           round((n * sxy - sx * sy)
                 / sqrt(CAST((n * sxx - sx * sx) AS DOUBLE)
                        * (n * syy - sy * sy)), 6) AS assortativity
    FROM s
    """,
    doc="Degree assortativity (Newman 2002) of the co-purchase graph: "
    "Pearson correlation of endpoint degrees over directed edge "
    "orientations — positive = hubs link hubs (social-style), "
    "negative = hubs link leaves (hub-and-spoke catalogs). Moments "
    "accumulate as exact BIGINT sums of integer degrees (both "
    "orientations included, the standard symmetrization), one final "
    "double expression — aggregation-order-deterministic.",
)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pairs = frequent_pairs(
        li, "l_orderkey", "l_partkey", min_support=10, pair_min_support=2
    )
    e = pairs.select(F.col("item_a").alias("a"), F.col("item_b").alias("b"))
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").cast("long").alias("d"))
    )
    de1 = (
        e.join(deg.select(F.col("v").alias("a"), F.col("d").alias("x")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("y")), "b")
        .select("x", "y")
    )
    de = de1.unionByName(de1.select(F.col("y").alias("x"), F.col("x").alias("y")))
    s = de.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    return s.select(
        F.col("n").alias("n_directed_edges"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                    "double"
                )
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("assortativity"),
    )
