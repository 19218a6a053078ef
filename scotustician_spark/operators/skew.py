"""Skew-resistant aggregation (100 TB design pattern).

AQE's skew-join splitting handles joins, but a groupBy whose key
distribution is pathological (one key = 30% of a 100 TB corpus — a
boilerplate dedup fingerprint, a null-ish user id) still lands one
monster reducer. ``salted_agg`` is the classic two-phase fix: phase 1
aggregates on (key, salt) — the hot key fans out over ``n_salts``
reducers — phase 2 merges the per-salt partials on the key alone.
Works for algebraic aggregates (sum/count/min/max and avg as
sum÷count) whose partials merge losslessly, so the result is
bit-identical to a plain groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# aggregate -> (phase-1 fn, phase-2 merge fn)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """groupBy(keys).agg(...) with salt fan-out.

    ``aggs``: (column, fn, alias) with fn in sum|count|min|max|avg.
    avg decomposes to sum/count internally (a direct avg-of-avgs would
    be weight-wrong).
    """
    plan: list[tuple[str, str, str]] = []
    derived_avg: list[tuple[str, str]] = []  # (alias, src_col)
    for col, fn, alias in aggs:
        if fn == "avg":
            plan.append((col, "sum", f"__s_{alias}"))
            plan.append((col, "count", f"__c_{alias}"))
            derived_avg.append((alias, col))
        elif fn in _ALGEBRAIC:
            plan.append((col, fn, alias))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")

    salted = df.withColumn(
        "__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salts))
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[_ALGEBRAIC[fn][0](col).alias(alias) for col, fn, alias in plan]
    )
    phase2 = phase1.groupBy(*keys).agg(
        *[_ALGEBRAIC[fn][1](alias).alias(alias) for _, fn, alias in plan]
    )
    for alias, _ in derived_avg:
        phase2 = phase2.withColumn(
            alias, F.col(f"__s_{alias}") / F.col(f"__c_{alias}")
        ).drop(f"__s_{alias}", f"__c_{alias}")
    return phase2


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    hot_keys: DataFrame | list,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left`` is heavily skewed on known hot keys.

    AQE's runtime skew splitting handles most cases; this is the
    explicit variant for when the hot keys are known up front (a
    null-ish user id, a boilerplate fingerprint) or AQE is
    unavailable (streaming joins). Classic replication scheme:

    - left rows on a hot key get a random-ish salt in [0, n_salts)
      (deterministic: hash of the full row, not rand() — resumable);
    - right rows on a hot key are REPLICATED once per salt;
    - everything else joins with salt 0 (no replication cost);
    - join on (key, salt) — the hot key now spreads over n_salts
      reducers.

    Bit-identical to the plain join (inner/left) for any salt count.
    """
    spark = left.sparkSession
    if isinstance(hot_keys, list):
        from ..session import local_relation

        hot_keys = local_relation(
            spark, [(k,) for k in hot_keys], f"{key} {dict(left.dtypes)[key]}"
        )
    hot = F.broadcast(hot_keys.select(key).distinct().withColumn("__hot", F.lit(True)))

    l_salted = (
        left.join(hot, key, "left")
        .withColumn(
            "__salt",
            F.when(
                F.col("__hot"),
                F.pmod(F.xxhash64(*left.columns), F.lit(n_salts)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("__hot")
    )
    r_salted = (
        right.join(hot, key, "left")
        .withColumn(
            "__salt",
            F.when(
                F.col("__hot"), F.sequence(F.lit(0), F.lit(n_salts - 1))
            ).otherwise(F.array(F.lit(0))),
        )
        .withColumn("__salt", F.explode("__salt"))
        .drop("__hot")
    )
    return l_salted.join(r_salted, [key, "__salt"], how).drop("__salt")


def key_skew_profile(
    df: DataFrame, key_col: str, top_n: int = 10
) -> DataFrame:
    """Key-distribution diagnostics — the measurement that DECIDES the
    skew strategy (plain groupBy vs ``salted_agg`` vs AQE skew join)
    before a 100 TB job is launched with the wrong one. Returns the
    ``top_n`` heaviest keys with:

    - ``cnt``        — rows carrying the key
    - ``share``      — fraction of the table
    - ``skew_ratio`` — cnt ÷ mean rows-per-key (1.0 = perfectly even;
      a reducer processing this key runs skew_ratio× longer than
      average)

    Plan shape: one groupBy(key) count, a TakeOrderedAndProject for
    the top-N (orderBy+limit never globally sorts — each partition
    ships only its local top-N to the driver-side merge), and a
    broadcast single-row totals relation. The final rank window runs
    over top_n rows, not the key universe.
    """
    from pyspark.sql.window import Window as W

    counts = df.groupBy(F.col(key_col).alias("key")).agg(F.count("*").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("__total"),
        F.count("*").alias("n_keys"),
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("key")).limit(top_n)
    w = W.orderBy(F.desc("cnt"), F.asc("key"))
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            F.row_number().over(w).cast("int").alias("rnk"),
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("__total").cast("double"), 6).alias("share"),
            F.col("n_keys"),
            F.round(
                F.col("cnt") * F.col("n_keys") / F.col("__total").cast("double"), 6
            ).alias("skew_ratio"),
        )
    )


def choose_agg_strategy(
    skew_ratio: float | None, skew_ratio_threshold: float = 8.0
) -> str:
    """'plain' or 'salted' from a measured key-skew ratio (max
    ``skew_ratio`` of ``key_skew_profile`` — rows on the hottest key ÷
    mean rows-per-key). Map-side partial aggregation already collapses
    a hot key WITHIN each input partition, so mild skew costs nothing;
    salting pays two aggregations and only wins when one reducer's
    merge work dominates the stage (hot key's partials ≫ the rest).
    None = unmeasured → plain (measure once per table, not per
    query)."""
    if skew_ratio is not None and skew_ratio > skew_ratio_threshold:
        return "salted"
    return "plain"


def auto_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    skew_ratio: float | None = None,
    skew_ratio_threshold: float = 8.0,
    n_salts: int = 16,
) -> DataFrame:
    """groupBy(keys).agg(...) through the strategy
    ``choose_agg_strategy`` picks — the aggregation twin of
    ``bloom.auto_semi_join``. Results are bit-identical across
    strategies for the supported algebraic aggregates (sum/count/
    min/max/avg); only the plan shape changes."""
    if choose_agg_strategy(skew_ratio, skew_ratio_threshold) == "salted":
        return salted_agg(df, keys, aggs, n_salts)
    derived_avg = [(alias, col) for col, fn, alias in aggs if fn == "avg"]
    plan = []
    for col, fn, alias in aggs:
        if fn == "avg":
            plan.append(F.sum(col).alias(f"__s_{alias}"))
            plan.append(F.count(col).alias(f"__c_{alias}"))
        elif fn in _ALGEBRAIC:
            plan.append(_ALGEBRAIC[fn][0](col).alias(alias))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r}")
    out = df.groupBy(*keys).agg(*plan)
    for alias, _ in derived_avg:
        out = out.withColumn(
            alias, F.col(f"__s_{alias}") / F.col(f"__c_{alias}")
        ).drop(f"__s_{alias}", f"__c_{alias}")
    return out
