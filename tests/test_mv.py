"""Incremental materialized-view state: merge(partial(b1), ...,
partial(bn)) must equal the full recompute for any batching, including
null-valued measures and groups absent from some batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from scotustician_spark.operators.mv import mv_finalize, mv_merge, mv_partial

SPECS = {
    "n": ("count", "*"),
    "total": ("sum", "v"),
    "avg_v": ("avg", "v"),
    "mx": ("max", "v"),
    "mn": ("min", "v"),
}


def _full(df):
    return df.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").alias("total"),
        (F.sum("v") / F.count("v")).alias("avg_v"),
        F.max("v").alias("mx"),
        F.min("v").alias("mn"),
    )


def test_merged_partials_equal_full_recompute(spark):
    rows = [("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", None), ("c", 7.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    # batch by arbitrary uneven split: group c only in batch 2
    b1 = df.filter(F.col("g") != "c").limit(3)
    b2 = df.subtract(b1)
    state = mv_merge(["g"], SPECS, mv_partial(b1, ["g"], SPECS), mv_partial(b2, ["g"], SPECS))
    got = sorted(map(tuple, mv_finalize(state, ["g"], SPECS).collect()))
    want = sorted(map(tuple, _full(df).select("g", "n", "total", "avg_v", "mx", "mn").collect()))
    assert got == want


def test_merge_associative_three_way(spark):
    df = spark.range(0, 300).select(
        (F.col("id") % 7).alias("g"), (F.col("id") * 1.5).alias("v")
    )
    parts = [df.filter(F.col("id") % 3 == i) for i in range(3)]
    states = [mv_partial(p, ["g"], SPECS) for p in parts]
    # merge all at once vs merge incrementally (state-table update loop)
    all_at_once = mv_finalize(mv_merge(["g"], SPECS, *states), ["g"], SPECS)
    rolling = states[0]
    for s in states[1:]:
        rolling = mv_merge(["g"], SPECS, rolling, s)
    incremental = mv_finalize(rolling, ["g"], SPECS)
    full = _full(df).select("g", "n", "total", "avg_v", "mx", "mn")
    a = sorted(map(tuple, all_at_once.collect()))
    b = sorted(map(tuple, incremental.collect()))
    c = sorted(map(tuple, full.collect()))
    assert a == b == c
