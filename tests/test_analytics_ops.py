"""Unit tests for the analytics-extension operators: Misra-Gries heavy
hitters, calendar gap-fill + LOCF, blocked fuzzy pairs."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_misra_gries_candidates_superset(spark):
    """Every item with freq > n/k must survive the per-partition
    summaries regardless of partitioning."""
    from scotustician_spark.operators.frequency import misra_gries_candidates

    rows = (
        [("hot",)] * 50
        + [("warm",)] * 20
        + [(f"cold{i}",) for i in range(100)]
    )
    df = spark.createDataFrame(rows, "item string").repartition(7)
    n = df.count()
    k = 10  # threshold n/k = 17: hot & warm must survive
    cands = {r["item"] for r in misra_gries_candidates(df, "item", k).collect()}
    assert {"hot", "warm"} <= cands


def test_heavy_hitters_exact(spark):
    """heavy_hitters == plain groupBy/HAVING for any min_freq
    compatible with the summary width."""
    from scotustician_spark.operators.frequency import heavy_hitters

    rows = (
        [("a",)] * 30 + [("b",)] * 12 + [("c",)] * 11 + [(f"x{i}",) for i in range(60)]
    )
    df = spark.createDataFrame(rows, "item string").repartition(5)
    got = {
        (r["item"], r["freq"])
        for r in heavy_hitters(df, "item", min_freq=11, k=64).collect()
    }
    want = {
        (r["item"], r["cnt"])
        for r in df.groupBy("item")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 11)
        .collect()
    }
    assert got == want == {("a", 30), ("b", 12), ("c", 11)}


def test_gap_fill_daily_zero_and_locf(spark):
    from scotustician_spark.operators.timeseries import gap_fill_daily

    obs = spark.createDataFrame(
        [
            ("k1", dt.date(2024, 1, 1), 2, 10.0),
            ("k1", dt.date(2024, 1, 4), 1, 40.0),
            ("k2", dt.date(2024, 1, 2), 3, 99.0),
        ],
        "key string, day date, n long, price double",
    )
    out = {
        (r["key"], r["day"].isoformat()): r
        for r in gap_fill_daily(
            obs, "key", "day", zero_cols=["n"], locf_cols=["price"]
        ).collect()
    }
    # dense axis: global span 1/1..1/4 for BOTH keys
    assert len(out) == 8
    r = out[("k1", "2024-01-02")]
    assert (r["is_observed"], r["n"], r["price"]) == (False, 0, 10.0)  # LOCF
    r = out[("k1", "2024-01-04")]
    assert (r["is_observed"], r["n"], r["price"]) == (True, 1, 40.0)
    r = out[("k2", "2024-01-01")]
    assert (r["is_observed"], r["n"], r["price"]) == (False, 0, None)  # pre-first
    r = out[("k2", "2024-01-03")]
    assert (r["is_observed"], r["n"], r["price"]) == (False, 0, 99.0)


def test_blocked_levenshtein_pairs(spark):
    from scotustician_spark.operators.fuzzy import (
        blocked_levenshtein_pairs,
        length_prefix_block,
    )

    df = spark.createDataFrame(
        [
            (1, "widget-alpha"),
            (2, "widget-alphb"),   # distance 1 from id 1
            (3, "widget-gamma"),   # same block, distance 4
            (4, "gadget-alpha"),   # different prefix → different block
            (5, "widget-alpha"),   # exact dup of id 1 → distance 0
        ],
        "id int, name string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in blocked_levenshtein_pairs(
            df, "id", "name", length_prefix_block("name", 6), max_distance=1
        ).collect()
    }
    assert pairs == {(1, 2): 1, (1, 5): 0, (2, 5): 1}
