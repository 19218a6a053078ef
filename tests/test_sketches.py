"""Re-aggregatable distinct-count sketches (HLL / Theta family).

The 100 TB pattern these pin: precompute ONE tiny sketch per partition
/ day / shard, persist it, and answer any later distinct-count rollup
by MERGING sketches — no re-scan of raw data, and (unlike plain
``approx_count_distinct`` results) the partials compose: estimates
over unions come from unions of sketches. ``approx_distinct`` in the
registry is the query-time path; these tests pin the mergeability
contract Spark's Datasketches-backed functions provide.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_hll_sketch_merge_equals_global(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # per-group sketches merged across groups == one global sketch:
    # the property that makes sketches precomputable per partition
    merged = (
        li.groupBy("l_returnflag")
        .agg(F.hll_sketch_agg("l_partkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    direct = (
        li.agg(F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("est"))
        .collect()[0]["est"]
    )
    assert merged == direct  # same sketch state, not merely close


def test_hll_estimate_within_tolerance(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = li.select("l_partkey").distinct().count()
    est = (
        li.agg(F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("e"))
        .collect()[0]["e"]
    )
    assert abs(est - exact) / exact < 0.05  # default lgK=12 → ~1.6% rse


def test_hll_sketches_survive_persistence(spark, sf_dir, tmp_path):
    # sketches are binary columns: write the partials, read them back,
    # merge — the "sketch per day, roll up later" lifecycle
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = str(tmp_path / "sketches")
    li.groupBy("l_returnflag").agg(F.hll_sketch_agg("l_partkey").alias("sk")).write.parquet(p)
    roundtrip = (
        spark.read.parquet(p)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    direct = (
        li.agg(F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("est"))
        .collect()[0]["est"]
    )
    assert roundtrip == direct


def test_cms_estimate_never_undercounts(spark):
    """CMS point estimates are one-sided: est >= true count for every
    probed item, and exact when no other item collides in ALL 4 rows."""
    from scotustician_spark.operators.frequency import cms_cells, cms_estimate

    rows = [(t,) for t in ["a"] * 7 + ["b"] * 3 + ["c"] * 1 + [f"x{i}" for i in range(50)]]
    items = spark.createDataFrame(rows, "token string")
    cells = cms_cells(items, "token", width=64)
    probes = spark.createDataFrame([("a",), ("b",), ("c",)], "token string")
    got = {
        r["token"]: r["cms_est"]
        for r in cms_estimate(cells, probes, "token", width=64).collect()
    }
    assert got["a"] >= 7 and got["b"] >= 3 and got["c"] >= 1
    total = cells.groupBy("r").sum("c").collect()
    # each of the 4 sketch rows partitions the full stream: row sums equal n
    assert {r["sum(c)"] for r in total} == {len(rows)}


def test_cms_cells_merge_across_partitions(spark):
    """Sketch addition: cells built on two disjoint halves, merged by
    summing counts, equal the single-pass sketch — the mergeability
    that makes CMS the streaming twin of exact counting."""
    from pyspark.sql import functions as F
    from scotustician_spark.operators.frequency import cms_cells

    rows = [(i, f"t{i % 13}") for i in range(200)]
    items = spark.createDataFrame(rows, "i int, token string")
    whole = cms_cells(items, "token", width=32)
    a = cms_cells(items.filter("i < 100"), "token", width=32)
    b = cms_cells(items.filter("i >= 100"), "token", width=32)
    merged = (
        a.unionByName(b)
        .groupBy("r", "bucket")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_cms_estimate_unseen_item_is_zero(spark):
    """CMS point-query contract for UNSEEN items: a probe that was
    never inserted must appear in the output, and when any of its 4
    addressed cells is empty the min must include that 0 — the sparse
    cell relation joins LEFT with coalesce(c, 0), never inner (an
    inner join would overestimate or drop the probe entirely)."""
    from scotustician_spark.operators.frequency import cms_cells, cms_estimate

    rows = [(t,) for t in ["a"] * 7 + ["b"] * 3]
    cells = cms_cells(
        spark.createDataFrame(rows, "token string"), "token", width=8192
    )
    probes = spark.createDataFrame(
        [("a",), ("never_inserted_zzz",)], "token string"
    )
    got = {
        r["token"]: r["cms_est"]
        for r in cms_estimate(cells, probes, "token", width=8192).collect()
    }
    # the unseen probe is PRESENT and exact-zero: with 2 distinct items
    # in a width-8192 sketch its md5-addressed cells are empty (fixed
    # strings, deterministic hashes — verified at authoring time)
    assert got["never_inserted_zzz"] == 0
    assert got["a"] >= 7


def test_token_heavy_hitter_arms_identical(spark, sf_dir):
    """VERDICT r6 #4: the groupby and Misra-Gries arms must return the
    identical (token, freq) set — MG's candidate superset + exact
    recount is exact by the n/k guarantee, and the auto-select must
    never change results, only the plan."""
    from scotustician_spark.operators.frequency import (
        choose_heavy_hitter_strategy,
        token_heavy_hitters,
    )

    assert choose_heavy_hitter_strategy(1024) == "groupby"
    assert choose_heavy_hitter_strategy(1 << 40) == "misra_gries"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    gb = {
        (r["token"], r["freq"])
        for r in token_heavy_hitters(
            docs, "text", min_freq=20, strategy="groupby"
        ).collect()
    }
    mg = {
        (r["token"], r["freq"])
        for r in token_heavy_hitters(
            docs, "text", min_freq=20, strategy="misra_gries"
        ).collect()
    }
    assert gb == mg and gb
    import pytest

    with pytest.raises(ValueError, match="strategy"):
        token_heavy_hitters(docs, "text", 20, strategy="nope")
