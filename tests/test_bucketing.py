"""Bucketed co-located join: the plan IS the feature — both sides
pre-bucketed on the join key must sort-merge join with zero
shuffle Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scotustician_spark.operators.bucketing import colocated_join, write_bucketed


@pytest.fixture()
def bucketed_tables(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(li, "t_li_b", ["l_orderkey"], 8, str(tmp_path / "li"), ["l_orderkey"])
    write_bucketed(o, "t_o_b", ["o_orderkey"], 8, str(tmp_path / "o"), ["o_orderkey"])
    yield "t_li_b", "t_o_b"
    spark.sql("DROP TABLE IF EXISTS t_li_b")
    spark.sql("DROP TABLE IF EXISTS t_o_b")


def test_colocated_join_no_shuffle(spark, sf_dir, bucketed_tables):
    li_t, o_t = bucketed_tables
    # force SMJ so the assertion is about bucketing, not broadcast
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(li_t)
            .join(
                spark.table(o_t),
                F.col("l_orderkey") == F.col("o_orderkey"),
                "inner",
            )
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        rows = joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]  # AQE prints both
        # join itself must be Exchange-free; the only shuffle allowed is
        # the final tiny groupBy on o_orderstatus
        assert "SortMergeJoin" in final, plan
        assert final.count("Exchange") <= 1, plan
        # everything under the SMJ (tree prints children below it) must
        # come straight from bucketed scans — no shuffle
        join_subtree = final.split("SortMergeJoin")[-1]
        assert "Exchange" not in join_subtree, plan
        assert join_subtree.count("Bucketed: true") == 2, plan
        assert rows and sum(1 for _ in rows) <= 3
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_colocated_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    li_t, o_t = bucketed_tables
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    expected = li.join(o, li.l_orderkey == o.o_orderkey, "inner").count()
    got = (
        spark.table(li_t)
        .join(spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey"), "inner")
        .count()
    )
    assert got == expected


def test_bucketed_aggregation_no_exchange(spark, sf_dir, bucketed_tables):
    """The bucketed layout pays off for AGGREGATION too: a groupBy on
    the bucket key reuses the on-disk hash partitioning — no Exchange
    anywhere in the plan (at 100 TB this turns every repeated per-key
    rollup over the fact table into a scan-local aggregation)."""
    t_li, _ = bucketed_tables
    agg = (
        spark.table(t_li)
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").alias("qty"),
        )
    )
    agg.write.format("noop").mode("overwrite").save()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan, plan
    # results identical to the unbucketed aggregation
    plain = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
    )
    assert agg.exceptAll(plain).count() == 0 and plain.exceptAll(agg).count() == 0
