"""Storage-layout operators: compaction collapses small files without
losing rows; range-sorted writes produce disjoint per-file key ranges
with tight row-group stats (the data-skipping contract)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from scotustician_spark.sources.layout import compact, write_range_sorted


def test_compact_small_files(spark, sf_dir, tmp_path):
    src, dst = str(tmp_path / "small"), str(tmp_path / "compacted")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.repartition(40).write.parquet(src)  # simulate the small-files problem
    assert len(glob.glob(f"{src}/part-*")) == 40

    n = compact(spark, src, dst, target_file_bytes=64 << 20)
    out_files = glob.glob(f"{dst}/part-*")
    assert len(out_files) == n <= 2  # sf0.001 lineitem is well under 64 MB
    assert spark.read.parquet(dst).count() == li.count()


def test_write_range_sorted_disjoint_rowgroups(spark, sf_dir, tmp_path):
    dst = str(tmp_path / "sorted")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_shipdate"
    )
    write_range_sorted(li, dst, "l_orderkey", num_files=4)

    files = sorted(glob.glob(f"{dst}/part-*.parquet"))
    assert len(files) == 4
    # every row group carries min/max stats and the per-file key ranges
    # are pairwise disjoint — pushed-down key predicates skip whole files
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        col_idx = md.schema.names.index("l_orderkey")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            assert st is not None and st.has_min_max
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo  # disjoint (boundary key may touch)
    # rows survive the rewrite
    assert spark.read.parquet(dst).count() == li.count()


def test_zorder_value_constant_and_null_columns(spark):
    from scotustician_spark.sources.layout import zorder_value

    # constant column (span 0) must not divide by zero; NULL values get
    # an explicit cell instead of least()'s null-skip mapping them to 255
    df = spark.createDataFrame(
        [(5, 1), (5, 2), (5, None)], "c long, x int"
    )
    z = zorder_value(["c", "x"], [5, 1], [5, 3], bits=4)
    rows = df.withColumn("z", z).collect()
    assert all(r["z"] is not None for r in rows)
    # constant column contributes cell 0: rows differ only via x
    z_by_x = {r["x"]: r["z"] for r in rows}
    assert z_by_x[1] != z_by_x[2]
    # the NULL x row maps to the top cell, distinct from interior values
    assert z_by_x[None] not in (z_by_x[1], z_by_x[2])


def test_write_zordered_prunes_both_dimensions(spark, tmp_path):
    from scotustician_spark.sources.layout import write_zordered

    # uniform 2-D grid: z-order must localize BOTH x and y per file,
    # where a plain x-sort localizes only x
    rows = [(x, y, x * 256 + y) for x in range(128) for y in range(128)]
    df = spark.createDataFrame(rows, "x long, y long, payload long")

    def file_coverage(path, col):
        spans = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            ci = md.schema.names.index(col)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                mins.append(st.min)
                maxs.append(st.max)
            spans.append((max(maxs) - min(mins)) / 127.0)
        return sum(spans) / len(spans)

    zdst = str(tmp_path / "zorder")
    write_zordered(df, zdst, ["x", "y"], bits=7, num_files=16)
    assert spark.read.parquet(zdst).count() == df.count()
    # 16 files over a 128x128 grid -> each file is a ~32x32 tile:
    # both dimensions localized (coverage well under the full range)
    assert file_coverage(zdst, "x") < 0.5
    assert file_coverage(zdst, "y") < 0.5

    xdst = str(tmp_path / "xsort")
    write_range_sorted(df, xdst, "x", num_files=16)
    # the single-key sort localizes x tightly but leaves y unclustered
    assert file_coverage(xdst, "x") < 0.2
    assert file_coverage(xdst, "y") > 0.9


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """The 100 TB star-join contract beyond static pruning: a selective
    dim filter must prune the date-partitioned fact's partitions AT
    RUNTIME (DPP subquery in the scan's PartitionFilters), so the fact
    scan reads only the partitions the filtered dim can match."""
    from pyspark.sql import functions as F

    fact_path = str(tmp_path / "fact_part")
    n_days = 20
    fact = spark.range(0, 2000).select(
        F.col("id").alias("k"),
        (F.col("id") % n_days).cast("int").alias("day"),
        (F.col("id") * 2.5).alias("v"),
    )
    fact.write.partitionBy("day").mode("overwrite").parquet(fact_path)
    dim = spark.range(0, n_days).select(
        F.col("id").cast("int").alias("day"),
        F.when(F.col("id") < 2, "hot").otherwise("cold").alias("tag"),
    )
    f = spark.read.parquet(fact_path)
    joined = f.join(dim.filter(F.col("tag") == "hot"), "day").agg(
        F.sum("v").alias("s"), F.count("*").alias("n")
    )
    row = joined.collect()[0]
    # correctness: only days 0 and 1 contribute (ids ≡ 0,1 mod 20)
    assert row["n"] == 200
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan


def test_dynamic_partition_overwrite_touches_only_written_partitions(spark, tmp_path):
    """Incremental partition rewrite: with partitionOverwriteMode=dynamic,
    an overwrite write replaces ONLY the partitions present in the new
    data — the warehouse-maintenance primitive behind daily restatement
    at 100 TB (static mode would wipe the whole table)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "dyn_part")
    base = spark.createDataFrame(
        [(1, "d1"), (2, "d1"), (3, "d2"), (4, "d3")], "k int, day string"
    )
    base.write.partitionBy("day").mode("overwrite").parquet(path)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        restate = spark.createDataFrame([(30, "d2")], "k int, day string")
        restate.write.partitionBy("day").mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    got = {(r["k"], r["day"]) for r in spark.read.parquet(path).collect()}
    # d1 and d3 untouched; d2 replaced wholesale
    assert got == {(1, "d1"), (2, "d1"), (30, "d2"), (4, "d3")}
