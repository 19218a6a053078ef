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
