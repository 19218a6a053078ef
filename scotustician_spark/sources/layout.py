"""Storage-layout operators: compaction and sort-ordered writes.

The reference's layout management is implicit (one S3 object per
ingest write, ingest/main.py:299-310 — which at scale produces the
classic small-files problem; and b-tree indexes on the warehouse,
schema.sql:127-160). The Spark-native equivalents:

- ``compact`` — rewrite a directory of many small files into
  size-targeted files. At 100 TB, listing + opening millions of tiny
  parquet files dominates scan time long before row decoding does;
  periodic compaction keeps file count ∝ data size / target.
- ``write_range_sorted`` — range-repartition + in-partition sort
  before writing, so each parquet file (and row group) covers a
  disjoint, narrow key interval. Parquet min/max statistics then let
  pushed-down predicates skip whole row groups — the open-format
  replacement for the reference's b-tree indexes (and the poor
  man's Z-order for a single key).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def _total_input_bytes(spark: SparkSession, df: DataFrame) -> int:
    """Sum file sizes through the Hadoop FS API (works on any
    supported filesystem, not just local)."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    total = 0
    for uri in df.inputFiles():
        path = jvm.org.apache.hadoop.fs.Path(uri)
        fs = path.getFileSystem(conf)
        total += fs.getFileStatus(path).getLen()
    return total


def compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 << 20,
) -> int:
    """Rewrite ``src_path`` (parquet) into ``dst_path`` with files
    sized toward ``target_file_bytes``. Returns the output file count.

    Uses a round-robin repartition (no key → no skew); pair with
    ``write_range_sorted`` when downstream reads filter on a key.
    """
    df = spark.read.parquet(src_path)
    n = max(1, math.ceil(_total_input_bytes(spark, df) / target_file_bytes))
    df.repartition(n).write.mode("overwrite").parquet(dst_path)
    return n


def write_range_sorted(
    df: DataFrame, path: str, sort_col: str, num_files: int | None = None
) -> None:
    """Write ``df`` as parquet with disjoint, internally-sorted key
    ranges per file: range-repartition on ``sort_col`` (sampled
    boundaries — balanced even on skewed distributions), then sort
    within partitions so every row group's min/max stats are tight."""
    part = df.repartitionByRange(num_files, sort_col) if num_files else df.repartitionByRange(
        sort_col
    )
    part.sortWithinPartitions(sort_col).write.mode("overwrite").parquet(path)
