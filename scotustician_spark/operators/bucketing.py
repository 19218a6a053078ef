"""Bucketed (co-located) joins — the shuffle-free join strategy.

The reference leans on Postgres b-tree indexes for its joins
(schema.sql:127-160); Spark's equivalent for repeated large-scale
equi-joins is *bucketing*: write both tables hash-partitioned into
the same number of buckets on the join key, optionally sorted within
buckets. A later sort-merge join then reads matching buckets
directly — zero Exchange on either side, which at 100 TB is the
difference between an hours-long shuffle and a map-side join.

Layout cost is paid once at write time; every downstream join,
aggregation, or dedup keyed on the bucket column reuses it. This is
the batch analog of a co-partitioned streaming state store, and the
open-format cousin of Delta/Iceberg clustering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    path: str,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) parquet table.

    ``num_buckets`` should be sized so one bucket of the LARGEST table
    sharing this layout fits an executor's memory at target scale
    (~100-500 MB compressed per bucket at 100 TB fact-table scale);
    every co-joined table must use the same count and key.
    """
    writer = df.write.mode("overwrite").option("path", path).bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two tables previously written with ``write_bucketed`` on
    the same key/count. Catalyst reads the bucket spec from the
    catalog and plans a sort-merge join with NO Exchange on either
    side (verify with ``.explain``; tests assert it)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
