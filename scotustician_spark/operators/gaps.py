"""Sequence-gap detection (missing-id ranges) without a global sort.

The textbook query — ``lead(id) OVER (ORDER BY id)`` and report
``next - id > 1`` — puts the ENTIRE key set through one partition (an
un-partitioned window), the same single-partition trap
``stable_global_index`` avoids. The scalable formulation:

1. bucket ids by ``id DIV bucket_width`` — order-preserving, so every
   gap is either INSIDE one bucket or BETWEEN two adjacent non-empty
   buckets;
2. in-bucket gaps: lead() within each bucket partition (parallel,
   bounded state);
3. cross-bucket gaps: one row per bucket (min/max — a tiny aggregate),
   lead() over THAT (thousands of rows through a single partition is
   fine — the data is bucket-grain, not key-grain).

Union of (2) and (3) is exactly the global answer: ids in the same
bucket meet in (2); consecutive-in-order ids of different buckets are
a (bucket_max, next_bucket_min) pair in (3). Used for billing/event
id audits and detecting dropped ingest batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def sequence_gaps(
    df: DataFrame, id_col: str, bucket_width: int = 1024
) -> DataFrame:
    """(gap_start, gap_end, gap_len) for every maximal run of missing
    values between the observed min and max of ``id_col``."""
    ids = df.select(F.col(id_col).cast("long").alias("id")).distinct()
    b = ids.withColumn("bucket", F.col("id") - (F.col("id") % bucket_width))
    in_w = W.partitionBy("bucket").orderBy("id")
    in_gaps = (
        b.withColumn("nxt", F.lead("id").over(in_w))
        .filter(F.col("nxt") > F.col("id") + 1)
        .select(
            (F.col("id") + 1).alias("gap_start"),
            (F.col("nxt") - 1).alias("gap_end"),
        )
    )
    edges = b.groupBy("bucket").agg(
        F.min("id").alias("lo"), F.max("id").alias("hi")
    )
    # bucket-grain relation: one row per NON-EMPTY bucket — small by
    # construction, so the unpartitioned lead is over metadata, not data
    edge_w = W.orderBy("bucket")
    cross_gaps = (
        edges.withColumn("next_lo", F.lead("lo").over(edge_w))
        .filter(F.col("next_lo") > F.col("hi") + 1)
        .select(
            (F.col("hi") + 1).alias("gap_start"),
            (F.col("next_lo") - 1).alias("gap_end"),
        )
    )
    return in_gaps.unionByName(cross_gaps).select(
        "gap_start",
        "gap_end",
        (F.col("gap_end") - F.col("gap_start") + 1).alias("gap_len"),
    )
