"""Global exclusive prefix sums without a single-partition window.

The naive running total — ``sum(v) OVER (ORDER BY k ROWS UNBOUNDED
PRECEDING)`` — drags the whole relation through ONE partition. The
scalable exact form, shared by the sweep-line concurrency operator,
systematic PPS sampling, and any future member of the family:

1. bucket rows by ``order_col div bucket_width`` (order-preserving);
2. in-bucket exclusive running sums via a window PARTITIONED by
   bucket (parallel, bounded state);
3. per-bucket totals collapse to a bucket-grain relation (one row per
   non-empty bucket — metadata-sized), whose own exclusive running
   total is each bucket's carry-in;
4. broadcast the carry-ins back; global prefix = carry-in + local.

Same decomposition as ``operators/gaps.py`` (lead) and
``stable_global_index`` (row counts) — this is the summed-value
member.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def bucketed_running_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    bucket_width: int,
    out_col: str = "run_before",
) -> DataFrame:
    """``df`` plus ``out_col`` = the EXCLUSIVE running sum of
    ``value_col`` over the global ``order_col`` order (0 for the first
    row). ``order_col`` must be integral; ties within an ``order_col``
    value get an engine-dependent mutual order — aggregate to distinct
    keys first (as the sweep operator does) or use a unique key (as
    PPS requires) when exactness under ties matters."""
    # both consumers below (the in-bucket window and the bucket-total
    # aggregate) read this relation; without a cut each re-runs the
    # whole upstream pipeline — pushed-down projections make the
    # subtrees non-canonical, so ReusedExchange never fires (the r10
    # plan audit measured the sweep operator scanning its source 4×).
    # Lazy: the first consumer materializes it inside its own job.
    b = df.withColumn(
        "__pfx_bucket", F.col(order_col) - (F.col(order_col) % bucket_width)
    ).localCheckpoint(eager=False)
    in_w = (
        W.partitionBy("__pfx_bucket")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    local = b.withColumn(
        "__pfx_local", F.coalesce(F.sum(value_col).over(in_w), F.lit(0))
    )
    bucket_w = W.orderBy("__pfx_bucket").rowsBetween(W.unboundedPreceding, -1)
    offsets = (
        b.groupBy("__pfx_bucket")
        .agg(F.sum(value_col).alias("__pfx_total"))
        .withColumn(
            "__pfx_carry",
            F.coalesce(F.sum("__pfx_total").over(bucket_w), F.lit(0)),
        )
        .select("__pfx_bucket", "__pfx_carry")
    )
    return (
        local.join(F.broadcast(offsets), "__pfx_bucket")
        .withColumn(out_col, F.col("__pfx_carry") + F.col("__pfx_local"))
        .drop("__pfx_bucket", "__pfx_local", "__pfx_carry")
    )
