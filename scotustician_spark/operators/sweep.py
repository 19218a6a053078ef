"""Sweep-line interval analytics: peak concurrency without an
interval self-join and without a global single-partition window.

"How many intervals overlap at time t" is classically answered either
by an interval self-join (quadratic in overlap density) or by a
running sum over ALL boundary events ordered globally (one partition
holds the whole table). The scalable exact plan:

1. explode each interval into two boundary deltas (+1 at start, -1 at
   end) and AGGREGATE PER DISTINCT TIMESTAMP (net delta + start
   count) — a map-side-combinable groupBy that also makes tie order a
   non-issue: concurrency is evaluated after all starts at a
   timestamp and before its ends (closed-start, open-end reading
   gives the same peak);
2. the running net over distinct timestamps is a global exclusive
   prefix sum — computed by the shared
   ``operators/prefix.py::bucketed_running_sum`` (in-bucket windows +
   bucket-grain carry-ins, same decomposition as ``operators/gaps.py``
   and ``stable_global_index``);
3. peak(ts) = carry-in + in-bucket-running-before + starts(ts).

Beyond-reference (SURVEY §2.3 lists range/interval joins as "not
present"): the standard capacity-planning ask (max concurrent
sessions / calls / jobs). Oracle: the naive global-window
formulation — identical values, incomparable scaling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .prefix import bucketed_running_sum


def interval_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    bucket_width: int = 3_600_000_000,
) -> DataFrame:
    """(t, concurrency) for every distinct boundary timestamp:
    the number of intervals [start, end) covering t, evaluated with
    all starts at t counted and no ends at t yet subtracted (the peak
    at that instant). ``start_col``/``end_col`` are integral (e.g.
    epoch micros); ``bucket_width`` trades bucket-relation size
    against per-bucket window width."""
    starts = df.select(F.col(start_col).alias("t"), F.lit(1).alias("d"))
    ends = df.select(F.col(end_col).alias("t"), F.lit(-1).alias("d"))
    per_ts = (
        starts.unionByName(ends)
        .groupBy("t")
        .agg(
            F.sum("d").alias("net"),
            F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).alias("n_starts"),
        )
    )
    running = bucketed_running_sum(
        per_ts, order_col="t", value_col="net", bucket_width=bucket_width
    )
    return running.select(
        "t",
        (F.col("run_before") + F.col("n_starts")).cast("long").alias(
            "concurrency"
        ),
    )
