"""Sweep-line interval analytics: peak concurrency without an
interval self-join and without a global single-partition window.

"How many intervals overlap at time t" is classically answered either
by an interval self-join (quadratic in overlap density) or by a
running sum over ALL boundary events ordered globally (one partition
holds the whole table). The scalable exact plan:

1. explode each interval into two boundary deltas (+1 at start, -1 at
   end) and AGGREGATE PER DISTINCT TIMESTAMP (net delta + start
   count) — a map-side-combinable groupBy that makes tie ORDER a
   non-issue; tie SEMANTICS is an explicit parameter (see
   ``interval_concurrency``): the instantaneous reading evaluates
   after all starts at a timestamp and before its ends, the
   half-open reading subtracts ends at t first — they differ exactly
   on back-to-back intervals (end == next start);
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
    semantics: str = "instant",
) -> DataFrame:
    """(t, concurrency) for every distinct boundary timestamp.

    ``semantics`` picks the tie rule at timestamps where ends meet
    starts (they differ EXACTLY on back-to-back intervals,
    end == next start — a round-7 review caught the old docstring
    claiming both at once):

    - ``"instant"`` (default): all starts at t counted, no ends at t
      subtracted — the capacity needed AT the instant of handover
      (a session ending at t and one starting at t briefly coexist:
      [0,1) then [1,2) reads 2 at t=1). This is the reading the
      registered oracle replays.
    - ``"half-open"``: intervals are [start, end) sets — an interval
      ending at t does NOT cover t ([0,1) then [1,2) reads 1 at t=1);
      concurrency(t) = run_before + net(t).

    Rows with a NULL start or end are dropped (an undefined boundary
    is not an interval): unfiltered, the NULL would bucket into a
    NULL prefix group that Spark's nulls-first ordering places before
    every real bucket, leaking its -1/+1 into every carry-in.

    ``start_col``/``end_col`` are integral (e.g. epoch micros);
    ``bucket_width`` trades bucket-relation size against per-bucket
    window width."""
    if semantics not in ("instant", "half-open"):
        raise ValueError(
            f"semantics must be 'instant' or 'half-open', got {semantics!r}"
        )
    iv = df.filter(
        F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
    )
    # in-row boundary doubling (the symmetrize discipline): a
    # starts/ends self-union read the interval source TWICE — the r10
    # plan audit showed 4 scans of the events parquet for this one
    # operator (2 per union × 2 prefix-sum consumers). The explode
    # emits both deltas from one evaluation.
    per_ts = (
        iv.select(
            F.explode(
                F.array(
                    F.struct(F.col(start_col).alias("t"), F.lit(1).alias("d")),
                    F.struct(F.col(end_col).alias("t"), F.lit(-1).alias("d")),
                )
            ).alias("b")
        )
        .select("b.t", "b.d")
        .groupBy("t")
        .agg(
            F.sum("d").alias("net"),
            F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).alias("n_starts"),
        )
    )
    running = bucketed_running_sum(
        per_ts, order_col="t", value_col="net", bucket_width=bucket_width
    )
    at_t = (
        F.col("n_starts") if semantics == "instant" else F.col("net")
    )
    return running.select(
        "t",
        (F.col("run_before") + at_t).cast("long").alias("concurrency"),
    )
