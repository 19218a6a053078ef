"""Mergeable quantile state: fixed-bin histograms as re-aggregatable
partials.

Exact quantiles need a sort (or a full multiset) per group — neither
merges. The scalable warehouse pattern is sketched quantiles whose
PARTIAL STATE is algebraic: here an equal-width histogram (``n_bins``
long counters per group), the simplest member of the mergeable-
quantile family (t-digest / KLL are the adaptive cousins — same
lifecycle, tighter error). Completes the incremental-MV story
(operators/mv.py: sum/count/min/max/avg; sketches: HLL distinct) with
percentiles:

- ``quantile_partial``  — one groupBy pass over an increment; state is
  ``n_bins`` plain LONG columns, so merging is column-wise SUM — the
  exact mv.py discipline, pure codegen, no custom serde;
- ``quantile_merge``    — union + sum per bin; associative and
  commutative, so batches land in any order;
- ``quantile_finalize`` — step-function estimate per requested q: the
  lower edge of the first bin whose cumulative count reaches
  ceil(q·n). Deterministic integer arithmetic → reproducible in any
  SQL engine (the oracle applies the same rule to its own bin
  counts). Error is bounded by one bin width; narrow the bins (state
  is still O(n_bins) per group) or switch the finalizer to in-bin
  interpolation when the bin populations are known dense.

Values outside [lo, hi) clamp into the edge bins — at 100 TB the
[lo, hi) envelope comes from a cheap stats pass or domain knowledge,
and clamping (not dropping) keeps n consistent with count(*).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(value_col: str, lo: float, hi: float, n_bins: int) -> Column:
    width = (hi - lo) / n_bins
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int")
    return F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), raw))


def quantile_partial(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """Histogram partial state: one row per group, ``n_bins`` long
    counter columns ``__q_b{i}``. Single partial-aggregated pass (the
    conditional-count fan-out stays map-side)."""
    b = _bucket(value_col, lo, hi, n_bins)
    df = df.filter(F.col(value_col).isNotNull()).withColumn("__q_bucket", b)
    return df.groupBy(*group_cols).agg(
        *[
            F.count(F.when(F.col("__q_bucket") == i, 1)).alias(f"__q_b{i}")
            for i in range(n_bins)
        ]
    )


def quantile_merge(
    group_cols: list[str], n_bins: int, *states: DataFrame
) -> DataFrame:
    """Merge any number of partial states: union + column-wise sum.
    One shuffle keyed on the group columns; state never grows with
    input rows."""
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return u.groupBy(*group_cols).agg(
        *[F.sum(f"__q_b{i}").alias(f"__q_b{i}") for i in range(n_bins)]
    )


def quantile_finalize(
    state: DataFrame,
    group_cols: list[str],
    qs: dict[str, float],
    lo: float,
    hi: float,
    n_bins: int = 64,
    interpolate: bool = False,
) -> DataFrame:
    """(group_cols, n, <name> per q): step-function quantile = lower
    edge of the first bin whose cumulative count >= ceil(q·n).

    ``interpolate=True`` refines within the bin assuming uniform
    density — est = edge + width·(target − cum_before)/bin_count —
    cutting worst-case error from one bin width to the deviation from
    in-bin uniformity. Kept OFF for the oracle-gated query (the step
    rule is pure integer arithmetic; interpolation divides and so
    reintroduces float-rounding surface across engines)."""
    width = (hi - lo) / n_bins
    arr = F.array(*[F.col(f"__q_b{i}") for i in range(n_bins)])
    n = F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + x)
    # cumulative counts (n_bins is small — the quadratic slice/sum is
    # a few thousand codegen-free ops on ONE row per group)
    cums = F.transform(
        F.sequence(F.lit(0), F.lit(n_bins - 1)),
        lambda i: F.aggregate(
            F.slice(F.col("__q_arr"), 1, i + 1),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
    )
    out = state.withColumn("__q_arr", arr).withColumn("__q_n", n).withColumn(
        "__q_cums", cums
    )
    cols = [*group_cols, F.col("__q_n").alias("n")]
    for name, q in qs.items():
        target = F.ceil(F.lit(q) * F.col("__q_n")).cast("long")
        idx = F.size(F.filter(F.col("__q_cums"), lambda c: c < target))
        edge = F.lit(lo) + F.lit(width) * idx
        if interpolate:
            cum_before = F.when(idx > 0, F.element_at("__q_cums", idx)).otherwise(
                F.lit(0).cast("long")
            )
            bin_count = F.element_at("__q_arr", idx + 1)
            frac = F.when(
                bin_count > 0,
                (target - cum_before).cast("double") / bin_count.cast("double"),
            ).otherwise(F.lit(0.0))
            cols.append((edge + F.lit(width) * frac).alias(name))
        else:
            cols.append(edge.alias(name))
    return out.select(*cols)
