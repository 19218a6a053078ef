"""Incremental materialized-view maintenance via re-aggregatable
partial state.

The reference rebuilds its gold tables from scratch on a weekly cron
(dbt full refresh, scotustician-db-stack.ts:354-376). At 100 TB a
full rescan per refresh is the difference between minutes and days —
the scalable pattern is a *state table* of algebraic partials
(sum/count/min/max per group) that a new data increment MERGES into,
with the user-facing view finalized from state (avg = sum/count, …).
Same family as the persisted HLL sketches (tests/test_sketches.py):
partials compose, finals don't.

- ``mv_partial``  — groupBy + the partial columns for a spec set.
- ``mv_merge``    — combine any number of state tables: union +
  re-aggregate (sum of sums/counts, min of mins, max of maxs). One
  shuffle keyed on the group columns; state size scales with group
  cardinality, never with input rows.
- ``mv_finalize`` — derive the presented columns from state.

Specs: ``{out_col: (kind, src_expr)}`` with kind in
{sum, count, min, max, avg}. ``avg`` expands to sum+count partials and
finalizes as their ratio, so merges stay exact regardless of how the
input was batched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KINDS = {"sum", "count", "min", "max", "avg"}


def _partial_cols(specs: dict[str, tuple[str, str]]) -> list[Column]:
    cols: list[Column] = []
    for out, (kind, src) in specs.items():
        assert kind in _KINDS, kind
        if kind == "sum":
            cols.append(F.sum(src).alias(f"__p_{out}_sum"))
        elif kind == "count":
            # count(*) partial is a sum-mergeable long
            cols.append(F.count(F.lit(1)).cast("long").alias(f"__p_{out}_cnt"))
        elif kind == "min":
            cols.append(F.min(src).alias(f"__p_{out}_min"))
        elif kind == "max":
            cols.append(F.max(src).alias(f"__p_{out}_max"))
        elif kind == "avg":
            cols.append(F.sum(src).alias(f"__p_{out}_sum"))
            cols.append(F.count(src).cast("long").alias(f"__p_{out}_cnt"))
    return cols


def mv_partial(
    df: DataFrame, group_cols: list[str], specs: dict[str, tuple[str, str]]
) -> DataFrame:
    """Aggregate an increment into partial state (one row per group)."""
    return df.groupBy(*group_cols).agg(*_partial_cols(specs))


def mv_merge(
    group_cols: list[str],
    specs: dict[str, tuple[str, str]],
    *states: DataFrame,
) -> DataFrame:
    """Merge state tables into one: algebraic partials re-aggregate
    exactly (no approximation, no rescan of the underlying data)."""
    assert states, "need at least one state table"
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    aggs: list[Column] = []
    for out, (kind, _src) in specs.items():
        if kind in ("sum", "avg"):
            aggs.append(F.sum(f"__p_{out}_sum").alias(f"__p_{out}_sum"))
        if kind in ("count", "avg"):
            aggs.append(F.sum(f"__p_{out}_cnt").cast("long").alias(f"__p_{out}_cnt"))
        if kind == "min":
            aggs.append(F.min(f"__p_{out}_min").alias(f"__p_{out}_min"))
        if kind == "max":
            aggs.append(F.max(f"__p_{out}_max").alias(f"__p_{out}_max"))
    return merged.groupBy(*group_cols).agg(*aggs)


def mv_finalize(
    state: DataFrame,
    group_cols: list[str],
    specs: dict[str, tuple[str, str]],
    round_avg: int | None = None,
) -> DataFrame:
    """Present the view: collapse partials to their final columns."""
    cols: list[Column] = [F.col(c) for c in group_cols]
    for out, (kind, _src) in specs.items():
        if kind == "sum":
            cols.append(F.col(f"__p_{out}_sum").alias(out))
        elif kind == "count":
            cols.append(F.col(f"__p_{out}_cnt").alias(out))
        elif kind == "min":
            cols.append(F.col(f"__p_{out}_min").alias(out))
        elif kind == "max":
            cols.append(F.col(f"__p_{out}_max").alias(out))
        elif kind == "avg":
            ratio = F.col(f"__p_{out}_sum") / F.col(f"__p_{out}_cnt")
            if round_avg is not None:
                ratio = F.round(ratio, round_avg)
            cols.append(ratio.alias(out))
    return state.select(*cols)
