"""2-D skyline (Pareto frontier) as a two-phase aggregate — no
quadratic dominance self-join.

The textbook formulation (keep rows not dominated by any other row —
``NOT EXISTS`` over a theta self-join) is O(n²) per group and
un-shuffleable at corpus scale. For the 2-D case (minimize one
attribute, maximize the other) dominance has a total-order structure
the plan can exploit exactly:

1. collapse to one row per (group, max-attr) carrying the group-local
   best (minimum) of the min-attr — a map-side-combinable groupBy
   whose output is bounded by the max-attr cardinality, not the row
   count;
2. over that collapsed relation, a per-group window ordered by
   max-attr DESC computes the best min-attr among *strictly larger*
   max values (``min() OVER (… ROWS UNBOUNDED PRECEDING TO 1
   PRECEDING)`` — one row per max level, so "1 preceding" is exactly
   "strictly larger");
3. a (group, max-attr) level survives iff nothing strictly above it
   is as-cheap-or-cheaper; original rows survive iff they sit at
   their level's best min-attr AND their level survives — a
   broadcast-sized join back to the fact rows.

Beyond-reference (SURVEY §2 has no dominance queries): the standard
"efficient frontier" ask over any price/quality trade-off table.
Oracle: the naive NOT EXISTS dominance formulation — identical rows,
incomparable scaling.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

# session -> {(plan semantic hash, key cols): measured level_bytes}.
# The auto-gate's sizing probe is an eager job over df; composing
# skyline_2d repeatedly over the same input (or explain-only paths
# that re-construct the DataFrame) must not pay it per call (round-8
# advice). semanticHash keys on the ANALYZED plan: repeat calls on the
# same DataFrame hit (incl. every load_table-memoized relation — one
# object per path), while a from-scratch rebuild of an in-memory
# relation re-probes (its relation identity differs). The estimate is
# advisory sizing only, so a (vanishingly unlikely) hash collision
# risks a mis-hint, never wrong rows.
_PROBE_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def skyline_2d(
    df: DataFrame,
    group_cols: list[str],
    min_col: str,
    max_col: str,
    broadcast: bool | str = "auto",
) -> DataFrame:
    """Rows of ``df`` on the per-group Pareto frontier: no other row in
    the same group has ``min_col`` <= and ``max_col`` >= with at least
    one strict inequality. Duplicates of a surviving (min, max) point
    all survive (neither dominates the other).

    Contract: rows with a NULL ``min_col`` or ``max_col`` are EXCLUDED
    from the frontier (the level aggregation and join-back drop them).
    Note this intentionally diverges from a naive SQL ``NOT EXISTS``
    dominance query, which would vacuously KEEP null-attributed rows
    (no dominator is provable against NULL) — an undominated-by-
    ignorance row is not a frontier point. Filter or impute NULLs
    first if they must participate.

    ``broadcast``: ``"auto"`` (default) gates the join-back broadcast
    hint on an estimate of the frontier size. When ``df``'s own plan
    stats exceed the broadcast threshold, that estimate costs ONE
    EAGER column-pruned aggregation job over ``df`` at call time —
    measured level count × measured avg key widths. For an input with
    heavy upstream lineage (the probe replays it) or when you already
    know the frontier's size, pin ``broadcast=True``/``False`` and no
    probe job runs."""
    levels = df.groupBy(*group_cols, max_col).agg(
        F.min(min_col).alias("_lvl_best")
    )
    above = W.partitionBy(*group_cols).orderBy(F.col(max_col).desc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    survivors = (
        levels.withColumn("_best_above", F.min("_lvl_best").over(above))
        # dominated by a strictly-larger max level with min <= ours
        .filter(
            F.col("_best_above").isNull()
            | (F.col("_best_above") > F.col("_lvl_best"))
        )
        .select(*group_cols, max_col, "_lvl_best")
    )
    # surviving levels are bounded by the (group × max-attr) cardinality
    # — usually tiny, so broadcast them and the fact side never shuffles
    # for the join-back (measured: un-hinted, Catalyst shuffled both
    # sides). But that cardinality is NOT bounded by construction (a
    # continuous max_col can leave ~one level per row), so the hint is
    # gated on an estimate of the LEVEL count. The estimate must not
    # come from plan stats of the windowed survivors relation: without
    # CBO, Catalyst's default aggregate/window sizeInBytes propagates
    # the child SCAN size, so on any large fact the gate would never
    # fire — silently degrading to a two-sided shuffle in exactly the
    # cases the hint exists for (round-8 review finding). Instead:
    # a small input (by plan stats) broadcasts outright with no extra
    # job; a large one pays ONE column-pruned pass over (group, max) —
    # an HLL count-distinct PLUS measured avg byte widths of the key
    # columns (a fixed per-column constant under-counts wide-string
    # keys and would force-broadcast a 100 MB frontier), with a 1.25
    # margin absorbing the HLL's ~5% under-count.
    from pyspark.sql.types import ArrayType, MapType, StringType, StructType

    from .bloom import BROADCAST_THRESHOLD_BYTES, plan_size_bytes

    if broadcast is True:
        survivors = F.broadcast(survivors)
    elif broadcast == "auto":
        if plan_size_bytes(df) <= BROADCAST_THRESHOLD_BYTES:
            survivors = F.broadcast(survivors)
        else:
            key_cols = [*group_cols, max_col]
            cache = _PROBE_CACHE.setdefault(df.sparkSession, {})
            cache_key = (df.semanticHash(), tuple(key_cols))
            level_bytes = cache.get(cache_key)
            if level_bytes is None:
                dtypes = dict(zip(df.schema.names, df.schema.fields))

                def _width(c: str, i: int):
                    t = dtypes[c].dataType
                    if isinstance(t, StringType):
                        return F.avg(F.octet_length(F.col(c))).alias(f"__w{i}")
                    if isinstance(t, (ArrayType, StructType, MapType)):
                        # a flat constant wildly under-counts composite
                        # keys (an embedding-array group key is KBs per
                        # row) and would force-broadcast an oversized
                        # frontier — the driver-OOM case the gate
                        # exists to prevent (round-8 advice). Measure
                        # the real serialized width instead.
                        return F.avg(
                            F.octet_length(F.to_json(F.struct(F.col(c))))
                        ).alias(f"__w{i}")
                    return F.lit(8.0).alias(f"__w{i}")

                width_aggs = [_width(c, i) for i, c in enumerate(key_cols)]
                probe = df.agg(
                    F.approx_count_distinct(F.struct(*key_cols)).alias("n"),
                    *width_aggs,
                ).collect()[0]
                row_bytes = sum(
                    (probe[f"__w{i}"] or 0.0) + 16.0
                    for i in range(len(key_cols))
                ) + 8.0  # + _lvl_best
                level_bytes = 1.25 * (probe["n"] or 0) * row_bytes
                cache[cache_key] = level_bytes
            if level_bytes <= BROADCAST_THRESHOLD_BYTES:
                survivors = F.broadcast(survivors)
    return (
        df.join(survivors, [*group_cols, max_col])
        .filter(F.col(min_col) == F.col("_lvl_best"))
        .drop("_lvl_best")
    )
