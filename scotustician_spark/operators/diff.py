"""Snapshot reconciliation (table diff) with a narrow-shuffle compare.

Auditing two snapshots of a keyed table ("what changed between
yesterday's export and today's?") naively full-outer-joins the full
row width of both sides — at 100 TB that shuffles every byte twice.
The scalable plan ships (key, fingerprint) through the join instead:

1. each side projects to its key columns plus ONE 8-byte ``xxhash64``
   over the compared columns (computed scan-side, inside codegen —
   the shuffle carries key + 8 bytes per row, independent of row
   width);
2. a full outer join on the key classifies every key as ``added``
   (base-side null), ``removed`` (current-side null), ``changed``
   (both present, fingerprints differ) or unchanged (dropped);
3. callers needing the changed payloads semi-join the (small) changed
   key set back to the snapshots — only the delta sliver ever moves
   at full width.

Both snapshots hash with the SAME engine, so the comparison is exact
up to a 2⁻⁶⁴ collision masquerading as "unchanged" (the standard
trade every checksum-based reconciler makes; a 128-bit hash halves
throughput and is the knob to turn if that matters). The DuckDB
oracle compares columns directly (``IS DISTINCT FROM``) — agreement
of the two formulations is itself evidence no collision fired.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    base: DataFrame,
    current: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(key_cols…, change_type) for every key that differs between the
    two snapshots; unchanged keys are dropped. ``compare_cols``
    defaults to all non-key columns (must exist on both sides).

    Contract: ``key_cols`` must uniquely identify rows on each side (a
    duplicated key fans the full-outer join out m×n — reconcile at the
    keyed grain, or pre-aggregate). NULL key components match via
    null-safe equality; NULLs in compared columns hash determinate
    values, so NULL→value flips classify as ``changed``."""
    if compare_cols is None:
        compare_cols = [c for c in base.columns if c not in key_cols]

    def fp() -> F.Column:
        if not compare_cols:
            # key-only reconciliation: membership diff, no value compare
            return F.lit(0).cast("long")
        # xxhash64 SKIPS null arguments, so ('a', NULL) and (NULL, 'a')
        # would collide as "unchanged"; interleaving each column with
        # its never-null isnull flag keeps positions distinct
        parts: list[F.Column] = []
        for col in compare_cols:
            parts.append(F.col(col))
            parts.append(F.isnull(col))
        return F.xxhash64(*parts)

    b = base.select(
        *[F.col(k).alias(f"_bk_{k}") for k in key_cols],
        fp().alias("_b_fp"),
    )
    c = current.select(
        *[F.col(k).alias(f"_ck_{k}") for k in key_cols],
        fp().alias("_c_fp"),
    )
    cond = [b[f"_bk_{k}"].eqNullSafe(c[f"_ck_{k}"]) for k in key_cols]
    joined = b.join(c, cond, "full_outer")
    change = (
        F.when(b["_b_fp"].isNull(), F.lit("added"))
        .when(c["_c_fp"].isNull(), F.lit("removed"))
        .when(b["_b_fp"] != c["_c_fp"], F.lit("changed"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(b[f"_bk_{k}"], c[f"_ck_{k}"]).alias(k)
                for k in key_cols
            ],
            "change_type",
        )
    )
