"""Blocked fuzzy matching (entity resolution primitives).

Edit-distance self-joins are O(n²) unless candidates are bounded by a
BLOCKING KEY — the standard entity-resolution move: compare only rows
sharing a cheap deterministic key chosen so that true matches almost
always collide (here: same length band + shared prefix; swap in
phonetic keys or q-gram LSH for messier data). The comparison itself
(``levenshtein``) runs JVM-side inside the joined sliver only.

Scale contract: the shuffle is an equi-join keyed on the block, and
pair expansion is quadratic ONLY in block size — the blocking key's
selectivity is the knob, exactly like bucket sparsity in LSH dedup
(operators/dedup.py). The reference has no fuzzy matching; any
pipeline consolidating near-identical speaker/case names needs it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_expr: Column,
    max_distance: int = 1,
) -> DataFrame:
    """All (id_a, id_b, name_a, name_b, distance) pairs with
    levenshtein(name_a, name_b) <= max_distance among rows sharing
    ``block_expr``. a < b by id; exact-equal names are reported too
    (distance 0) — filter afterwards if only near-misses matter.

    Uses a plain self-equi-join on the block key rather than the
    in-row bucket expansion of dedup.py: names ride the shuffle
    anyway (the distance needs them), so there is nothing to save by
    collecting buckets, and the join keeps whole-stage codegen for
    the levenshtein filter.
    """
    sides = df.select(
        F.col(id_col).alias("__id"),
        F.col(name_col).alias("__name"),
        block_expr.alias("__block"),
    )
    a = sides.select(
        F.col("__id").alias("id_a"),
        F.col("__name").alias("name_a"),
        "__block",
    )
    b = sides.select(
        F.col("__id").alias("id_b"),
        F.col("__name").alias("name_b"),
        "__block",
    )
    return (
        a.join(b, "__block")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "name_a", "name_b", "distance")
    )


def length_prefix_block(name_col: str, prefix_len: int = 4) -> Column:
    """Default blocking key: (length, prefix). Two strings within edit
    distance d differ in length by at most d — pair a band of widths
    with a shared prefix. NOTE: a pure (length, prefix) key misses
    pairs whose edit touches the first ``prefix_len`` chars or changes
    the length band; production blocking unions several keys (prefix,
    suffix, phonetic). Kept single-key here for a deterministic
    oracle."""
    c = F.col(name_col)
    return F.concat_ws(
        "|", F.length(c).cast("string"), F.substring(c, 1, prefix_len)
    )
