"""Vector column functions over ``array<float|double>`` columns.

The reference stores 1024-d pgvector columns and relies on pgvector's
elementwise ``+``/``*`` operator overloads and ``<=>`` cosine distance
(services/clustering/helpers.py:30,191-192). Here every vector op is a
Catalyst higher-order function (``zip_with``/``aggregate``/
``transform``) — JVM-side, codegen'd, no Python in the hot path — so
vector math scales with the scan instead of bottlenecking on UDF serde.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length array columns (JVM HOF, no UDF).

    Elements are widened to float64 BEFORE multiplying so float32
    storage doesn't change the math (pgvector accumulates in float; we
    deliberately upgrade — SURVEY §7 'what's hard' #1 wants float64
    accumulation)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cosine(a,b) = dot/(|a||b|) — the reference's similarity metric
    (clustering/helpers.py:191-192). The denominator is nullif-guarded:
    a zero vector has no direction, so its similarity is NULL (which
    desc-ranking orders last) — under Spark 4's default ANSI mode an
    unguarded 0/0 would instead abort the whole job on the first
    all-zeros embedding (empty chunk, padding row)."""
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    # widen BEFORE subtracting/squaring (the module's float64
    # discipline, same as dot/l2_norm): float32 storage would round
    # each squared difference to float32 before the double accumulator
    # sees it, drifting from the oracle's all-double arithmetic
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a,
                b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def scale(a: Column | str, s: Column) -> Column:
    """Elementwise vector * scalar (pgvector ``vector * w`` analog)."""
    a = F.col(a) if isinstance(a, str) else a
    return F.transform(a, lambda x: x * s)


def add(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.zip_with(a, b, lambda x, y: x + y)


def normalize(a: Column | str) -> Column:
    """Unit-normalize; pre-normalizing lets cosine top-k degrade to a
    plain dot product (one HOF instead of three per pair)."""
    a = F.col(a) if isinstance(a, str) else a
    n = F.nullif(l2_norm(a), F.lit(0.0))  # zero vector -> NULL, not ANSI 0/0
    return F.transform(a, lambda x: x / n)


def assert_dim(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Reject vectors whose length differs from the declared dimension —
    the reference hard-fails on this (helpers.py:306-307). Returns the
    conforming rows; caller may count the complement as a quality gate.
    """
    return df.filter(F.size(F.col(vec_col)) == dim)


def weighted_mean_vectors(
    df: DataFrame,
    group_cols: list[str],
    vec_col: str,
    weight_col: str,
    out_col: str = "mean_vec",
) -> DataFrame:
    """The reference's signature aggregate: ``SUM(vector * w) / SUM(w)``
    elementwise per group (clustering/helpers.py:30, pgvector overloads).

    Spark-first plan: posexplode the vector, aggregate per (group, pos)
    — a single shuffle keyed on (group, pos), partial aggregation
    map-side — then reassemble with an order-guaranteed
    ``array_agg(struct(pos, val))`` sort. At 100 TB this scales because
    the shuffle key space is |groups| × dim and each reducer holds one
    scalar accumulator, never a whole vector.

    Accumulation is float64 for pgvector bit-faithfulness (SURVEY §7
    'what's hard' #1).
    """
    w = F.col(weight_col).cast("double")
    exploded = df.select(
        *group_cols,
        w.alias("__w"),
        F.posexplode(F.col(vec_col)).alias("__pos", "__v"),
    )
    per_dim = exploded.groupBy(*group_cols, "__pos").agg(
        (
            F.sum(F.col("__v").cast("double") * F.col("__w"))
            / F.nullif(F.sum("__w"), F.lit(0.0))  # zero total weight -> NULL
        ).alias("__m")
    )
    return (
        per_dim.groupBy(*group_cols)
        .agg(
            F.array_sort(F.collect_list(F.struct("__pos", "__m"))).alias("__pairs")
        )
        .select(
            *group_cols,
            F.transform(F.col("__pairs"), lambda p: p["__m"]).alias(out_col),
        )
    )


def pooled_vectors(
    df: DataFrame,
    group_cols: list[str],
    vec_col: str,
    normalize: bool = True,
) -> DataFrame:
    """Per-group embedding pooling — the aggregation family under
    chunk→document and document→cluster embedding rollups
    (weighted_mean_vectors is the weighted-mean member; this adds
    elementwise MAX pooling and the L2-normalized mean, the two other
    standard reducers):

    - ``max_vec``  — elementwise max (feature-presence pooling)
    - ``mean_vec`` — elementwise mean
    - ``unit_mean_vec`` — mean scaled to unit L2 norm (the centroid
      DIRECTION — what cosine retrieval actually compares against)

    Same scale shape as weighted_mean_vectors: posexplode → one
    shuffle keyed (group, pos) with scalar accumulators → ordered
    reassembly; the normalizer is one tiny per-group reduction over
    the already-aggregated means.
    """
    exploded = df.select(
        *group_cols, F.posexplode(F.col(vec_col)).alias("__pos", "__v")
    ).withColumn("__v", F.col("__v").cast("double"))
    per_dim = exploded.groupBy(*group_cols, "__pos").agg(
        F.max("__v").alias("__mx"), F.avg("__v").alias("__mv")
    )
    wide = (
        per_dim.groupBy(*group_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__pos", "__mx", "__mv"))
            ).alias("__p")
        )
        .select(
            *group_cols,
            F.transform(F.col("__p"), lambda p: p["__mx"]).alias("max_vec"),
            F.transform(F.col("__p"), lambda p: p["__mv"]).alias("mean_vec"),
        )
    )
    if not normalize:
        return wide
    nrm = F.sqrt(
        F.aggregate(
            F.col("mean_vec"), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    return wide.withColumn(
        "unit_mean_vec",
        F.transform(F.col("mean_vec"), lambda x: x / F.nullif(nrm, F.lit(0.0))),
    )
