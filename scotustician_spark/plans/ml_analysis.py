"""Clustering-analysis queries (SURVEY §2.8 M1-M3, §2.6 W1/W2) bound to
the driver's ``embeddings`` table, using its ``label`` column as the
(deterministic) cluster assignment so every step of the reference's
analysis — centroid, representative, neighbor top-k, cluster report —
is oracle-checkable. The seed-pinned KMeans/PCA distributed paths are
registered as weak (rows-only) checks: their outputs are
label-permutation-unstable by nature (SURVEY §7 hard #2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml import clustering as ML
from .registry import register
from .tables import load_table
from .relational import _t
from .vectors_text import _EMB_LONG


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings", normalize_ntz=False)


_CENTROID_DIST = f"""
    ex AS (SELECT vec_id, label, pos, v FROM ({_EMB_LONG})),
    cent AS (SELECT label, pos, avg(v) AS c FROM ex GROUP BY label, pos),
    dist AS (
        SELECT ex.vec_id, ex.label,
               round(sqrt(sum((ex.v - cent.c) * (ex.v - cent.c))), 6) AS d
        FROM ex JOIN cent ON ex.label = cent.label AND ex.pos = cent.pos
        GROUP BY ex.vec_id, ex.label)
"""


@register(
    "cluster_representatives",
    f"""
    WITH {_CENTROID_DIST}
    SELECT label AS cluster, vec_id AS representative_id, d AS representative_dist
    FROM (SELECT *, row_number() OVER (PARTITION BY label ORDER BY d, vec_id) AS rn
          FROM dist)
    WHERE rn = 1
    """,
    doc="W1 representative selection (clustering/helpers.py:177-183): "
    "member closest to its cluster centroid; centroid via per-dim "
    "aggregation, argmin via min(struct) with deterministic id tiebreak; "
    "centroid side broadcast.",
)
def cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    return ML.representatives(e, "vec_id", "embedding", cluster_col="label").select(
        F.col("label").alias("cluster"), "representative_id", "representative_dist"
    )


@register(
    "cluster_topk_neighbors",
    f"""
    WITH {_CENTROID_DIST},
    reps AS (
        SELECT label, vec_id AS rep_id
        FROM (SELECT *, row_number() OVER (PARTITION BY label ORDER BY d, vec_id) AS rn
              FROM dist)
        WHERE rn = 1),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM ex GROUP BY vec_id),
    dots AS (
        SELECT m.label, r.rep_id, m.vec_id,
               sum(m.v * x.v) AS dot
        FROM ex m
        JOIN reps r ON m.label = r.label
        JOIN ex x ON x.vec_id = r.rep_id AND x.pos = m.pos
        WHERE m.vec_id <> r.rep_id
        GROUP BY m.label, r.rep_id, m.vec_id),
    scored AS (
        SELECT d.label AS cluster, d.rep_id AS representative_id,
               d.vec_id AS neighbor_id,
               round(d.dot / (nm.nrm * nr.nrm), 6) AS sim
        FROM dots d
        JOIN norms nm ON d.vec_id = nm.vec_id
        JOIN norms nr ON d.rep_id = nr.vec_id)
    SELECT cluster, representative_id, neighbor_id, sim,
           CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY cluster
                                       ORDER BY sim DESC, neighbor_id) AS rnk
          FROM scored)
    WHERE rnk <= 5
    """,
    doc="W2 top-5 cosine neighbors of each cluster representative "
    "(clustering/helpers.py:185-226): representative table broadcast, "
    "each member scored exactly once — no within-cluster cartesian.",
    bench=True,
)
def cluster_topk_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    return ML.topk_neighbors(e, "vec_id", "embedding", k=5, cluster_col="label").select(
        F.col("label").alias("cluster"),
        "representative_id",
        "neighbor_id",
        "sim",
        "rnk",
    )


@register(
    "cluster_stats",
    f"""
    WITH ex AS (SELECT vec_id, label, pos, v FROM ({_EMB_LONG})),
    norms AS (SELECT vec_id, label, sqrt(sum(v * v)) AS nrm
              FROM ex GROUP BY vec_id, label)
    SELECT label AS cluster,
           CAST(count(*) AS BIGINT) AS n_members,
           round(avg(nrm), 6) AS avg_norm
    FROM norms GROUP BY label
    """,
    doc="A9/A11 cluster stats: sizes + mean member norm per cluster.",
)
def cluster_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    return ML.cluster_stats(e, "embedding", cluster_col="label").select(
        F.col("label").alias("cluster"), "n_members", "avg_norm"
    )


@register(
    "kmeans_cluster_sizes",
    None,  # label ids are init/partitioning-dependent → rows-only check
    doc="M2 distributed clustering path: seed-pinned MLlib KMeans over "
    "the embedding column; output is the size distribution (cluster "
    "labels are arbitrary, sizes are the stable invariant).",
)
def kmeans_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    assigned = ML.kmeans_assign(e, "embedding", k=8, seed=42)
    return (
        assigned.groupBy("cluster")
        .count()
        .select("cluster", F.col("count").cast("bigint").alias("n_members"))
    )


@register(
    "pca_projection",
    None,  # eigenvector sign/rotation is implementation-defined → rows-only
    doc="M1 distributed 2-D projection path (t-SNE stand-in): MLlib PCA "
    "to (x, y) per vector; scaled first (StandardScaler) as the "
    "reference does (clustering/helpers.py:103-104).",
)
def pca_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    scaled = ML.standard_scale(e, "embedding")
    return ML.pca_project_2d(scaled, "scaled").select(
        "vec_id", "label", F.round("x", 6).alias("x"), F.round("y", 6).alias("y")
    )


@register(
    "cluster_report",
    None,  # JSON string layout is engine-specific → rows-only check
    doc="M3 per-cluster analysis report: representative + ordered "
    "neighbor list + stats as one JSON document per cluster "
    "(clustering/helpers.py:261-315 export shape).",
)
def cluster_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    return ML.analysis_report(e, "vec_id", "embedding", k=5, cluster_col="label").select(
        F.col("label").alias("cluster"), "report_json"
    )


@register(
    "als_recommendations",
    None,  # factor values are BLAS/platform-dependent → rows-only check
    doc="Distributed collaborative filtering: MLlib ALS (implicit "
    "preferences, seed-pinned) over customer x part interaction "
    "strengths from lineitem quantities; top-5 parts per customer for "
    "a fixed probe set of 20 customers. Matrix factorization as "
    "block-joined shuffle stages - no driver-side matrix; the "
    "recommend step is a per-user top-k over the factor join.",
)
def als_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    ratings = (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").cast("int").alias("user"),
            F.col("l_partkey").cast("int").alias("item"),
        )
        .agg(F.sum("l_quantity").cast("float").alias("strength"))
    )
    recs = ML.als_recommend(ratings, "user", "item", "strength", k=5)
    return recs.filter(F.col("user") < 20).select(
        "user", "item", F.col("score").cast("double").alias("score")
    )
