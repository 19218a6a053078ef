"""Clustering-analysis queries (SURVEY §2.8 M1-M3, §2.6 W1/W2) bound to
the driver's ``embeddings`` table, using its ``label`` column as the
(deterministic) cluster assignment so every step of the reference's
analysis — centroid, representative, neighbor top-k, cluster report —
is oracle-checkable.

Round 6 converted the formerly rows-only ML rows to value oracles via
deterministic twins: ``kmeans_cluster_sizes`` (3-step Lloyd,
``lloyd_ctes``), ``pca_projection`` (fixed-step power iteration),
``cluster_report`` (JSON parse-back to engine-neutral values). The
seed-pinned MLlib KMeans/PCA arms stay covered by
tests/test_ml_clustering.py — their label ids / eigen signs are
engine-specific by nature (SURVEY §7 hard #2). Round 7 gave
``als_recommendations`` — the last rows-only row — a full value
oracle by persisting the fitted factor tables and recomputing
score/top-k from them on both engines (factor values become
comparison inputs, not outputs).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml import clustering as ML
from .registry import register
from .tables import _REL_CACHE_ROOT, load_table, persisted_relation
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


def lloyd_ctes(n_cells: int, n_iters: int, r: int = 6) -> str:
    """CTE chain replaying ``operators.similarity.lloyd_assignments``
    on any SQL engine: lowest-id seeds, ``n_iters`` rounds of
    (rounded-distance argmin, per-(cell,pos) mean re-center), final
    assignment ``afin(vec_id, cell)`` against ``c{n_iters}`` with its
    distances in ``dfin``. The multi-step extension of the proven
    one-step recurrence in ``_ivf_oracle``/``_semantic_dedup_oracle``."""
    parts = [
        """ex AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings)""",
        f"""seeds AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, vec_id
        FROM (SELECT DISTINCT vec_id FROM embeddings ORDER BY vec_id LIMIT {n_cells}))""",
        """c0 AS (
        SELECT s.cell, e.pos, e.v AS m
        FROM seeds s JOIN ex e ON e.vec_id = s.vec_id)""",
    ]
    for t in range(1, n_iters + 1):
        parts += [
            f"""d{t} AS (
        SELECT e.vec_id, c.cell, round(sum((e.v - c.m) * (e.v - c.m)), {r}) AS d2r
        FROM ex e JOIN c{t - 1} c ON c.pos = e.pos
        GROUP BY e.vec_id, c.cell)""",
            f"""a{t} AS (
        SELECT vec_id, cell FROM (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d2r, cell) AS rr
            FROM d{t}) WHERE rr = 1)""",
            f"""c{t} AS (
        SELECT a.cell, e.pos, avg(e.v) AS m
        FROM ex e JOIN a{t} a USING (vec_id) GROUP BY a.cell, e.pos)""",
        ]
    parts += [
        f"""dfin AS (
        SELECT e.vec_id, c.cell, round(sum((e.v - c.m) * (e.v - c.m)), {r}) AS d2r
        FROM ex e JOIN c{n_iters} c ON c.pos = e.pos
        GROUP BY e.vec_id, c.cell)""",
        """afin AS (
        SELECT vec_id, cell FROM (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d2r, cell) AS rr
            FROM dfin) WHERE rr = 1)""",
    ]
    return ",\n    ".join(parts)


@register(
    "kmeans_cluster_sizes",
    f"""
    WITH {lloyd_ctes(8, 3)}
    SELECT CAST(cell AS INTEGER) AS cluster,
           CAST(count(*) AS BIGINT) AS n_members
    FROM afin GROUP BY cell
    """,
    doc="M2 distributed clustering path, VALUE-ORACLE-GATED (round 6; "
    "was rows-only): a deterministic 3-step Lloyd k-means "
    "(operators/similarity.py::lloyd_assignments — lowest-id seeds, "
    "rounded-distance argmin, per-dim mean re-center, every round "
    "replayable in SQL) over the embedding column; output is cluster "
    "sizes. Each round broadcasts the k-row centroid table and "
    "partial-aggregates map-side — no corpus shuffle, so rounds cost "
    "one corpus scan each at any scale. The seed-pinned MLlib KMeans "
    "arm (ml/clustering.py::kmeans_assign) stays covered by "
    "tests/test_ml_clustering.py (labels are init-dependent, so it "
    "cannot carry a cross-engine value oracle).",
)
def kmeans_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import lloyd_assignments

    e = _emb(spark, sf_dir)
    c = e.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("c_vec"))
    assigned, _ = lloyd_assignments(c, n_cells=8, n_iters=3)
    return (
        assigned.groupBy(F.col("cell").cast("int").alias("cluster"))
        .agg(F.count("*").cast("bigint").alias("n_members"))
    )


def _power_pca_oracle(n_iters: int = 8, r: int = 6) -> str:
    """Replays ``ml.clustering.power_pca_2d`` CTE-for-stage: z-score →
    rounded Gramian → two unrolled ``n_iters``-step power iterations
    (exact matvec, round only the normalized vector — a matvec over
    rounded inputs is grid-aligned and lands exactly on rounding
    midpoints, see power_pca_2d's rounding-discipline note) with
    rank-1 deflation between them → rounded 2-D projection."""

    def _iter(t: int, vp: str, gsrc: str, pre: str) -> list[str]:
        return [
            f"""{pre}w{t} AS MATERIALIZED (
        SELECT g.i, sum(g.c * v.vv) AS w
        FROM {gsrc} g JOIN {vp} v ON g.j = v.i GROUP BY g.i)""",
            f"""{pre}n{t} AS MATERIALIZED (SELECT sqrt(sum(w * w)) AS nrm FROM {pre}w{t})""",
            f"""{pre}v{t} AS MATERIALIZED (
        SELECT i, round(coalesce(
            w / nullif((SELECT nrm FROM {pre}n{t}), 0), 0.0), {r}) AS vv
        FROM {pre}w{t})""",
        ]

    parts = [
        """ex AS MATERIALIZED (
        SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings)""",
        """nd AS MATERIALIZED (SELECT CAST(count(DISTINCT vec_id) AS DOUBLE) AS n,
                 CAST(count(DISTINCT pos) AS DOUBLE) AS d FROM ex)""",
        """st AS MATERIALIZED (SELECT pos, avg(v) AS mu, stddev_samp(v) AS sd
              FROM ex GROUP BY pos)""",
        """z AS MATERIALIZED (SELECT e.vec_id, e.label, e.pos,
                coalesce((e.v - st.mu) / nullif(st.sd, 0), 0.0) AS z
         FROM ex e JOIN st USING (pos))""",
        f"""g AS MATERIALIZED (SELECT a.pos AS i, b.pos AS j,
                round(sum(a.z * b.z) / ((SELECT n FROM nd) - 1), {r}) AS c
         FROM z a JOIN z b ON a.vec_id = b.vec_id GROUP BY 1, 2)""",
        f"""v0 AS MATERIALIZED (SELECT i, round(1.0 / sqrt((SELECT d FROM nd)), {r}) AS vv
          FROM (SELECT DISTINCT i FROM g))""",
    ]
    for t in range(1, n_iters + 1):
        parts += _iter(t, f"v{t - 1}", "g", "")
    vt = f"v{n_iters}"
    parts += [
        f"""lam AS MATERIALIZED (
        SELECT round(sum(va.vv * g.c * vb.vv), {r}) AS l
        FROM g JOIN {vt} va ON va.i = g.i JOIN {vt} vb ON vb.i = g.j)""",
        f"""g2 AS MATERIALIZED (
        SELECT g.i, g.j,
               round(g.c - (SELECT l FROM lam) * va.vv * vb.vv, {r}) AS c
        FROM g JOIN {vt} va ON va.i = g.i JOIN {vt} vb ON vb.i = g.j)""",
        f"""uv0 AS MATERIALIZED (SELECT i, round(1.0 / sqrt((SELECT d FROM nd)), {r}) AS vv
           FROM (SELECT DISTINCT i FROM g2))""",
    ]
    for t in range(1, n_iters + 1):
        parts += _iter(t, f"uv{t - 1}", "g2", "u")
    ut = f"uv{n_iters}"
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT z.vec_id, z.label,
           round(sum(z.z * p1.vv), {r}) AS x,
           round(sum(z.z * p2.vv), {r}) AS y
    FROM z JOIN {vt} p1 ON p1.i = z.pos JOIN {ut} p2 ON p2.i = z.pos
    GROUP BY z.vec_id, z.label
    """


@register(
    "pca_projection",
    _power_pca_oracle(),
    doc="M1 distributed 2-D projection path (t-SNE stand-in), VALUE-"
    "ORACLE-GATED (round 6; was rows-only): deterministic fixed-step "
    "power-iteration PCA (ml/clustering.py::power_pca_2d) — z-score, "
    "rounded Gramian (the one corpus pass, map-side combined to d² "
    "cells), 8 matvec/normalize rounds per component with rank-1 "
    "deflation, rounded projection. Every sum rounds before reuse so "
    "both engines replay the identical recurrence; the all-ones init "
    "fixes the sign. The MLlib PCA arm (pca_project_2d, sign/rotation "
    "engine-specific) stays covered by tests/test_ml_clustering.py.",
)
def pca_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    return ML.power_pca_2d(e, "vec_id", "embedding", keep_cols=("label",)).select(
        "vec_id", "label", "x", "y"
    )


_REPORT_SCHEMA = (
    "struct<cluster:int,representative_id:bigint,"
    "neighbors:array<struct<rnk:bigint,neighbor_id:bigint,sim:double>>,"
    "n_members:bigint,avg_norm:double>"
)


@register(
    "cluster_report",
    f"""
    WITH {_CENTROID_DIST},
    reps AS (
        SELECT label, vec_id AS rep_id
        FROM (SELECT *, row_number() OVER (PARTITION BY label ORDER BY d, vec_id) AS rn
              FROM dist)
        WHERE rn = 1),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM ex GROUP BY vec_id),
    dots AS (
        SELECT m.label, r.rep_id, m.vec_id, sum(m.v * x.v) AS dot
        FROM ex m
        JOIN reps r ON m.label = r.label
        JOIN ex x ON x.vec_id = r.rep_id AND x.pos = m.pos
        WHERE m.vec_id <> r.rep_id
        GROUP BY m.label, r.rep_id, m.vec_id),
    ranked AS (
        SELECT label, rep_id, vec_id, sim,
               row_number() OVER (PARTITION BY label
                                  ORDER BY sim DESC, vec_id) AS rnk
        FROM (SELECT d.label, d.rep_id, d.vec_id,
                     round(d.dot / (nm.nrm * nr.nrm), 6) AS sim
              FROM dots d
              JOIN norms nm ON d.vec_id = nm.vec_id
              JOIN norms nr ON d.rep_id = nr.vec_id)),
    nb AS (
        SELECT label, rep_id,
               string_agg(CAST(vec_id AS VARCHAR), ',' ORDER BY rnk) AS neighbor_ids,
               min(sim) AS sim_min, max(sim) AS sim_max
        FROM ranked WHERE rnk <= 5 GROUP BY label, rep_id),
    st AS (
        SELECT label, CAST(count(*) AS BIGINT) AS n_members,
               round(avg(nrm), 6) AS avg_norm
        FROM (SELECT e.vec_id, e.label, sqrt(sum(v * v)) AS nrm
              FROM ex e GROUP BY e.vec_id, e.label) nn
        GROUP BY label)
    SELECT nb.label AS cluster, nb.rep_id AS representative_id,
           st.n_members, st.avg_norm, nb.neighbor_ids,
           nb.sim_min, nb.sim_max
    FROM nb JOIN st ON nb.label = st.label
    """,
    doc="M3 per-cluster analysis report, VALUE-ORACLE-GATED (round 6; "
    "was rows-only): the JSON document per cluster "
    "(clustering/helpers.py:261-315 export shape) is still built by "
    "ml/clustering.py::analysis_report, then PARSED BACK (from_json) "
    "and flattened to engine-neutral values — representative, sizes, "
    "avg norm, the ordered neighbor-id list, min/max neighbor sim — "
    "so the oracle checks the report's CONTENT (layout-independent) "
    "while the query still exercises the JSON export+parse roundtrip. "
    "Neighbor sims surface as min/max (exact 6-dp grid values), never "
    "re-averaged: an average of rounded values is grid-aligned and "
    "lands on rounding midpoints (see power_pca_2d's discipline note).",
)
def cluster_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    rep = ML.analysis_report(e, "vec_id", "embedding", k=5, cluster_col="label")
    r = F.from_json("report_json", _REPORT_SCHEMA)
    return rep.select(F.col("label").alias("cluster"), r.alias("r")).select(
        "cluster",
        F.col("r.representative_id").alias("representative_id"),
        F.col("r.n_members").alias("n_members"),
        F.col("r.avg_norm").alias("avg_norm"),
        F.array_join(
            F.transform(F.col("r.neighbors"), lambda x: x["neighbor_id"].cast("string")),
            ",",
        ).alias("neighbor_ids"),
        F.array_min(F.col("r.neighbors.sim")).alias("sim_min"),
        F.array_max(F.col("r.neighbors.sim")).alias("sim_max"),
    )


# ALS internal-consistency oracle: the Spark query persists the fitted
# factor tables (the one BLAS-nondeterministic artifact) and recomputes
# score = dot(user_factor, item_factor) + per-user top-5 FROM them;
# DuckDB replays the identical dot products and ranking over the same
# parquet — factor values are inputs to the comparison, not outputs.
# The ds column (lineitem row count, data-derived) selects the right
# dataset tier out of the glob-shared factor root; scores are rounded
# to 6 dp on both sides (continuous values — dot products of float
# factors — so the grid-midpoint rule permits it) and ranked by the
# ROUNDED score with item-asc tiebreak so ulp-level summation-order
# differences can never reorder the top-k across engines.
_ALS_GLOB = os.path.join(_REL_CACHE_ROOT, "als_factors_*", "*.parquet")

_ALS_ORACLE = f"""
    WITH fx AS (
        SELECT side, fid, generate_subscripts(features, 1) AS pos,
               CAST(unnest(features) AS DOUBLE) AS v
        FROM read_parquet('{_ALS_GLOB}')
        WHERE ds = (SELECT count(*) FROM lineitem)
    ),
    s AS (
        SELECT u.fid AS "user", i.fid AS item,
               round(sum(u.v * i.v), 6) AS score
        FROM fx u JOIN fx i ON u.pos = i.pos
        WHERE u.side = 'user' AND i.side = 'item' AND u.fid < 20
        GROUP BY 1, 2
    )
    SELECT "user", item, score
    FROM (SELECT *, row_number() OVER (
              PARTITION BY "user" ORDER BY score DESC, item) AS rn
          FROM s)
    WHERE rn <= 5
"""


@register(
    "als_recommendations",
    _ALS_ORACLE,
    doc="Distributed collaborative filtering: MLlib ALS (implicit "
    "preferences, seed-pinned) over customer x part interaction "
    "strengths from lineitem quantities; top-5 parts per customer for "
    "a fixed probe set of 20 customers. Matrix factorization as "
    "block-joined shuffle stages - no driver-side matrix. The fitted "
    "factor tables are persisted (persisted_relation) and the "
    "recommend step is recomputed FROM them as a broadcast dot-product "
    "top-k, giving the BLAS-nondeterministic model a full value oracle "
    "(VERDICT r6 ask #2: factors become comparison inputs).",
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
    ds = li.count()  # data-derived tier tag, mirrored by the oracle
    fx = persisted_relation(
        spark,
        "als_factors",
        [f"{sf_dir}/lineitem.parquet", f"{sf_dir}/orders.parquet"],
        f"rank=8,seed=42,maxIter=8,implicit,ds={ds}",
        lambda: ML.als_factor_tables(
            ratings, "user", "item", "strength", rank=8, seed=42, ds_tag=ds
        ),
    )
    u20 = fx.filter((F.col("side") == "user") & (F.col("fid") < 20)).select(
        F.col("fid").alias("user"), F.col("features").alias("ufeat")
    )
    items = fx.filter(F.col("side") == "item").select(
        F.col("fid").alias("item"), F.col("features").alias("ifeat")
    )
    # bounded cross join: ≤20 probe users broadcast against the item
    # factors — each item-factor partition scores locally, then the
    # per-user top-5 window shuffles only (20 × n_items) score rows.
    dot = F.aggregate(
        F.zip_with(
            "ufeat", "ifeat", lambda a, b: a.cast("double") * b.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = items.crossJoin(F.broadcast(u20)).select(
        "user", "item", F.round(dot, 6).alias("score")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user").orderBy(F.col("score").desc(), F.col("item"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("user", "item", "score")
    )
