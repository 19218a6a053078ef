"""Clustering-analysis operators (reference services/clustering/, M1-M5).

The reference pipeline (clustering/main.py:50-129) is: SQL weighted
case-embedding extraction → StandardScaler → t-SNE(2d, seed 42) →
HDBSCAN → per-cluster centroid/representative/top-5-neighbors →
CSV/JSON export. Spark-first restatement:

* case vectors: ``functions.vector.weighted_mean_vectors`` (A1) — a
  (group, dim)-keyed partial aggregation, one shuffle, scales to any
  corpus size.
* scaling: ``pyspark.ml.feature.StandardScaler`` (distributed).
* 2-D projection: MLlib ``PCA`` as the scale path (t-SNE does not
  distribute); a driver-side sklearn t-SNE escape hatch is
  import-gated — the case-level matrix is small (≲ thousands of rows,
  clustering/helpers.py:83-97 collects it too), so collect-to-driver
  is reference-faithful where sklearn exists.
* clustering: MLlib ``KMeans`` (distributed, seed-pinned) as the scale
  path; driver-side HDBSCAN escape hatch import-gated likewise.
* representatives/neighbors (W1/W2): min-by-struct argmin and
  windowed top-k — pure DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from scotustician_spark.functions import vector as V


def standard_scale(df: DataFrame, vec_col: str, out_col: str = "scaled") -> DataFrame:
    """Distributed z-scoring of a vector column (reference
    clustering/helpers.py:103-104 StandardScaler)."""
    from pyspark.ml.feature import StandardScaler
    from pyspark.ml.functions import array_to_vector, vector_to_array

    with_vec = df.withColumn("__mlvec", array_to_vector(F.col(vec_col)))
    model = StandardScaler(
        inputCol="__mlvec", outputCol="__scaled", withMean=True, withStd=True
    ).fit(with_vec)
    return (
        model.transform(with_vec)
        .withColumn(out_col, vector_to_array("__scaled").cast("array<double>"))
        .drop("__mlvec", "__scaled")
    )


def kmeans_assign(
    df: DataFrame, vec_col: str, k: int, seed: int = 42, out_col: str = "cluster"
) -> DataFrame:
    """Distributed clustering path (stands in for HDBSCAN, M2): MLlib
    KMeans with pinned seed. Labels are arbitrary ids — downstream
    verification uses label-invariant properties (SURVEY §7 hard #2).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    with_vec = df.withColumn("__mlvec", array_to_vector(F.col(vec_col)))
    model = KMeans(k=k, seed=seed, featuresCol="__mlvec", predictionCol=out_col).fit(
        with_vec
    )
    return model.transform(with_vec).drop("__mlvec")


def pca_project_2d(df: DataFrame, vec_col: str) -> DataFrame:
    """Distributed 2-D projection (stands in for t-SNE, M1): MLlib PCA.
    Emits x/y columns like the reference's coords frame
    (clustering/helpers.py:99-122)."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    with_vec = df.withColumn("__mlvec", array_to_vector(F.col(vec_col)))
    model = PCA(k=2, inputCol="__mlvec", outputCol="__proj").fit(with_vec)
    arr = vector_to_array("__proj")
    return (
        model.transform(with_vec)
        .withColumn("x", arr[0])
        .withColumn("y", arr[1])
        .drop("__mlvec", "__proj")
    )


def power_pca_2d(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_iters: int = 8,
    r: int = 6,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """DETERMINISTIC 2-D PCA by fixed-step power iteration — the
    value-oracle-gated twin of ``pca_project_2d`` (whose MLlib
    eigendecomposition has engine-specific sign/rotation, SURVEY §7
    hard #2). Defined as a recurrence any SQL engine replays exactly:

    1. z-score each dimension (mean / sample-std per ``pos``);
    2. Gramian correlation matrix ``G[i][j] = round(Σ z_i·z_j/(n-1))``
       — the one corpus-scale pass: a self-join on the vector id that
       partial-aggregates map-side to d² cells regardless of corpus
       rows (MLlib's computeGramianMatrix shape);
    3. ``n_iters`` power-iteration steps on the d×d relation for the
       dominant eigenvector (exact matvec → normalize → round),
       starting from the all-ones direction so the sign is determined
       by the recurrence itself, no convention needed;
    4. rank-1 deflation (``G₂ = round(G − λ v vᵀ)``), power-iterate
       again for the second component;
    5. project: ``x = round(Σ z·v1)``, ``y = round(Σ z·v2)``.

    Rounding discipline (the IVFPQ recurrence discipline, plus one
    rule this operator surfaced): round only CONTINUOUS values —
    quantities divided by an irrational norm or aggregated from
    unrounded doubles — never a sum of grid-aligned terms. A matvec
    over 6-dp-rounded inputs lands EXACTLY on rounding midpoints
    (the terms live on a 1e-6/2^k decimal grid), where each engine's
    last-ulp summation noise decides the direction — so the matvec
    stays exact and only the normalized eigenvector (÷ sqrt:
    continuous) and the final projections (z is unrounded) round.
    Output is the fixed-step recurrence's value, an approximation of
    the top-2 principal components that sharpens with ``n_iters``.

    Scale shape: the corpus is touched four times (the n/d metadata
    count, z-score stats, Gramian, projection), each a map-side-
    combined aggregation keyed on ``pos``/(i, j); the iteration
    itself is d²-row compute over the localCheckpointed Gramian —
    one lazy chain per component, corpus-size-independent.
    """
    ex = df.select(
        id_col, *keep_cols, F.posexplode(vec_col).alias("pos", "vraw")
    ).withColumn("v", F.col("vraw").cast("double"))
    # n and d in ONE pass, counted POST-explode so NULL-embedding rows
    # are excluded exactly as the oracle's count(DISTINCT vec_id) FROM
    # the long form excludes them (df.count() would include them and
    # shift every Gramian cell by (n-1)/(n-2) before rounding)
    meta = ex.agg(
        F.countDistinct(id_col).alias("n"), F.countDistinct("pos").alias("d")
    ).first()
    n, d = int(meta["n"] or 0), int(meta["d"] or 0)
    if n < 2 or d == 0:
        # no variance to decompose: degenerate all-zero projection
        # (keeps 0/1-row partitions and empty deltas crash-free)
        return (
            df.select(id_col, *keep_cols)
            .withColumn("x", F.lit(0.0))
            .withColumn("y", F.lit(0.0))
        )
    stats = ex.groupBy("pos").agg(
        F.avg("v").alias("mu"), F.stddev_samp("v").alias("sd")
    )
    z = (
        ex.join(F.broadcast(stats), "pos")
        .withColumn(
            "z",
            F.coalesce(
                (F.col("v") - F.col("mu")) / F.nullif(F.col("sd"), F.lit(0.0)),
                F.lit(0.0),
            ),
        )
        .select(id_col, *keep_cols, "pos", "z")
        .localCheckpoint(eager=True)  # feeds Gramian AND projection
    )

    za = z.select(F.col(id_col).alias("__id"), F.col("pos").alias("i"), F.col("z").alias("zi"))
    zb = z.select(F.col(id_col).alias("__id"), F.col("pos").alias("j"), F.col("z").alias("zj"))
    g = (
        za.join(zb, "__id")
        .groupBy("i", "j")
        .agg(F.round(F.sum(F.col("zi") * F.col("zj")) / F.lit(float(n - 1)), r).alias("c"))
        .localCheckpoint(eager=True)  # d² rows, feeds 2·n_iters matvecs
    )

    # The power iteration runs ON THE DRIVER over the collected
    # Gramian — a BOUNDED table (d² rows, corpus-size-independent),
    # the train_bpe bounded-collect discipline. A DataFrame loop was
    # tried both ways and loses badly: per-iteration eager
    # localCheckpoints cost a scheduler round-trip each (~18 s), and
    # a lazy nested chain re-computes every broadcast subtree
    # (nrm_t's subtree contains v_{t-1}'s, 2^n_iters blowup — ~60 s).
    # Cross-engine parity holds by the same argument as the SQL twin:
    # every rounded quantity is CONTINUOUS (÷ sqrt norm), where the
    # sub-ulp summation-order differences between Python and either
    # engine are absorbed by round(·, r) except on measure-zero
    # midpoints (see the grid-midpoint note above).
    gm: dict[tuple[int, int], float] = {
        (row["i"], row["j"]): row["c"] for row in g.collect()
    }

    def _power_py(mat: dict[tuple[int, int], float]) -> list[float]:
        v = [round(1.0 / d ** 0.5, r)] * d
        for _ in range(n_iters):
            w = [
                sum(mat.get((i, j), 0.0) * v[j] for j in range(d))
                for i in range(d)
            ]
            nrm = sum(x * x for x in w) ** 0.5
            if nrm == 0.0:
                # Constant embeddings (all-zero z → all-zero Gramian) or
                # exact rank-1 deflation leave w ≡ 0; the projection onto
                # that direction is the all-zero vector (mirrored in the
                # SQL twin via coalesce(w / nullif(nrm, 0), 0.0)).
                v = [0.0] * d
            else:
                v = [round(x / nrm, r) for x in w]
        return v

    v1 = _power_py(gm)
    lam = round(
        sum(
            v1[i] * gm.get((i, j), 0.0) * v1[j]
            for i in range(d)
            for j in range(d)
        ),
        r,
    )
    g2 = {
        (i, j): round(gm.get((i, j), 0.0) - lam * v1[i] * v1[j], r)
        for i in range(d)
        for j in range(d)
    }
    v2 = _power_py(g2)

    from ..session import local_relation

    basis = local_relation(
        df.sparkSession,
        [(i, v1[i], v2[i]) for i in range(d)],
        "pos int, w1 double, w2 double",
    )
    return (
        z.join(F.broadcast(basis), "pos")
        .groupBy(id_col, *keep_cols)
        .agg(
            F.round(F.sum(F.col("z") * F.col("w1")), r).alias("x"),
            F.round(F.sum(F.col("z") * F.col("w2")), r).alias("y"),
        )
    )


def tsne_hdbscan_driver(
    df: DataFrame,
    vec_col: str,
    id_cols: list[str],
    perplexity: int = 30,
    min_cluster_size: int = 5,
    seed: int = 42,
    _tsne_cls=None,
    _hdbscan_cls=None,
) -> DataFrame:
    """Reference-exact escape hatch (M1+M2): collect the (small) case
    matrix, run sklearn t-SNE + hdbscan with the reference's parameter
    guardrails (clustering/helpers.py:105-110,133-138), return a
    DataFrame of (ids…, x, y, cluster). Requires sklearn + hdbscan by
    default and raises a clear NotImplementedError without them; the
    distributed path (pca_project_2d + kmeans_assign) covers the same
    pipeline contract. ``_tsne_cls`` / ``_hdbscan_cls`` inject
    API-compatible stand-ins (``fit_transform`` / ``fit_predict``) so
    the collect → guardrail → project → cluster → rebuild path is
    executable in environments without the heavy libraries
    (tests/test_ml_clustering.py exercises it on the 500-row matrix).
    """
    if _tsne_cls is None or _hdbscan_cls is None:
        try:
            import hdbscan
            from sklearn.manifold import TSNE
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "driver-side t-SNE/HDBSCAN needs sklearn+hdbscan; use "
                "pca_project_2d + kmeans_assign for the distributed path"
            ) from e
        _tsne_cls = _tsne_cls or TSNE
        _hdbscan_cls = _hdbscan_cls or hdbscan.HDBSCAN
    import numpy as np

    pdf = df.select(*id_cols, vec_col).toPandas()
    mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
    n = len(mat)
    eff_perp = min(perplexity, max(5, n // 4))
    coords = _tsne_cls(
        n_components=2, perplexity=eff_perp, random_state=seed
    ).fit_transform(mat)
    eff_mcs = max(2, min(min_cluster_size, n // 8))
    labels = _hdbscan_cls(min_cluster_size=eff_mcs).fit_predict(coords)
    pdf["x"], pdf["y"], pdf["cluster"] = coords[:, 0], coords[:, 1], labels
    return df.sparkSession.createDataFrame(pdf.drop(columns=[vec_col]))


def cluster_centroids(
    assigned: DataFrame, vec_col: str, cluster_col: str = "cluster"
) -> DataFrame:
    """Per-cluster mean vector (A8 generalized from t-SNE x/y to the
    full embedding): weighted_mean_vectors with weight 1."""
    return V.weighted_mean_vectors(
        assigned.withColumn("__one", F.lit(1.0)),
        [cluster_col],
        vec_col,
        "__one",
        out_col="centroid",
    )


def representatives(
    assigned: DataFrame,
    id_col: str,
    vec_col: str,
    cluster_col: str = "cluster",
) -> DataFrame:
    """W1: the member closest (L2) to its cluster centroid —
    clustering/helpers.py:177-183. min(struct(dist, id)) gives a
    deterministic argmin (lexicographic tiebreak on id); the centroid
    side is tiny (|clusters| rows) so the join broadcasts.
    """
    cent = cluster_centroids(assigned, vec_col, cluster_col)
    dist = V.l2_distance(vec_col, "centroid")
    return (
        assigned.join(F.broadcast(cent), cluster_col)
        .select(
            cluster_col,
            F.struct(
                F.round(dist, 6).alias("d"), F.col(id_col).alias("id")
            ).alias("__cand"),
        )
        .groupBy(cluster_col)
        .agg(F.min("__cand").alias("__best"))
        .select(
            cluster_col,
            F.col("__best.id").alias("representative_id"),
            F.col("__best.d").alias("representative_dist"),
        )
    )


def topk_neighbors(
    assigned: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    cluster_col: str = "cluster",
) -> DataFrame:
    """W2: per cluster, top-k members most cosine-similar to the
    representative, excluding itself (clustering/helpers.py:185-226).

    The representative table is |clusters| rows → broadcast join; each
    member is scored once (no within-cluster cartesian). Rank on
    rounded sim with id tiebreak so ordering is engine-stable.
    """
    # argmin carries the VECTOR through the struct-min (r10): (d, id)
    # is already a total order, so adding the vector as a third field
    # never changes the winner — and the former join-back that re-read
    # the corpus to fetch the representative's vector (one more scan +
    # one more broadcast build chain per call) disappears.
    cent = cluster_centroids(assigned, vec_col, cluster_col)
    dist = V.l2_distance(vec_col, "centroid")
    rep_vecs = (
        assigned.join(F.broadcast(cent), cluster_col)
        .select(
            cluster_col,
            F.struct(
                F.round(dist, 6).alias("d"),
                F.col(id_col).alias("id"),
                F.col(vec_col).alias("v"),
            ).alias("__cand"),
        )
        .groupBy(cluster_col)
        .agg(F.min("__cand").alias("__best"))
        .select(
            cluster_col,
            F.col("__best.id").alias("representative_id"),
            F.col("__best.v").alias("__rep_vec"),
        )
    )
    scored = (
        assigned.join(F.broadcast(rep_vecs), cluster_col)
        .filter(F.col(id_col) != F.col("representative_id"))
        .withColumn("sim", F.round(V.cosine_similarity(vec_col, "__rep_vec"), 6))
    )
    w = W.partitionBy(cluster_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select(
            cluster_col,
            "representative_id",
            F.col(id_col).alias("neighbor_id"),
            "sim",
            "rnk",
        )
    )


def cluster_stats(
    assigned: DataFrame,
    vec_col: str,
    cluster_col: str = "cluster",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """A9/A11: per-cluster sizes + mean/std of member values + mean
    vector norm."""
    aggs = [
        F.count("*").cast("bigint").alias("n_members"),
        F.round(F.avg(V.l2_norm(vec_col)), 6).alias("avg_norm"),
    ]
    for c in value_cols or []:
        aggs += [
            F.round(F.avg(c), 6).alias(f"avg_{c}"),
            F.round(F.stddev(c), 6).alias(f"std_{c}"),
        ]
    return assigned.groupBy(cluster_col).agg(*aggs)


def analysis_report(
    assigned: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    cluster_col: str = "cluster",
) -> DataFrame:
    """M3: one JSON document per cluster — representative + ordered
    neighbor list + stats — the reference's exported metadata shape
    (clustering/helpers.py:261-315)."""
    nb = topk_neighbors(assigned, id_col, vec_col, k, cluster_col)
    nb_agg = nb.groupBy(cluster_col, "representative_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("rnk"), F.col("neighbor_id"), F.col("sim")))
        ).alias("neighbors")
    )
    st = cluster_stats(assigned, vec_col, cluster_col)
    joined = nb_agg.join(st, cluster_col)
    return joined.select(
        cluster_col,
        F.to_json(
            F.struct(
                F.col(cluster_col).alias("cluster"),
                F.col("representative_id"),
                F.col("neighbors"),
                F.col("n_members"),
                F.col("avg_norm"),
            )
        ).alias("report_json"),
    )


def als_factor_tables(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    rank: int = 8,
    seed: int = 42,
    ds_tag: int = 0,
) -> DataFrame:
    """Fit ALS and return BOTH factor sides as one relation
    ``(side, fid, features, ds)`` — the internal-consistency oracle
    surface for ``als_recommend``: once the factor tables are
    materialized, score = dot(user_factor, item_factor) and the top-k
    are plain SQL over them, so the platform-BLAS factor VALUES become
    inputs to the comparison instead of outputs. ``ds_tag`` is a
    data-derived dataset identifier (e.g. the ratings-source row
    count) written into every row so one glob-read parquet root can
    hold factor builds for several dataset tiers side by side."""
    from pyspark.ml.recommendation import ALS

    als = ALS(
        rank=rank,
        maxIter=8,
        seed=seed,
        userCol=user_col,
        itemCol=item_col,
        ratingCol=rating_col,
        coldStartStrategy="drop",
        implicitPrefs=True,
    )
    model = als.fit(ratings)
    uf = model.userFactors.select(
        F.lit("user").alias("side"), F.col("id").alias("fid"), "features"
    )
    itf = model.itemFactors.select(
        F.lit("item").alias("side"), F.col("id").alias("fid"), "features"
    )
    return uf.unionByName(itf).withColumn(
        "ds", F.lit(int(ds_tag)).cast("long")
    )


def als_recommend(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    k: int = 5,
    rank: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Collaborative filtering via MLlib ALS: top-``k`` item
    recommendations per user from implicit-style interaction strengths.

    The distributed matrix factorization the reference's stack has no
    analog for — ALS alternates least-squares solves over user/item
    factor blocks, each iteration a pair of block-joined aggregations
    that Spark schedules like any shuffle stage (factors partition by
    id; no driver-side matrix ever materializes). Seed pinned; note
    BLAS nondeterminism across platforms makes exact scores a
    rows-only gate, with shape/coverage invariants unit-tested.

    Returns (user, item, score) exploded from recommendForAllUsers —
    k rows per user.
    """
    from pyspark.ml.recommendation import ALS

    als = ALS(
        rank=rank,
        maxIter=8,
        seed=seed,
        userCol=user_col,
        itemCol=item_col,
        ratingCol=rating_col,
        coldStartStrategy="drop",
        implicitPrefs=True,
    )
    model = als.fit(ratings)
    recs = model.recommendForAllUsers(k)
    return recs.select(
        F.col(user_col),
        F.explode("recommendations").alias("r"),
    ).select(
        user_col,
        F.col(f"r.{item_col}").alias(item_col),
        F.col("r.rating").alias("score"),
    )
