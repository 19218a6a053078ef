"""Unit tests for the clustering-analysis operators on a handcrafted
dataset with known geometry (numpy oracle)."""

from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from scotustician_spark.ml import (
    analysis_report,
    cluster_stats,
    kmeans_assign,
    pca_project_2d,
    representatives,
    standard_scale,
    topk_neighbors,
    tsne_hdbscan_driver,
)

# two well-separated clusters in 3-d; member 1 resp. 11 is the centroid
DATA = [
    (0, [1.0, 0.0, 0.0], 0),
    (1, [1.0, 0.1, 0.0], 0),
    (2, [1.0, 0.2, 0.0], 0),
    (10, [0.0, 5.0, 5.0], 1),
    (11, [0.0, 5.0, 5.2], 1),
    (12, [0.0, 5.0, 5.4], 1),
    (13, [0.1, 5.0, 5.2], 1),
]


@pytest.fixture(scope="module")
def edf(spark):
    return spark.createDataFrame(DATA, "vec_id int, embedding array<float>, label int")


def test_representatives_argmin(edf):
    reps = {
        r["label"]: r for r in representatives(edf, "vec_id", "embedding", "label").collect()
    }
    # numpy oracle: argmin L2 to the per-label mean
    arr = {lbl: np.array([v for _, v, l in DATA if l == lbl]) for lbl in (0, 1)}
    for lbl, mat in arr.items():
        cent = mat.mean(axis=0)
        ids = [i for i, _, l in DATA if l == lbl]
        dists = np.linalg.norm(mat - cent, axis=1)
        assert reps[lbl]["representative_id"] == ids[int(np.argmin(dists))]
        assert reps[lbl]["representative_dist"] == pytest.approx(dists.min(), abs=2e-6)


def test_topk_neighbors_excludes_rep_and_orders(edf):
    nb = topk_neighbors(edf, "vec_id", "embedding", k=2, cluster_col="label").collect()
    by_cluster = {}
    for r in nb:
        by_cluster.setdefault(r["label"], []).append(r)
    for rows in by_cluster.values():
        rep = rows[0]["representative_id"]
        assert all(r["neighbor_id"] != rep for r in rows)
        sims = [r["sim"] for r in sorted(rows, key=lambda r: r["rnk"])]
        assert sims == sorted(sims, reverse=True)
        assert len(rows) == 2


def test_kmeans_separates_known_clusters(edf):
    out = kmeans_assign(edf, "embedding", k=2, seed=42).collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r["label"], set()).add(r["cluster"])
    # each true cluster maps to exactly one kmeans cluster, and they differ
    assert all(len(s) == 1 for s in by_label.values())
    assert by_label[0] != by_label[1]


def test_standard_scale_and_pca_shapes(edf):
    scaled = standard_scale(edf, "embedding")
    row = scaled.limit(1).collect()[0]
    assert len(row["scaled"]) == 3
    proj = pca_project_2d(scaled, "scaled")
    rows = proj.select("x", "y").collect()
    assert len(rows) == len(DATA)
    assert all(r["x"] is not None and r["y"] is not None for r in rows)
    # scaled columns have ~zero mean
    means = scaled.select(F.expr("avg(scaled[0])"), F.expr("avg(scaled[1])")).collect()[0]
    assert abs(means[0]) < 1e-7 and abs(means[1]) < 1e-7


def test_cluster_stats_counts(edf):
    st = {r["label"]: r for r in cluster_stats(edf, "embedding", "label").collect()}
    assert st[0]["n_members"] == 3 and st[1]["n_members"] == 4


def test_analysis_report_json(edf):
    rows = analysis_report(edf, "vec_id", "embedding", k=2, cluster_col="label").collect()
    assert len(rows) == 2
    for r in rows:
        doc = json.loads(r["report_json"])
        assert set(doc) >= {"cluster", "representative_id", "neighbors", "n_members"}
        rnks = [n["rnk"] for n in doc["neighbors"]]
        assert rnks == sorted(rnks)


def test_tsne_hdbscan_gated(edf):
    try:
        import hdbscan  # noqa: F401
        import sklearn  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            tsne_hdbscan_driver(edf, "embedding", ["vec_id"])


class _StandinTSNE:
    """API-compatible t-SNE stand-in (SVD 2-D projection) so the
    escape hatch's collect→guardrail→project→cluster path executes
    without sklearn. Records the params it was handed."""

    last_params: dict = {}

    def __init__(self, n_components, perplexity, random_state):
        type(self).last_params = {
            "n_components": n_components,
            "perplexity": perplexity,
            "random_state": random_state,
        }

    def fit_transform(self, mat):
        import numpy as np

        centered = mat - mat.mean(axis=0)
        _, _, vt = np.linalg.svd(centered, full_matrices=False)
        return centered @ vt[:2].T


class _StandinHDBSCAN:
    """fit_predict stand-in: quadrant labels over the 2-D coords."""

    last_params: dict = {}

    def __init__(self, min_cluster_size):
        type(self).last_params = {"min_cluster_size": min_cluster_size}

    def fit_predict(self, coords):
        return (coords[:, 0] > 0).astype(int) * 2 + (coords[:, 1] > 0).astype(int)


def test_tsne_hdbscan_hatch_executes_on_500_row_matrix(spark):
    """Run the reference-faithful hatch end-to-end on the 500-row case
    matrix with seed 42 — real sklearn/hdbscan when available,
    injected API stand-ins otherwise — and pin the parameter
    guardrails (eff_perp = min(p, max(5, n//4)), eff_mcs =
    max(2, min(mcs, n//8)))."""
    import pyspark.sql.functions as F

    cases = spark.range(500).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda i: F.sin(F.col("id") * 3 + i),
        ).alias("embedding"),
    )
    try:
        import hdbscan  # noqa: F401
        import sklearn  # noqa: F401

        kwargs = {}
        check_params = False
    except ImportError:
        kwargs = {"_tsne_cls": _StandinTSNE, "_hdbscan_cls": _StandinHDBSCAN}
        check_params = True
    out = tsne_hdbscan_driver(
        cases, "embedding", ["vec_id"], perplexity=1000,
        min_cluster_size=5, seed=42, **kwargs,
    )
    rows = out.collect()
    assert len(rows) == 500
    assert set(out.columns) == {"vec_id", "x", "y", "cluster"}
    assert len({r["cluster"] for r in rows}) >= 2
    # every x/y is a finite float
    assert all(abs(r["x"]) < 1e9 and abs(r["y"]) < 1e9 for r in rows)
    if check_params:
        # guardrails: perplexity clamps to n//4=125, mcs passes through
        assert _StandinTSNE.last_params == {
            "n_components": 2, "perplexity": 125, "random_state": 42,
        }
        assert _StandinHDBSCAN.last_params == {"min_cluster_size": 5}


def test_ivf_full_probe_equals_brute_force(spark, sf_dir):
    from scotustician_spark.operators.similarity import brute_force_topk, ivf_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["rnk"]): r["neighbor_id"]
        for r in brute_force_topk(e, q, k=3).collect()
    }
    # probing every cell degrades IVF to exact brute force
    full = {
        (r["query_id"], r["rnk"]): r["neighbor_id"]
        for r in ivf_topk(e, q, k=3, n_cells=4, n_probe=4).collect()
    }
    assert full == exact

    # partial probe: approximate but sane — right shape, real neighbors,
    # set-recall vs exact consistent with probing ~half the corpus
    # (synthetic embeddings are uniform, so cells carry no structure
    # and expected recall ≈ probed fraction)
    approx = ivf_topk(e, q, k=3, n_cells=4, n_probe=2).collect()
    assert all(r["query_id"] != r["neighbor_id"] for r in approx)
    exact_pairs = {(q_, n) for (q_, _), n in exact.items()}
    hits = sum(1 for r in approx if (r["query_id"], r["neighbor_id"]) in exact_pairs)
    assert len(approx) > 0 and hits / len(exact_pairs) >= 0.2


def test_ivf_onestep_full_probe_equals_brute_force(spark, sf_dir):
    from scotustician_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk_onestep,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    # the deterministic quantizer must also degrade to exact brute
    # force at n_probe == n_cells (sims rounded at 6 on both sides, so
    # compare neighbor sets per rank)
    exact = {
        (r["query_id"], r["rnk"]): r["neighbor_id"]
        for r in brute_force_topk(e, q, k=3).collect()
    }
    full = {
        (r["query_id"], r["rnk"]): r["neighbor_id"]
        for r in ivf_topk_onestep(e, q, k=3, n_cells=4, n_probe=4).collect()
    }
    assert full == exact
    # determinism: two runs produce identical rows
    a = sorted(map(tuple, ivf_topk_onestep(e, q, k=3, n_cells=4, n_probe=2).collect()))
    b = sorted(map(tuple, ivf_topk_onestep(e, q, k=3, n_cells=4, n_probe=2).collect()))
    assert a == b


def test_pq_exact_when_codebook_saturates(spark):
    """With one codeword per distinct subvector (n_codes == N and a
    converging assignment), ADC distance IS the exact squared L2 —
    PQ must reproduce the brute-force L2 ranking."""
    import math

    from scotustician_spark.operators.similarity import pq_topk_onestep

    # 6 vectors in 4-d, 2 subspaces of 2 dims; all subvectors distinct
    vecs = [
        (0, [0.0, 0.0, 0.0, 0.1]),
        (1, [0.1, 0.0, 0.2, 0.0]),
        (2, [1.0, 1.0, 1.1, 1.0]),
        (3, [1.1, 1.0, 0.9, 1.2]),
        (4, [5.0, 5.0, 5.0, 5.1]),
        (5, [5.1, 4.9, 5.2, 5.0]),
    ]
    e = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = pq_topk_onestep(
        e, e, dim=4, k=5, m=2, n_codes=6, d2_round=6
    ).collect()

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    by_vec = dict(vecs)
    for q in by_vec:
        got = [
            (r["rnk"], r["neighbor_id"], r["approx_d2"])
            for r in out
            if r["query_id"] == q
        ]
        want = sorted(
            ((d2(by_vec[q], by_vec[n]), n) for n in by_vec if n != q)
        )
        for (rnk, nid, ad2), (wd2, wn) in zip(sorted(got), want):
            assert nid == wn
            # float32 storage: inputs round at ~1e-7 per element
            assert math.isclose(ad2, wd2, abs_tol=1e-4)


def test_ivfpq_exact_at_full_probe_and_saturated_codebook(spark):
    """IVFADC composition anchor: with every cell probed and one
    codeword per distinct residual subvector, the ADC distance is the
    exact squared L2 — ||(q−c) − (v−c)||² == ||q−v||² — so the ranking
    must match brute-force L2 exactly."""
    import math

    from scotustician_spark.operators.similarity import ivfpq_topk_onestep

    vecs = [
        (0, [0.0, 0.0, 0.0, 0.1]),
        (1, [0.1, 0.0, 0.2, 0.0]),
        (2, [1.0, 1.0, 1.1, 1.0]),
        (3, [1.1, 1.0, 0.9, 1.2]),
        (4, [5.0, 5.0, 5.0, 5.1]),
        (5, [5.1, 4.9, 5.2, 5.0]),
    ]
    e = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = ivfpq_topk_onestep(
        e, e, dim=4, k=5, n_cells=2, n_probe=2, m=2, n_codes=6, d2_round=6
    ).collect()

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    by_vec = dict(vecs)
    for q in by_vec:
        got = sorted(
            (r["rnk"], r["neighbor_id"], r["approx_d2"])
            for r in out
            if r["query_id"] == q
        )
        want = sorted(((d2(by_vec[q], by_vec[n]), n) for n in by_vec if n != q))
        assert len(got) == len(want)
        for (rnk, nid, ad2), (wd2, wn) in zip(got, want):
            assert nid == wn
            assert math.isclose(ad2, wd2, abs_tol=1e-4)


def test_ivfpq_partial_probe_deterministic_and_sane(spark, sf_dir):
    from scotustician_spark.operators.similarity import ivfpq_topk_onestep

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    a = sorted(
        map(
            tuple,
            ivfpq_topk_onestep(
                e, q, dim=64, k=3, n_cells=4, n_probe=2, m=4, n_codes=8
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            ivfpq_topk_onestep(
                e, q, dim=64, k=3, n_cells=4, n_probe=2, m=4, n_codes=8
            ).collect(),
        )
    )
    assert a == b
    assert len(a) > 0
    assert all(r[0] != r[1] for r in a)  # self excluded


def test_pq_partial_codebook_prefers_near_cluster(spark, sf_dir):
    """Lossy regime sanity: with a small codebook, neighbors still come
    from the query's own cluster and output is deterministic."""
    from scotustician_spark.operators.similarity import pq_topk_onestep

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, pq_topk_onestep(e, q, dim=64, k=3, m=4, n_codes=8).collect()))
    b = sorted(map(tuple, pq_topk_onestep(e, q, dim=64, k=3, m=4, n_codes=8).collect()))
    assert a == b
    assert len(a) > 0
    assert all(r[0] != r[1] for r in a)  # self excluded


def test_als_recommend_shape_and_coverage(spark):
    from scotustician_spark.ml.clustering import als_recommend

    rows = [
        (u, i, float((u * 7 + i * 3) % 5 + 1))
        for u in range(12)
        for i in range(20)
        if (u + i) % 3 != 0
    ]
    ratings = spark.createDataFrame(rows, "user int, item int, strength float")
    recs = als_recommend(ratings, "user", "item", "strength", k=4)
    got = recs.collect()
    per_user = {}
    for r in got:
        per_user.setdefault(r["user"], []).append(r)
    assert set(per_user) == set(range(12))  # every user covered
    assert all(len(v) == 4 for v in per_user.values())  # exactly k each
    assert all(r["score"] is not None for r in got)


def test_ann_rerank_exact_when_candidates_cover_corpus(spark, sf_dir):
    """With every cell probed and the candidate budget >= corpus size,
    stage 1 nominates everything, so the exact re-rank must reproduce
    the brute-force cosine top-k (same rounding, same tie order)."""
    from scotustician_spark.operators.similarity import (
        ann_rerank_topk,
        rank_topk,
        score_queries,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(40)
    q = e.filter(F.col("vec_id") < 3)
    got = sorted(
        (r["query_id"], r["rnk"], r["neighbor_id"])
        for r in ann_rerank_topk(
            e, q, dim=64, k=3, n_candidates=100, n_cells=4, n_probe=4
        ).collect()
    )
    want = sorted(
        (r["query_id"], r["rnk"], r["neighbor_id"])
        for r in rank_topk(score_queries(q, e), k=3).collect()
    )
    assert got == want


def test_ann_rerank_partial_probe_recall_not_worse_than_ivfpq(spark, sf_dir):
    """Re-ranking can reorder but never drops candidates stage 1 found:
    per query, rerank's neighbor set ⊆ IVFPQ's candidate set, and the
    exact-top-k hit rate of rerank >= that of taking IVFPQ's own top-k."""
    from scotustician_spark.operators.similarity import (
        ann_rerank_topk,
        ivfpq_topk_onestep,
        rank_topk,
        score_queries,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    kw = dict(dim=64, n_cells=4, n_probe=2, m=4, n_codes=8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in rank_topk(score_queries(q, e), k=3).collect()
    }
    pq_top = {
        (r["query_id"], r["neighbor_id"])
        for r in ivfpq_topk_onestep(e, q, k=3, **kw).collect()
    }
    rr_top = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_rerank_topk(e, q, k=3, n_candidates=50, **kw).collect()
    }
    assert len(rr_top & exact) >= len(pq_top & exact)


def test_power_pca_constant_embeddings_zero_projection(spark):
    """ADVICE r6: constant embeddings give an all-zero Gramian, so the
    power iteration's norm is 0.0 — must yield the all-zero projection
    (mirroring the oracle's coalesce(w / nullif(nrm,0), 0)), not
    ZeroDivisionError."""
    from scotustician_spark.ml.clustering import power_pca_2d

    df = spark.createDataFrame(
        [(i, [1.0, 1.0, 1.0]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    rows = power_pca_2d(df, "vec_id", "embedding", n_iters=3).collect()
    assert len(rows) == 5
    assert all(r["x"] == 0.0 and r["y"] == 0.0 for r in rows)
