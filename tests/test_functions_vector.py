"""Unit tests for vector HOF functions vs numpy (float64 oracle)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from scotustician_spark.functions import vector as V

VECS = [
    ([1.0, 2.0, 3.0], [4.0, 5.0, 6.0], 2.0),
    ([0.5, -1.5, 2.5], [1.0, 1.0, 1.0], 1.0),
    ([1e-3, 1e3, -7.0], [2.0, -2.0, 0.25], 3.5),
]


@pytest.fixture(scope="module")
def vdf(spark):
    return spark.createDataFrame(
        [(i, a, b, w) for i, (a, b, w) in enumerate(VECS)],
        "id int, a array<float>, b array<float>, w double",
    )


def test_dot_norm_cosine_l2(vdf):
    rows = vdf.select(
        "id",
        V.dot("a", "b").alias("dot"),
        V.l2_norm("a").alias("na"),
        V.cosine_similarity("a", "b").alias("cos"),
        V.l2_distance("a", "b").alias("dist"),
    ).collect()
    for r in sorted(rows, key=lambda r: r["id"]):
        a = np.array(VECS[r["id"]][0], dtype=np.float64)
        b = np.array(VECS[r["id"]][1], dtype=np.float64)
        assert math.isclose(r["dot"], float(a @ b), rel_tol=1e-6)
        assert math.isclose(r["na"], float(np.linalg.norm(a)), rel_tol=1e-6)
        exp_cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert math.isclose(r["cos"], exp_cos, rel_tol=1e-6)
        assert math.isclose(r["dist"], float(np.linalg.norm(a - b)), rel_tol=1e-5)


def test_scale_add_normalize(vdf):
    r = (
        vdf.select(
            V.scale("a", F.lit(2.0)).alias("s"),
            V.add("a", "b").alias("p"),
            V.normalize("a").alias("n"),
        )
        .limit(1)
        .collect()[0]
    )
    a = np.array(VECS[0][0], dtype=np.float32)
    b = np.array(VECS[0][1], dtype=np.float32)
    assert np.allclose(r["s"], a * 2, rtol=1e-6)
    assert np.allclose(r["p"], a + b, rtol=1e-6)
    assert np.allclose(r["n"], a / np.linalg.norm(a.astype(np.float64)), rtol=1e-6)


def test_assert_dim(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0]), (3, None)], "id int, v array<float>"
    )
    kept = V.assert_dim(df, "v", 2).collect()
    assert [r["id"] for r in kept] == [1]


def test_weighted_mean_vectors(spark):
    # oracle: numpy float64 weighted mean per group
    data = [
        ("g1", [1.0, 2.0], 1.0),
        ("g1", [3.0, 4.0], 3.0),
        ("g2", [10.0, 0.0], 2.0),
    ]
    df = spark.createDataFrame(data, "g string, v array<float>, w double")
    out = {
        r["g"]: r["mean_vec"]
        for r in V.weighted_mean_vectors(df, ["g"], "v", "w").collect()
    }
    g1 = (np.array([1.0, 2.0]) * 1.0 + np.array([3.0, 4.0]) * 3.0) / 4.0
    assert np.allclose(out["g1"], g1, rtol=1e-9)
    assert np.allclose(out["g2"], [10.0, 0.0], rtol=1e-9)
    # vector order must survive the per-dim shuffle (SURVEY §7 hard #4)
    wide = spark.createDataFrame(
        [("g", list(map(float, range(64))), 1.0)], "g string, v array<float>, w double"
    )
    res = V.weighted_mean_vectors(wide, ["g"], "v", "w").collect()[0]["mean_vec"]
    assert res == [float(i) for i in range(64)]


def test_pooled_vectors_numpy_oracle(spark):
    import numpy as np

    from scotustician_spark.functions.vector import pooled_vectors

    rows = [
        (0, [1.0, -2.0, 3.0]),
        (0, [3.0, 0.0, -1.0]),
        (1, [0.0, 0.0, 2.0]),
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    got = {r["label"]: r for r in pooled_vectors(df, ["label"], "embedding").collect()}
    for lbl in (0, 1):
        mat = np.array([v for g, v in rows if g == lbl])
        assert np.allclose(got[lbl]["max_vec"], mat.max(axis=0))
        assert np.allclose(got[lbl]["mean_vec"], mat.mean(axis=0))
        unit = mat.mean(axis=0) / np.linalg.norm(mat.mean(axis=0))
        assert np.allclose(got[lbl]["unit_mean_vec"], unit)
        assert abs(np.linalg.norm(got[lbl]["unit_mean_vec"]) - 1.0) < 1e-9


def test_pooled_vectors_zero_mean_guard(spark):
    from scotustician_spark.functions.vector import pooled_vectors

    # mean vector is exactly zero -> unit_mean is NULL-elements, not a crash
    rows = [(0, [1.0, -1.0]), (0, [-1.0, 1.0])]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    r = pooled_vectors(df, ["label"], "embedding").collect()[0]
    assert r["mean_vec"] == [0.0, 0.0]
    assert all(x is None for x in r["unit_mean_vec"])
