"""Property-based differential tests (hypothesis): random inputs, the
Spark operator vs a pure numpy/Python oracle. Few examples per
property (each is a distributed job), but each example is a whole
random dataset."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from scotustician_spark.functions import vector as V
from scotustician_spark.functions.text import word_shingles

SLOW = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

vec_data = st.lists(
    st.tuples(
        st.sampled_from(["g1", "g2", "g3"]),
        st.lists(
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        st.floats(min_value=0.1, max_value=10, allow_nan=False),
    ),
    min_size=1,
    max_size=30,
)


@SLOW
@given(vec_data)
def test_weighted_mean_matches_numpy(spark, data):
    df = spark.createDataFrame(data, "g string, v array<float>, w double")
    out = {r["g"]: r["mean_vec"] for r in V.weighted_mean_vectors(df, ["g"], "v", "w").collect()}
    groups = {}
    for g, v, w in data:
        groups.setdefault(g, []).append((np.array(v, dtype=np.float32).astype(np.float64), w))
    assert set(out) == set(groups)
    for g, rows in groups.items():
        num = sum(v * w for v, w in rows)
        den = sum(w for _, w in rows)
        assert np.allclose(out[g], num / den, rtol=1e-9, atol=1e-9), g


texts = st.lists(
    st.text(
        alphabet=st.sampled_from("ab c\tde  f"), min_size=0, max_size=40
    ),
    min_size=1,
    max_size=20,
)


@SLOW
@given(texts)
def test_shingles_match_python(spark, docs):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "id int, text string")
    got = {r["id"]: r["sh"] for r in df.select("id", word_shingles("text", 3).alias("sh")).collect()}
    for i, t in enumerate(docs):
        toks = t.strip().lower().split()
        if len(toks) >= 3:
            exp = [" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)]
        else:
            exp = [" ".join(toks)]
        assert got[i] == exp, (i, t)


@SLOW
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
            min_size=3,
            max_size=3,
        ),
        min_size=2,
        max_size=12,
    )
)
def test_blocked_pairwise_cosine_matches_numpy(spark, vecs):
    from scotustician_spark.operators.similarity import pairwise_cosine_blocked

    # skip zero vectors (cosine undefined)
    vecs = [v for v in vecs if any(abs(x) > 1e-6 for x in v)]
    if len(vecs) < 2:
        return
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in pairwise_cosine_blocked(
            df, "vec_id", "embedding", threshold=-2.0, n_blocks=3
        ).collect()
    }
    A = np.array(vecs, dtype=np.float32).astype(np.float64)
    A /= np.linalg.norm(A, axis=1, keepdims=True)
    S = A @ A.T
    exp_pairs = {(i, j) for i in range(len(vecs)) for j in range(i + 1, len(vecs))}
    assert set(got) == exp_pairs
    for (i, j), sim in got.items():
        assert sim == pytest.approx(S[i, j], abs=1e-9)
