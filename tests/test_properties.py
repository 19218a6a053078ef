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
        elif toks:
            exp = [" ".join(toks)]
        else:
            exp = []  # zero-token docs yield no shingles
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


asof_data = st.tuples(
    st.lists(  # left: (key, ts)
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=1,
        max_size=25,
    ),
    st.lists(  # right: (key, ts, value-or-null)
        st.tuples(
            st.integers(0, 3),
            st.integers(0, 50),
            st.one_of(st.none(), st.floats(-10, 10, allow_nan=False)),
        ),
        min_size=0,
        max_size=25,
    ),
)


@SLOW
@given(asof_data)
def test_asof_join_matches_argmax_oracle(spark, data):
    from scotustician_spark.operators.temporal import asof_join

    lrows, rrows = data
    lrows = [(k, t, i) for i, (k, t) in enumerate(lrows)]
    rrows = [(k, t, i, v) for i, (k, t, v) in enumerate(rrows)]
    left = spark.createDataFrame(lrows, "k int, ts long, lid int")
    right = spark.createDataFrame(rrows, "k int, rts long, rid int, rv double")
    got = {
        r["lid"]: (r["prior_id"], r["prior_v"])
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_payload={"rid": "prior_id", "rv": "prior_v"}, tie_col="rid",
        ).collect()
    }
    assert len(got) == len(lrows)  # left-outer: every left row once
    for k, t, lid in lrows:
        cands = [(rt, rid, rv) for rk, rt, rid, rv in rrows if rk == k and rt <= t]
        exp = max(cands)[1:] if cands else (None, None)
        # argmax row's value comes through verbatim — including None
        assert got[lid] == exp, (lid, got[lid], exp)


@SLOW
@given(texts)
def test_minhash_signature_matches_python(spark, docs):
    import hashlib

    from scotustician_spark.operators.dedup import (
        MINHASH_P,
        minhash_coeffs,
        minhash_signatures,
    )

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: list(r["mh"]) for r in minhash_signatures(df, "doc_id", "text", n=3, num_hashes=8).collect()}
    for i, t in rows:
        toks = t.lower().split()
        if len(toks) >= 3:
            sh = {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}
        elif toks:
            sh = {" ".join(toks)}
        else:
            sh = set()  # zero-token docs: no shingles → null minima
        if not sh:
            exp = [None] * 8
        else:
            hs = [
                int(hashlib.md5(s.encode()).hexdigest()[:12], 16) % MINHASH_P
                for s in sh
            ]
            exp = [min((a * h + b) % MINHASH_P for h in hs) for a, b in minhash_coeffs(8)]
        assert got[i] == exp, i


def test_lsh_hot_bucket_cap_drops_degenerate_buckets(spark):
    from scotustician_spark.operators.dedup import minhash_lsh_candidates

    # 6 identical boilerplate docs (one degenerate bucket of 6) plus a
    # genuine near-dup pair
    rows = [(i, "common boilerplate text repeated everywhere always") for i in range(6)]
    rows += [(10, "a unique document about spark and data"),
             (11, "a unique document about spark and data")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = minhash_lsh_candidates(df, "doc_id", "text").collect()
    capped = minhash_lsh_candidates(
        df, "doc_id", "text", max_bucket_size=5
    ).collect()
    # uncapped: 15 boilerplate pairs + the near-dup pair
    assert len(uncapped) == 16
    # capped at 5: the 6-doc bucket is dropped, the pair survives
    assert {(r["id_a"], r["id_b"]) for r in capped} == {(10, 11)}


scd2_data = st.lists(
    # (key, ts, state) — few keys/timestamps so ties and re-observations
    # are common; states from a 3-value set incl. None
    st.tuples(
        st.integers(0, 2),
        st.integers(0, 20),
        st.sampled_from(["a", "b", None]),
    ),
    min_size=1,
    max_size=30,
)


@SLOW
@given(scd2_data)
def test_scd2_intervals_match_python_oracle(spark, rows):
    from scotustician_spark.operators.temporal import scd2_intervals

    rows = [(k, t, s, i) for i, (k, t, s) in enumerate(rows)]
    df = spark.createDataFrame(rows, "k int, ts long, state string, eid int")
    got = sorted(
        (r["k"], r["version"], r["state"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_intervals(df, "k", "ts", ["state"], tie_col="eid").collect()
    )
    # oracle: per key, order by (ts, eid), collapse repeats, build intervals
    exp = []
    bykey: dict[int, list] = {}
    for k, t, s, i in rows:
        bykey.setdefault(k, []).append((t, i, s))
    for k, obs in bykey.items():
        obs.sort()
        changes = []
        prev = object()
        for t, _i, s in obs:
            if s != prev:
                changes.append((t, s))
                prev = s
        for v, (t, s) in enumerate(changes, start=1):
            nxt = changes[v][0] if v < len(changes) else None
            exp.append((k, v, s, t, nxt, nxt is None))
    assert got == sorted(exp)


quantile_data = st.lists(
    st.floats(min_value=0.0, max_value=99.999, allow_nan=False),
    min_size=1,
    max_size=200,
)


@SLOW
@given(quantile_data)
def test_quantile_step_estimate_within_one_bin(spark, values):
    """The histogram step quantile must bracket the true quantile
    within one bin width, for any data and any batching of partials."""
    from scotustician_spark.operators.quantiles import (
        quantile_finalize,
        quantile_merge,
        quantile_partial,
    )

    import math

    lo, hi, nb = 0.0, 100.0, 20
    width = (hi - lo) / nb
    df = spark.createDataFrame([("g", v) for v in values], "k string, v double")
    # batching equivalence is covered in unit tests; here: estimator
    # accuracy — the ceil(q·n)-th smallest value lives in the bin whose
    # lower edge the estimator returns
    state = quantile_merge(["k"], nb, quantile_partial(df, ["k"], "v", lo, hi, nb))
    qs = {"q10": 0.1, "q50": 0.5, "q90": 0.9}
    row = quantile_finalize(state, ["k"], qs, lo, hi, nb).collect()[0]
    svals = sorted(values)
    for name, q in qs.items():
        est = row[name]
        true = svals[max(0, math.ceil(q * len(svals)) - 1)]
        assert est <= true < est + width or true == est, (q, est, true)


@SLOW
@given(st.lists(st.sampled_from(list("abcdef")), min_size=0, max_size=40))
def test_duplicate_spans_cover_exactly_the_repeated_windows(spark, toks):
    """Every repeated k-window position lies inside a reported span,
    and every reported span is tiled by repeated windows."""
    from scotustician_spark.operators.spans import duplicate_spans

    k = 3
    text = " ".join(toks)
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    got = sorted(
        (r["span_start"], r["span_end"])
        for r in duplicate_spans(df, "doc_id", "text", k=k).collect()
    )
    # python oracle
    from collections import Counter

    grams = [tuple(toks[i : i + k]) for i in range(max(0, len(toks) - k + 1))]
    freq = Counter(grams)
    dup_starts = [i for i, g in enumerate(grams) if freq[g] >= 2]
    spans = []
    for s in dup_starts:
        if spans and s <= spans[-1][1]:
            spans[-1] = (spans[-1][0], max(spans[-1][1], s + k))
        else:
            spans.append((s, s + k))
    assert got == sorted(spans), (toks, got, spans)


entropy_texts = st.lists(
    st.text(
        alphabet=st.sampled_from("ab c"),  # tiny alphabet -> repeats + spaces
        min_size=0,
        max_size=40,
    ),
    min_size=1,
    max_size=12,
)


@SLOW
@given(entropy_texts)
def test_token_entropy_matches_python(spark, texts):
    """Entropy equals the collections.Counter computation and respects
    0 <= H <= ln(d) (rounding tolerance)."""
    import math
    from collections import Counter

    from scotustician_spark.operators.quality import token_entropy

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in token_entropy(df, "doc_id", "text").collect()}
    for i, t in rows:
        toks = t.lower().split()
        r = got[i]
        if not toks:
            assert r["entropy"] is None and r["n_tokens"] == 0
            continue
        n = len(toks)
        cnt = Counter(toks)
        want = sum((c / n) * math.log(n / c) for c in cnt.values())
        assert abs(r["entropy"] - want) < 1e-5
        assert -1e-9 <= r["entropy"] <= math.log(max(2, len(cnt))) + 1e-5
        if len(cnt) > 1:
            assert abs(r["norm_entropy"] - want / math.log(len(cnt))) < 1e-5


chunk_texts = st.lists(
    st.text(alphabet=st.sampled_from("xy z"), min_size=0, max_size=60),
    min_size=1,
    max_size=10,
)


@SLOW
@given(chunk_texts)
def test_stride_chunks_cover_and_reconstruct(spark, texts):
    """Coverage property: chunk starts advance by stride, every token
    index is covered, and at stride == size the chunks concatenate back
    to exactly the tokenized text."""
    from scotustician_spark.operators.corpus import stride_chunks

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = stride_chunks(df, "doc_id", "text", size=5, stride=5).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in rows:
        toks = t.split()
        chunks = sorted(by_doc.get(i, []), key=lambda r: r["chunk_idx"])
        if not toks:
            assert chunks == []
            continue
        rebuilt = " ".join(c["chunk_text"] for c in chunks).split()
        assert rebuilt == toks  # disjoint cover at stride == size
        assert sum(c["n_chunk_tokens"] for c in chunks) == len(toks)


bpe_texts = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "ab", "the", "cat"]),
        min_size=0,
        max_size=25,
    ).map(" ".join),
    min_size=1,
    max_size=12,
)


@SLOW
@given(texts=bpe_texts)
def test_bpe_apply_matches_python_on_random_corpora(spark, tmp_path_factory, texts):
    """bpe_apply_tokenize vs the pure-Python Sennrich merge loop on
    random small-alphabet corpora — the tiny alphabet forces dense
    adjacent-pair chains (the overlap-consumption edge cases)."""
    from collections import Counter

    from scotustician_spark.plans.vectors_text import (
        _BPE_K,
        bpe_apply_tokenize,
    )

    d = str(tmp_path_factory.mktemp("bpeprop"))
    rows = [(i, t, "s", 0) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, label int"
    ).write.parquet(f"{d}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_bpe_tokens"])
        for r in bpe_apply_tokenize(spark, d).collect()
    }

    toks = [t.split() for t in texts]
    pc = Counter()
    for ts in toks:
        for a, b in zip(ts, ts[1:]):
            pc[(a, b)] += 1
    merges = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:_BPE_K]
    for i, ts in enumerate(toks):
        seq = list(ts)
        for (a, b), _ in merges:
            out, j = [], 0
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == a and seq[j + 1] == b:
                    out.append(seq[j] + "~" + seq[j + 1])
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            seq = out
        assert got[i] == (len(ts), len(seq)), (texts[i], seq, got[i])


@SLOW
@given(
    texts=st.lists(
        st.text(
            alphabet="abc xyz",
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=15,
    )
)
def test_quality_classifier_invariants(spark, tmp_path_factory, texts):
    """Score is in (0, 1) and NULL exactly for token-free docs;
    keep == (rounded score >= 0.5); n_feats == tokens + bigrams."""
    from scotustician_spark.plans.corpus_q import quality_classifier_filter

    d = str(tmp_path_factory.mktemp("qcprop"))
    rows = [(i, t, "s", 0) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, label int"
    ).write.parquet(f"{d}/documents.parquet")
    got = {r["doc_id"]: r for r in quality_classifier_filter(spark, d).collect()}
    for i, t in enumerate(texts):
        n_tok = len(t.split())
        r = got[i]
        assert r["n_feats"] == n_tok + max(n_tok - 1, 0)
        if n_tok == 0:
            assert r["quality_score"] is None and r["keep"] == 0
        else:
            assert 0.0 < r["quality_score"] < 1.0
            assert r["keep"] == (1 if r["quality_score"] >= 0.5 else 0)


sample_data = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=500),  # doc_id (dups allowed? no: see below)
        st.sampled_from(["s1", "s2", "s3", "s4"]),
        st.integers(min_value=1, max_value=1000),  # weight
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


@SLOW
@given(sample_data, st.integers(min_value=1, max_value=12))
def test_per_source_cap_matches_python_oracle(spark, data, cap):
    """Two-phase cap == pure-Python rank-by-(md5 bucket, id) <= cap."""
    import hashlib

    from scotustician_spark.operators.corpus import per_source_cap

    df = spark.createDataFrame(
        [(i, s) for i, s, _ in data], "doc_id long, source string"
    )
    got = sorted(
        (r["source"], r["doc_id"])
        for r in per_source_cap(df, "source", "doc_id", cap=cap).collect()
    )

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[8:16], 16) % 1000

    want = []
    by_src: dict = {}
    for i, s, _ in data:
        by_src.setdefault(s, []).append(i)
    for s, ids in by_src.items():
        for i in sorted(ids, key=lambda x: (bucket(x), x))[:cap]:
            want.append((s, i))
    assert got == sorted(want)


@SLOW
@given(sample_data, st.integers(min_value=1, max_value=6))
def test_weighted_reservoir_matches_python_oracle(spark, data, k):
    """Sharded two-stage selection == pure-Python top-k by the exact
    rounded Efraimidis-Spirakis key."""
    import hashlib
    import math

    from scotustician_spark.operators.corpus import weighted_reservoir_sample

    df = spark.createDataFrame(data, "doc_id long, source string, w long")
    got = sorted(
        (r["source"], r["doc_id"], r["rnk"])
        for r in weighted_reservoir_sample(
            df, ["source"], "w", "doc_id", k=k
        ).collect()
    )

    def key(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[12:20], 16)
        return round(math.log((h + 0.5) / 4294967296.0) / w, 9)

    want = []
    by_src: dict = {}
    for i, s, w in data:
        by_src.setdefault(s, []).append((i, w))
    for s, rows in by_src.items():
        ranked = sorted(rows, key=lambda t: (-key(*t), t[0]))[:k]
        want += [(s, i, r + 1) for r, (i, _) in enumerate(ranked)]
    assert got == sorted(want)
