"""Unit tests for the analytics-extension operators: Misra-Gries heavy
hitters, calendar gap-fill + LOCF, blocked fuzzy pairs."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_misra_gries_candidates_superset(spark):
    """Every item with freq > n/k must survive the per-partition
    summaries regardless of partitioning."""
    from scotustician_spark.operators.frequency import misra_gries_candidates

    rows = (
        [("hot",)] * 50
        + [("warm",)] * 20
        + [(f"cold{i}",) for i in range(100)]
    )
    df = spark.createDataFrame(rows, "item string").repartition(7)
    n = df.count()
    k = 10  # threshold n/k = 17: hot & warm must survive
    cands = {r["item"] for r in misra_gries_candidates(df, "item", k).collect()}
    assert {"hot", "warm"} <= cands


def test_heavy_hitters_exact(spark):
    """heavy_hitters == plain groupBy/HAVING for any min_freq
    compatible with the summary width."""
    from scotustician_spark.operators.frequency import heavy_hitters

    rows = (
        [("a",)] * 30 + [("b",)] * 12 + [("c",)] * 11 + [(f"x{i}",) for i in range(60)]
    )
    df = spark.createDataFrame(rows, "item string").repartition(5)
    got = {
        (r["item"], r["freq"])
        for r in heavy_hitters(df, "item", min_freq=11, k=64).collect()
    }
    want = {
        (r["item"], r["cnt"])
        for r in df.groupBy("item")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 11)
        .collect()
    }
    assert got == want == {("a", 30), ("b", 12), ("c", 11)}


def test_gap_fill_daily_zero_and_locf(spark):
    from scotustician_spark.operators.timeseries import gap_fill_daily

    obs = spark.createDataFrame(
        [
            ("k1", dt.date(2024, 1, 1), 2, 10.0),
            ("k1", dt.date(2024, 1, 4), 1, 40.0),
            ("k2", dt.date(2024, 1, 2), 3, 99.0),
        ],
        "key string, day date, n long, price double",
    )
    out = {
        (r["key"], r["day"].isoformat()): r
        for r in gap_fill_daily(
            obs, "key", "day", zero_cols=["n"], locf_cols=["price"]
        ).collect()
    }
    # dense axis: global span 1/1..1/4 for BOTH keys
    assert len(out) == 8
    r = out[("k1", "2024-01-02")]
    assert (r["is_observed"], r["n"], r["price"]) == (False, 0, 10.0)  # LOCF
    r = out[("k1", "2024-01-04")]
    assert (r["is_observed"], r["n"], r["price"]) == (True, 1, 40.0)
    r = out[("k2", "2024-01-01")]
    assert (r["is_observed"], r["n"], r["price"]) == (False, 0, None)  # pre-first
    r = out[("k2", "2024-01-03")]
    assert (r["is_observed"], r["n"], r["price"]) == (False, 0, 99.0)


def test_duplicate_spans_merge_and_bounds(spark):
    """Shared 3-gram runs must merge into one maximal span per doc with
    exact token bounds; unique docs produce no spans."""
    from scotustician_spark.operators.spans import duplicate_spans

    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "x a b c d y"),
            (3, "totally unique words here only once"),
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_len"], r["n_shingles"])
        for r in duplicate_spans(df, "doc_id", "text", k=3).collect()
    }
    # shared k-grams: "a b c" and "b c d" → doc1 starts {0,1} → [0,4),
    # doc2 starts {1,2} → [1,5); doc3 absent
    assert got == {1: (0, 4, 4, 2), 2: (1, 5, 4, 2)}


def test_pagerank_matches_numpy_reference(spark):
    """Fixed-iteration PageRank must equal the dense numpy recurrence
    on a small graph with a hub, a chain, and an isolated vertex."""
    import numpy as np

    from scotustician_spark.operators.graph import pagerank

    edges = [(1, 2), (1, 3), (1, 4), (4, 5)]  # hub 1; chain 4-5; 6 isolated
    e_df = spark.createDataFrame(edges, "id_a int, id_b int")
    v_df = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id int")
    got = {
        r["doc_id"]: (r["degree"], r["pagerank"])
        for r in pagerank(e_df, v_df, n_iter=8).collect()
    }

    ids = list(range(1, 7))
    idx = {v: i for i, v in enumerate(ids)}
    adj = np.zeros((6, 6))
    for a, b in edges:
        adj[idx[a]][idx[b]] = 1
        adj[idx[b]][idx[a]] = 1
    outdeg = adj.sum(axis=1)
    r = np.full(6, 1 / 6)
    d = 0.85
    for _ in range(8):
        contrib = np.zeros(6)
        for u in range(6):
            if outdeg[u] > 0:
                contrib += adj[u] * (r[u] / outdeg[u])
        r = (1 - d) / 6 + d * contrib
    for v in ids:
        deg, pr = got[v]
        assert deg == int(outdeg[idx[v]])
        assert abs(pr - r[idx[v]]) < 1e-12, (v, pr, r[idx[v]])
    # hub most central; isolated holds the floor
    assert got[1][1] == max(p for _, p in got.values())
    assert abs(got[6][1] - (1 - d) / 6) < 1e-12


def test_frequent_pairs_apriori_pruning(spark):
    """Pair support counts distinct baskets; items below item-support
    never reach the pair expansion even when their pair would qualify."""
    from scotustician_spark.operators.baskets import frequent_pairs

    rows = [
        (1, "a"), (1, "b"), (1, "r"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"), (3, "b"),  # dup item row: distinct per basket
        (4, "r"), (4, "s"),
        (5, "r"), (5, "s"),
    ]
    df = spark.createDataFrame(rows, "basket int, item string")
    got = {
        (r["item_a"], r["item_b"]): r["support"]
        for r in frequent_pairs(
            df, "basket", "item", min_support=3, pair_min_support=2
        ).collect()
    }
    # a,b frequent (3 baskets each) → pair (a,b) support 3;
    # r appears in 3 baskets but s only 2 → (r,s) pruned by item support
    assert got == {("a", "b"): 3}


def test_psi_nonnegative_and_present(spark, sf_dir):
    """Every PSI term (p-q)·ln(p/q) is >= 0 by sign agreement, so the
    metric is non-negative for any pair of distributions — structural
    sanity for the drift query (exact values are oracle-gated)."""
    from scotustician_spark.plans import QUERY_REGISTRY

    out = QUERY_REGISTRY["psi_drift"].fn(spark, sf_dir).collect()
    assert out and all(r["psi"] is not None and r["psi"] >= 0 for r in out)


def test_dataset_mix_rates_and_determinism(spark):
    """The binding source keeps everything; keep rates follow the
    target weights; unlisted sources are dropped; survivors are
    partitioning-invariant."""
    from scotustician_spark.operators.corpus import dataset_mix

    rows = [(i, "a" if i < 400 else ("b" if i < 500 else "junk")) for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id int, source string")
    w = {"a": 0.5, "b": 0.5}
    out = dataset_mix(df, "source", w, id_col="doc_id")
    got = out.groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in got}
    # cap = min(400/0.5, 100/0.5) = 200 → a keeps 250‰ (~100 of 400),
    # b keeps 1000‰ (all 100); junk never appears
    assert set(counts) == {"a", "b"}
    assert counts["b"] == 100
    assert 70 <= counts["a"] <= 130  # md5-uniform ≈ 100
    ids1 = {r["doc_id"] for r in out.collect()}
    ids2 = {r["doc_id"] for r in dataset_mix(df.repartition(13), "source", w).collect()}
    assert ids1 == ids2


def test_quantile_state_merge_equals_single_pass(spark):
    """merge(partial(A), partial(B), partial(C)) must equal
    partial(A∪B∪C) for any batching, and the step estimator must hit
    hand-computed values."""
    from scotustician_spark.operators.quantiles import (
        quantile_finalize,
        quantile_merge,
        quantile_partial,
    )

    rows = [("g", float(v)) for v in range(100)]  # 0..99 uniform
    df = spark.createDataFrame(rows, "k string, v double")
    lo, hi, nb = 0.0, 100.0, 10  # width 10
    parts = [
        quantile_partial(df.filter(F.col("v") % 3 == i), ["k"], "v", lo, hi, nb)
        for i in range(3)
    ]
    merged = quantile_merge(["k"], nb, *parts)
    single = quantile_partial(df, ["k"], "v", lo, hi, nb)
    assert merged.collect() == single.collect()

    out = quantile_finalize(
        merged, ["k"], {"p50": 0.5, "p90": 0.9}, lo, hi, nb
    ).collect()[0]
    # ceil(0.5*100)=50 reached in bin 4 (cum 50) → edge 40;
    # ceil(0.9*100)=90 reached in bin 8 (cum 90) → edge 80
    assert (out["n"], out["p50"], out["p90"]) == (100, 40.0, 80.0)


def test_quantile_clamp_outside_envelope(spark):
    from scotustician_spark.operators.quantiles import (
        quantile_finalize,
        quantile_partial,
    )

    df = spark.createDataFrame(
        [("k", -5.0), ("k", 1.0), ("k", 999.0)], "k string, v double"
    )
    st = quantile_partial(df, ["k"], "v", 0.0, 10.0, 5)
    out = quantile_finalize(st, ["k"], {"p99": 0.99}, 0.0, 10.0, 5).collect()[0]
    assert out["n"] == 3  # clamped, not dropped
    assert out["p99"] == 8.0  # top bin edge


def test_blocked_levenshtein_pairs(spark):
    from scotustician_spark.operators.fuzzy import (
        blocked_levenshtein_pairs,
        length_prefix_block,
    )

    df = spark.createDataFrame(
        [
            (1, "widget-alpha"),
            (2, "widget-alphb"),   # distance 1 from id 1
            (3, "widget-gamma"),   # same block, distance 4
            (4, "gadget-alpha"),   # different prefix → different block
            (5, "widget-alpha"),   # exact dup of id 1 → distance 0
        ],
        "id int, name string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in blocked_levenshtein_pairs(
            df, "id", "name", length_prefix_block("name", 6), max_distance=1
        ).collect()
    }
    assert pairs == {(1, 2): 1, (1, 5): 0, (2, 5): 1}


def test_sequence_gaps_bucket_boundaries(spark):
    """Gaps inside buckets, across bucket boundaries, and spanning
    entire empty buckets must all be found exactly once."""
    from scotustician_spark.operators.gaps import sequence_gaps

    ids = [1, 2, 3, 7, 8, 9, 10, 25, 40, 41]  # width 8 → buckets 0,8,24,40
    df = spark.createDataFrame([(i,) for i in ids], "id int")
    got = sorted(
        (r["gap_start"], r["gap_end"], r["gap_len"])
        for r in sequence_gaps(df, "id", bucket_width=8).collect()
    )
    assert got == [(4, 6, 3), (11, 24, 14), (26, 39, 14)]


def test_quantile_interpolated_finalizer(spark):
    """Uniform in-bin data: interpolation recovers the exact order
    statistic the step rule quantizes away."""
    from scotustician_spark.operators.quantiles import (
        quantile_finalize,
        quantile_partial,
    )

    df = spark.createDataFrame(
        [("g", float(v)) for v in range(100)], "k string, v double"
    )
    st = quantile_partial(df, ["k"], "v", 0.0, 100.0, 10)
    out = quantile_finalize(
        st, ["k"], {"p50": 0.5, "p95": 0.95}, 0.0, 100.0, 10, interpolate=True
    ).collect()[0]
    # bin 4 holds 40..49 (10 rows, cum_before 40): target 50 → frac 1.0
    # → 40 + 10·1.0 = 50; target 95 → bin 9, frac (95-90)/10 → 95.0
    assert (out["p50"], out["p95"]) == (50.0, 95.0)


def test_pmi_pairs_collocation_scores(spark):
    import math

    from scotustician_spark.operators.tfidf import pmi_pairs

    # 'new york' always adjacent; 'foo' and 'bar' never co-occur
    docs = spark.createDataFrame(
        [(i, "new york is big and foo " + ("bar " if i % 2 else "baz ")) for i in range(10)],
        "doc_id long, text string",
    )
    out = {r["pair"]: r for r in pmi_pairs(docs, "doc_id", "text", window=2, min_count=5, top_n=50).collect()}
    assert "new york" in out
    ny = out["new york"]
    assert ny["n_pair"] == 10 and ny["count_a"] == 10 and ny["count_b"] == 10
    # PMI sanity: observed co-occurrence far above independence -> positive
    assert ny["pmi"] > 0
    # hand-check: p(ab)=10/N_pairs, p(a)=p(b)=10/N_toks
    toks_per_doc = 7
    N_tok = 10 * toks_per_doc
    # window-2 pairs per doc: (n-1) + (n-2) = 6 + 5 = 11
    N_pair_total = 10 * 11
    want = math.log((10 / N_pair_total) / ((10 / N_tok) * (10 / N_tok)))
    assert abs(ny["pmi"] - want) < 1e-6


def test_event_rate_anomaly_flags_spike(spark, tmp_path):
    import datetime as dt

    from scotustician_spark.plans import QUERY_REGISTRY

    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    # 30 hours of steady traffic (2/hour ± 1 alternating), then a 40x spike
    for h in range(30):
        n = 40 if h == 29 else (2 if h % 2 == 0 else 3)
        for _ in range(n):
            eid += 1
            rows.append((eid, base + dt.timedelta(hours=h, minutes=eid % 50), 1, "view", 0.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r["hour_s"]: r for r in QUERY_REGISTRY["event_rate_anomaly"].fn(spark, str(tmp_path)).collect()}
    spike = out[(base + dt.timedelta(hours=29)).strftime("%Y-%m-%d %H:%M:%S")]
    assert spike["cnt"] == 40 and spike["is_anomaly"]
    normal = out[(base + dt.timedelta(hours=28)).strftime("%Y-%m-%d %H:%M:%S")]
    assert not normal["is_anomaly"]
    # rows only exist once 24 trailing buckets accumulated
    assert all(k >= (base + dt.timedelta(hours=24)).strftime("%Y-%m-%d %H:%M:%S") for k in out)


def test_event_cusum_changepoint_locates_level_shift(spark, tmp_path):
    import datetime as dt

    from scotustician_spark.plans import QUERY_REGISTRY

    rows, eid = [], 0
    base = dt.datetime(2024, 1, 1)
    # 2/hour for 50 hours, then 10/hour for 50 hours: the level shift
    # at hour 50 is where CUSUM of standardized deviations peaks (the
    # minimum of the drifting-down segment before the mean crosses)
    for h in range(100):
        for _ in range(2 if h < 50 else 10):
            eid += 1
            rows.append((eid, base + dt.timedelta(hours=h, minutes=eid % 45), 1, "view", 0.0, "{}"))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = QUERY_REGISTRY["event_cusum_changepoint"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    cp = dt.datetime.strptime(out[0]["cp_hour_s"], "%Y-%m-%d %H:%M:%S")
    # peak |CUSUM| lands exactly at the last pre-shift hour
    assert cp == base + dt.timedelta(hours=49)
    assert out[0]["abs_peak"] > 10


def test_winsorized_stats_hand_values(spark, tmp_path):
    from scotustician_spark.plans import QUERY_REGISTRY

    # 21 values 0..18 plus outliers -1000 and +1000: p05 of n=21 sits
    # exactly on index 1 ((n-1)*0.05 = 1.0 -> value 0), p95 on index 19
    # (value 18); the two outliers clip to [0, 18]
    vals = [-1000.0] + [float(v) for v in range(19)] + [1000.0]
    rows = [(i, "P", v) for i, v in enumerate(vals)]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = QUERY_REGISTRY["winsorized_order_stats"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 21 and r["n_clip_lo"] == 1 and r["n_clip_hi"] == 1
    # winsorized mean: (0 + sum(0..18) + 18) / 21
    want = (0 + sum(range(19)) + 18) / 21
    assert abs(r["mean_winsor"] - round(want, 4)) < 1e-9
    assert r["mean_raw"] == round(sum(vals) / 21, 4)

def test_mmr_diversify_greedy_order_and_diversity(spark):
    """Hand-computable MMR. Candidates: the query itself (rel 1.0), a
    near-duplicate of it, and a diverse vector. Rank 1 is always the
    most relevant. At low lambda (diversity-heavy) the diverse
    candidate must outrank the redundant near-duplicate; at lambda=1
    MMR degenerates to pure relevance order."""
    from scotustician_spark.operators.similarity import mmr_diversify

    rows = [
        (0, [1.0, 0.0, 0.0]),     # the query vector itself: rel 1.0
        (1, [0.999, 0.04, 0.0]),  # near-duplicate of 0
        (2, [0.6, 0.0, 0.8]),     # diverse, moderately relevant
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter("vec_id = 0").select("embedding")

    def order(lam, k=3):
        out = mmr_diversify(
            emb, q, id_col="vec_id", vec_col="embedding",
            k=k, n_candidates=3, lam=lam,
        ).collect()
        return [r["vec_id"] for r in sorted(out, key=lambda r: r["mmr_rank"])]

    # lam=1.0: pure relevance => 0, then near-dup 1, then 2
    assert order(1.0) == [0, 1, 2]
    # lam=0.3: diversity dominates => the diverse 2 beats the near-dup:
    # pick2 scores: near-dup 0.3*rel - 0.7*sim(0) ~ -0.4*1 = -0.4,
    # diverse 0.3*0.6 - 0.7*0.6 = -0.24 => 2 wins
    assert order(0.3) == [0, 2, 1]


def test_kaplan_meier_hand_example(spark, tmp_path):
    """KM estimator on a constructed cohort written as an events table:
    one event_type, durations 1,1,2,9,10 with obs end at day 10 =>
    users with last event in the final 7 days (durations 9, 10 here,
    since their last events land on days 9 and 10 of a 10-day window)
    are censored. Churn days: 1 (d=2, n=5) and 2 (d=1, n=3):
    S(1) = 1 - 2/5 = 0.6; S(2) = 0.6 * (1 - 1/3) = 0.4."""
    import datetime as dt

    from scotustician_spark.plans import QUERY_REGISTRY

    base = dt.datetime(2024, 1, 1)
    spans = {1: 1, 2: 1, 3: 2, 4: 9, 5: 10}
    rows = []
    for uid, dur in spans.items():
        rows.append((uid * 10, base, uid, "purchase", 1.0, "{}"))
        rows.append(
            (uid * 10 + 1, base + dt.timedelta(days=dur), uid, "purchase", 1.0, "{}")
        )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    ev.write.parquet(f"{tmp_path}/events.parquet")
    out = QUERY_REGISTRY["kaplan_meier_retention"].fn(spark, str(tmp_path))
    got = {r["day"]: r for r in out.collect()}
    # churn day 1: 2 of 5 at risk
    assert got[1]["n_churned"] == 2 and got[1]["n_at_risk"] == 5
    assert abs(got[1]["survival"] - 0.6) < 1e-9
    # churn day 2: 1 of 3 still at risk
    assert got[2]["n_churned"] == 1 and got[2]["n_at_risk"] == 3
    assert abs(got[2]["survival"] - 0.4) < 1e-9
    # censored tail days: survival carries flat (no churn contribution)
    assert got[9]["n_censored"] == 1 and abs(got[9]["survival"] - 0.4) < 1e-9
    assert got[10]["n_censored"] == 1 and abs(got[10]["survival"] - 0.4) < 1e-9


def test_welch_ttest_closed_form(spark, tmp_path):
    """Welch t on a hand case: A = {1,2,3} (mean 2, var 1), B = {2,4,6}
    (mean 4, var 4): t = -2/sqrt(1/3 + 4/3) = -1.549193,
    df = (5/3)^2 / ((1/3)^2/2 + (4/3)^2/2) = 450/153 = 2.941176."""
    from scotustician_spark.plans import QUERY_REGISTRY

    rows = [(i, "t", "en", src, n) for i, (src, n) in enumerate(
        [("a", 1), ("a", 2), ("a", 3), ("b", 2), ("b", 4), ("b", 6)]
    )]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    out = QUERY_REGISTRY["welch_ttest_sources"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source_a"], r["source_b"]) == ("a", "b")
    assert abs(r["t_stat"] - (-1.549193)) < 1e-6
    assert abs(r["welch_df"] - 2.941176) < 1e-6


def test_gini_closed_form(spark, tmp_path):
    """Gini on hand cases: equal revenues => 0; all revenue in one of
    four customers => 2*(4*4)/(4*4) - 5/4 = 0.75."""
    from scotustician_spark.plans import QUERY_REGISTRY

    rows = (
        [(i, "EQ", 100 + i, 5.0) for i in range(4)]
        + [(10 + i, "SKEW", 200 + i, 0.0) for i in range(3)]
        + [(13, "SKEW", 203, 4.0)]
    )
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_custkey long, "
        "o_totalprice double",
    ).write.parquet(f"{tmp_path}/orders.parquet")
    out = {
        r["priority"]: r
        for r in QUERY_REGISTRY["gini_revenue_concentration"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert abs(out["EQ"]["gini"] - 0.0) < 1e-9
    assert abs(out["SKEW"]["gini"] - 0.75) < 1e-9


def test_token_heavy_hitters_derived_k_keeps_mg_exact(spark):
    """Round-7 review finding: a FIXED Misra-Gries width k silently
    drops true heavy hitters once n/k exceeds min_freq — exactly the
    regime the MG arm is selected for. The derived-k default must keep
    the MG arm equal to the exact groupby arm, and an over-cap derived
    k must fall back to groupby rather than run an unsound summary."""
    from pyspark.sql import functions as F

    from scotustician_spark.operators.frequency import token_heavy_hitters

    # 'hot' appears 3 times up front, then 1000 distinct junk tokens:
    # with k=16, each decrement-all retires hot after <=3 floods, so a
    # fixed small width loses it even though freq == min_freq == 3
    docs = [(0, "hot hot hot")] + [
        (i, f"junk{i}a junk{i}b junk{i}c junk{i}d") for i in range(1, 251)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string").coalesce(1)

    exact = {
        (r["token"], r["freq"])
        for r in token_heavy_hitters(
            df, "text", min_freq=3, strategy="groupby"
        ).collect()
    }
    assert ("hot", 3) in exact

    # the hazard itself, pinned where partitioning is caller-controlled
    # (token_heavy_hitters repartitions internally, which spreads the
    # junk floods thin): one partition, k=16, 1000 distinct junk tokens
    # after hot×3 → ≥3 decrement-all events → hot's counter dies
    from scotustician_spark.operators.frequency import heavy_hitters

    toks = (
        df.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .coalesce(1)
    )
    fixed_small = {
        (r["token"], r["freq"])
        for r in heavy_hitters(toks, "token", min_freq=3, k=16).collect()
    }
    assert ("hot", 3) not in fixed_small  # the documented hazard

    derived = {
        (r["token"], r["freq"])
        for r in token_heavy_hitters(
            df, "text", min_freq=3, strategy="misra_gries"
        ).collect()
    }
    assert derived == exact

    capped = {
        (r["token"], r["freq"])
        for r in token_heavy_hitters(
            df, "text", min_freq=3, strategy="misra_gries", mg_max_k=10
        ).collect()
    }
    assert capped == exact  # over-cap derived k -> exact groupby arm


def test_gap_fill_daily_null_measures_and_empty_cols(spark):
    """Round-7 review findings: a genuinely observed row whose marker
    column is NULL must still report is_observed=true (existence comes
    from the JOIN, not a measure's nullness), and the axis-only call
    (both column lists empty) must work instead of IndexError."""
    from scotustician_spark.operators.timeseries import gap_fill_daily

    obs = spark.createDataFrame(
        [("a", "2026-01-01", 5, 1.0), ("a", "2026-01-03", None, None)],
        "k string, d string, n long, v double",
    ).select("k", F.col("d").cast("date").alias("d"), "n", "v")

    rows = {
        str(r["d"]): r
        for r in gap_fill_daily(
            obs, "k", "d", zero_cols=["n"], locf_cols=["v"]
        ).collect()
    }
    assert rows["2026-01-01"]["is_observed"] is True
    assert rows["2026-01-02"]["is_observed"] is False
    # observed row with NULL measures: observed, zero-filled, carried
    assert rows["2026-01-03"]["is_observed"] is True
    assert rows["2026-01-03"]["n"] == 0
    assert rows["2026-01-03"]["v"] == 1.0  # LOCF across the NULL

    axis_only = gap_fill_daily(
        obs, "k", "d", zero_cols=[], locf_cols=[]
    ).collect()
    assert len(axis_only) == 3
    assert sum(r["is_observed"] for r in axis_only) == 2


def test_banded_levenshtein_finds_insert_delete_pairs(spark):
    """Round-7 review finding: the exact-length block key structurally
    misses every insertion/deletion pair (the majority class at
    distance 1). The banded variant must find them, emit each pair
    once, and agree with a naive quadratic band join."""
    from scotustician_spark.operators.fuzzy import (
        banded_levenshtein_pairs,
        blocked_levenshtein_pairs,
        length_prefix_block,
    )

    rows = [
        (1, "smith"),
        (2, "smiths"),   # insertion of 's': distance 1, length differs
        (3, "smyth"),    # substitution: distance 1, same length
        (4, "jones"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")

    exact_key = {
        (r["id_a"], r["id_b"])
        for r in blocked_levenshtein_pairs(
            df, "id", "name", length_prefix_block("name", 2)
        ).collect()
    }
    assert exact_key == {(1, 3)}  # substitutions only

    banded = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in banded_levenshtein_pairs(
            df, "id", "name", prefix_len=2, max_distance=1
        ).collect()
    }
    # the insert pair appears, once, alongside the substitution pair;
    # (2,3) is distance 2 and excluded
    assert banded == {(1, 2, 1), (1, 3, 1)}

    naive = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in df.alias("a")
        .crossJoin(df.alias("b"))
        .filter(F.col("a.id") < F.col("b.id"))
        .filter(
            (F.substring("a.name", 1, 2) == F.substring("b.name", 1, 2))
            & (F.abs(F.length("a.name") - F.length("b.name")) <= 1)
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.levenshtein("a.name", "b.name").alias("distance"),
        )
        .filter(F.col("distance") <= 1)
        .collect()
    }
    assert banded == naive
