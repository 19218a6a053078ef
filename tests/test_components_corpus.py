"""Connected components (vs a pure-Python union-find oracle) and
corpus-assembly operators (splits / stratified sampling / packing)."""

from __future__ import annotations

import json
import random

from pyspark.sql import functions as F

from scotustician_spark.operators.components import (
    connected_components,
    dedup_resolution,
)
from scotustician_spark.operators.corpus import (
    assign_splits,
    hash_bucket,
    pack_by_budget,
    stratified_sample,
)
from scotustician_spark.streaming.windows import hopping_agg


def _union_find(n_vertices, edges):
    parent = list(range(n_vertices))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component = min vertex id reachable
    comp = {}
    for v in range(n_vertices):
        r = find(v)
        comp[v] = min(u for u in range(n_vertices) if find(u) == r)
    return comp


def test_connected_components_matches_union_find(spark):
    rng = random.Random(13)
    n = 60
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
    edges = [(a, b) for a, b in edges if a != b]
    exp = _union_find(n, edges)
    e_df = spark.createDataFrame(edges, "id_a int, id_b int")
    v_df = spark.createDataFrame([(i,) for i in range(n)], "doc_id int")
    got = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(e_df, v_df).collect()
    }
    assert got == exp  # includes singletons labeled by themselves


def test_connected_components_chain_diameter(spark):
    # a path graph exercises multi-round propagation: 0-1-2-...-9
    edges = [(i, i + 1) for i in range(9)]
    e_df = spark.createDataFrame(edges, "id_a int, id_b int")
    v_df = spark.createDataFrame([(i,) for i in range(10)], "doc_id int")
    got = connected_components(e_df, v_df).collect()
    assert all(r["component_id"] == 0 for r in got)


def test_connected_components_string_ids(spark):
    # real domain keys are strings (docket numbers like '80-1538'); the
    # convergence checksum must not assume numeric labels, and a path
    # graph (diameter > 1) catches a loop that bails after one round
    edges = [("80-1538", "81-0003"), ("81-0003", "79-0442"), ("02-102", "02-241")]
    verts = [(v,) for v in ["80-1538", "81-0003", "79-0442", "02-102", "02-241", "solo-1"]]
    e_df = spark.createDataFrame(edges, "id_a string, id_b string")
    v_df = spark.createDataFrame(verts, "doc_id string")
    got = {r["doc_id"]: r["component_id"] for r in connected_components(e_df, v_df).collect()}
    assert got["80-1538"] == got["81-0003"] == got["79-0442"] == "79-0442"
    assert got["02-102"] == got["02-241"] == "02-102"
    assert got["solo-1"] == "solo-1"


def test_ngram_jaccard_zero_token_docs_never_pair(spark):
    from scotustician_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, ""), (4, "  "), (5, "dup text here"), (6, "dup text here")],
        "doc_id int, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.5).collect()
    }
    assert pairs == {(5, 6)}


def test_ngram_jaccard_duplicate_rows_no_self_pairs(spark):
    from scotustician_spark.operators.dedup import ngram_jaccard_pairs

    # same doc_id appearing twice must not pair with itself
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        "doc_id int, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.5).collect()
    }
    assert pairs == {(1, 2)}


def test_simhash_zero_token_docs_absent(spark):
    from scotustician_spark.operators.dedup import simhash_signatures

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "real content")], "doc_id int, text string"
    )
    out = simhash_signatures(df, "doc_id", "text").collect()
    assert [r["doc_id"] for r in out] == [4]
    assert out[0]["simhash"] != "0" * len(out[0]["simhash"])


def test_simhash_pandas_kernel_matches_expr(spark):
    """The Arrow-batched kernel must be bit-identical to the Catalyst
    expression — including nulls, blanks, Unicode whitespace (ASCII-only
    tokenizer classes), repeated tokens, and sub-n-token docs."""
    from scotustician_spark.operators.dedup import (
        simhash_signature_expr,
        simhash_signature_pandas,
    )

    rows = [
        (1, None),
        (2, ""),
        (3, "  \t\n "),
        (4, "real content here"),
        (5, "the the the quick brown fox"),
        (6, "MiXeD Case TOKENS"),
        (7, "a"),
        (8, "nbsp joined tokens"),  #   is NOT ASCII \s — one token
        (9, "tab\tand\nnewline  edges\t"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    for bits in (16, 32, 64):
        a = df.select(
            "doc_id", simhash_signature_expr("text", bits).alias("s")
        ).collect()
        b = df.select(
            "doc_id", simhash_signature_pandas("text", bits).alias("s")
        ).collect()
        assert {r["doc_id"]: r["s"] for r in a} == {r["doc_id"]: r["s"] for r in b}


def test_minhash_pandas_kernel_matches_expr(spark):
    """Arrow MinHash kernel must be element-identical to the HOF
    expression — null text → null row value, blank → null-element
    array, sub-n-token docs → whole-text shingle."""
    from scotustician_spark.operators.dedup import (
        minhash_signature_array,
        minhash_signature_pandas,
    )

    rows = [
        (1, None),
        (2, ""),
        (3, " \t "),
        (4, "one"),
        (5, "one two"),
        (6, "the quick brown fox jumps over the lazy dog"),
        (7, "Tab\tseparated\ntokens here"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    a = {
        r["doc_id"]: r["mh"]
        for r in df.select(
            "doc_id", minhash_signature_array("text").alias("mh")
        ).collect()
    }
    b = {
        r["doc_id"]: r["mh"]
        for r in df.select(
            "doc_id", minhash_signature_pandas("text").alias("mh")
        ).collect()
    }
    assert a == b


def test_dedup_resolution_keeper_and_size(spark):
    e_df = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "id_a int, id_b int")
    v_df = spark.createDataFrame([(i,) for i in range(1, 10)], "doc_id int")
    rows = {r["doc_id"]: r for r in dedup_resolution(e_df, v_df).collect()}
    assert rows[1]["component_size"] == 3 and rows[1]["is_keeper"]
    assert rows[3]["component_id"] == 1 and not rows[3]["is_keeper"]
    assert rows[7]["component_size"] == 2 and rows[7]["is_keeper"]
    assert rows[5]["component_size"] == 1 and rows[5]["is_keeper"]


def _docs(spark, n=400):
    rows = [(i, ["en", "de", "fr"][i % 3], 100 + (i * 37) % 900) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")


def test_assign_splits_deterministic_and_partitioning_invariant(spark):
    d = _docs(spark)
    a = {r["doc_id"]: r["split"] for r in assign_splits(d).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in assign_splits(d.repartition(13, "lang")).collect()
    }
    assert a == b  # same assignment at any partitioning
    frac_train = sum(1 for s in a.values() if s == "train") / len(a)
    assert 0.7 < frac_train < 0.9  # ~80% by hash


def test_stratified_sample_rates_and_determinism(spark):
    d = _docs(spark)
    kept = stratified_sample(d, "lang", {"en": 0, "de": 500}).collect()
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r["lang"], 0)
        by_lang[r["lang"]] += 1
    assert "en" not in by_lang  # rate 0 drops the stratum entirely
    assert by_lang["fr"] == len([r for r in d.collect() if r["lang"] == "fr"])
    n_de = len([r for r in d.collect() if r["lang"] == "de"])
    assert 0.3 * n_de < by_lang["de"] < 0.7 * n_de
    again = stratified_sample(d, "lang", {"en": 0, "de": 500}).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in kept)


def test_pack_by_budget_invariants(spark):
    d = _docs(spark)
    budget = 2000
    packed = pack_by_budget(d, "n_chars", budget, n_shards=4).collect()
    assert len(packed) == d.count()  # packing never drops rows
    by_shard = {}
    for r in packed:
        assert 0 <= r["offset_in_seq"] < budget
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["doc_id"])
        # seq_id is non-decreasing in id order and offsets restate the
        # running total: before_i = seq_id * budget + offset
        before = 0
        for r in rows:
            assert r["seq_id"] == before // budget
            assert r["offset_in_seq"] == before % budget
            before += r["n_chars"]


def test_hash_bucket_offsets_are_independent(spark):
    d = _docs(spark)
    out = d.select(
        hash_bucket("doc_id", 2).alias("a"), hash_bucket("doc_id", 2, hex_off=9).alias("b")
    ).collect()
    # different hex windows must not produce the same bucketing
    assert any(r["a"] != r["b"] for r in out)


def test_hopping_agg_streaming_mode(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    rows = [
        {"ts": "2024-01-01T00:10:00", "user_id": 1, "event_type": "a", "value": 1.0},
        {"ts": "2024-01-01T00:40:00", "user_id": 1, "event_type": "a", "value": 2.0},
    ]
    (src / "e.json").write_text("\n".join(json.dumps(r) for r in rows))
    schema = "ts timestamp, user_id long, event_type string, value double"
    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        hopping_agg(stream, "1 hour", "30 minutes", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("hopping_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"].isoformat(), r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM hopping_out").collect()
    }
    # 00:10 → windows [23:30, 00:00]; 00:40 → [00:00, 00:30]
    assert got == {
        ("2023-12-31T23:30:00", "a"): 1,
        ("2024-01-01T00:00:00", "a"): 2,
        ("2024-01-01T00:30:00", "a"): 1,
    }


def test_minhash_lsh_null_text_never_pairs(spark):
    from scotustician_spark.operators.dedup import minhash_lsh_candidates

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "real text here okay"), (4, "")],
        "doc_id int, text string",
    )
    # zero-token docs (null OR whitespace-only) yield no shingles and
    # must never pair — with each other or anything else: one shared
    # bucket for them is an n² pair bomb at corpus scale, and SQL
    # oracles' unnest drops them entirely
    assert minhash_lsh_candidates(df, "doc_id", "text").collect() == []
    df2 = spark.createDataFrame(
        [(1, None), (2, ""), (3, ""), (4, "same words"), (5, "same words")],
        "doc_id int, text string",
    )
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_candidates(df2, "doc_id", "text").collect()}
    assert pairs == {(4, 5)}


def test_incremental_dedup_triage(spark):
    from scotustician_spark.functions.text import fingerprint
    from scotustician_spark.operators.dedup import incremental_dedup, minhash_bands

    base = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog every day"),
            (2, "completely different base content about spark engines"),
        ],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [
            # exact dup of base 1 modulo whitespace/case normalization
            (10, "  The quick   brown fox jumps over the lazy dog every day "),
            # near dup of base 1 (one word appended keeps 10/11 shingles,
            # J=0.91 -> shares a band under the mixing hash family;
            # the pre-round-7 one-word-CHANGED variant at J=0.5 only
            # banded under the degenerate correlated family)
            (11, "the quick brown fox jumps over the lazy dog every day too"),
            # novel
            (12, "nothing like anything in the base at all whatsoever"),
            # zero-token: no bands, no fp match -> keep
            (13, None),
        ],
        "doc_id long, text string",
    )
    base_fps = base.select(fingerprint("text").alias("fp"))
    base_bands = minhash_bands(base, "doc_id", "text")
    out = {
        r["doc_id"]: r
        for r in incremental_dedup(
            delta, base_fps, base_bands, "doc_id", "text"
        ).collect()
    }
    assert out[10]["is_exact_dup"] and out[10]["decision"] == "drop_exact"
    assert not out[11]["is_exact_dup"]
    assert out[11]["n_near_candidates"] >= 1
    assert out[11]["decision"] == "review_near"
    assert out[12]["decision"] == "keep" and out[12]["n_near_candidates"] == 0
    assert out[13]["decision"] == "keep"
    assert sorted(out) == [10, 11, 12, 13]


def test_stable_global_index_matches_naive_window(spark):
    from pyspark.sql.window import Window as W

    from scotustician_spark.operators.corpus import stable_global_index

    df = spark.range(0, 2000).select(
        (F.col("id") * 37 % 1000).alias("k"), F.col("id").alias("uid")
    )
    out = stable_global_index(df, ["k", "uid"], num_partitions=8)
    naive = df.withColumn(
        "global_idx", F.row_number().over(W.orderBy("k", "uid")).cast("long") - 1
    )
    assert sorted(map(tuple, out.select("k", "uid", "global_idx").collect())) == sorted(
        map(tuple, naive.select("k", "uid", "global_idx").collect())
    )


def test_stable_global_index_no_single_partition_exchange_on_data(spark):
    from scotustician_spark.operators.corpus import stable_global_index

    df = spark.range(0, 100).select(F.col("id").alias("uid"))
    out = stable_global_index(df, ["uid"], num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the placed relation is MATERIALIZED once (the AQE row-loss fix),
    # so the downstream plan reads the checkpoint, and the range
    # partitioning lives in the CHECKPOINTED relation — assert it via
    # the actual partitioning of the materialized RDD (4 range
    # partitions carrying the sorted data)...
    assert "ExistingRDD" in plan or "LogicalRDD" in plan, plan
    pid_counts = (
        out.select(F.spark_partition_id().alias("p"))
        .groupBy("p")
        .count()
        .collect()
    )
    # ...and by the data NOT sitting on one partition
    assert len(pid_counts) > 1, pid_counts
    # the only SinglePartition exchange allowed is the tiny
    # per-partition-counts side (broadcast input)
    data_side = plan.split("BroadcastExchange")[0]
    assert "SinglePartition" not in data_side, data_side


def test_simhash_near_pairs_recall_and_hamming(spark):
    from scotustician_spark.operators.dedup import simhash_near_pairs

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # identical -> hamming 0, must be found
            (3, base.replace("dog", "cat")),  # near variant
            (4, "entirely unrelated text about query engines and shuffles"),
            (5, None),  # zero-token: absent from signatures, never pairs
            (6, ""),
        ],
        "doc_id long, text string",
    )
    out = simhash_near_pairs(df, "doc_id", "text", bits=32, n_bands=4, max_hamming=3)
    rows = {(r["id_a"], r["id_b"]): r for r in out.collect()}
    assert (1, 2) in rows
    r12 = rows[(1, 2)]
    assert r12["hamming"] == 0 and r12["sig_a"] == r12["sig_b"]
    assert len(r12["sig_a"]) == 32
    # ordering invariant + no self/null pairs
    for (a, b), r in rows.items():
        assert a < b
        assert a in (1, 2, 3, 4) and b in (1, 2, 3, 4)
        assert r["hamming"] <= 3


def test_stride_chunks_windows_and_edges(spark):
    from scotustician_spark.operators.corpus import stride_chunks

    docs = spark.createDataFrame(
        [
            (1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),  # 10 tokens
            (2, "a b c"),  # fits one window
            (3, "   "),  # blank -> no chunks
            (4, None),  # null -> no chunks
        ],
        "doc_id long, text string",
    )
    out = stride_chunks(docs, "doc_id", "text", size=4, stride=3).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: ceil((10-4)/3)+1 = 3 chunks at starts 0, 3, 6
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["chunk_text"] for r in c1] == [
        "t0 t1 t2 t3",
        "t3 t4 t5 t6",
        "t6 t7 t8 t9",
    ]
    assert [r["n_chunk_tokens"] for r in c1] == [4, 4, 4]
    # doc 2: one whole-text chunk
    assert [(r["chunk_idx"], r["chunk_text"]) for r in by_doc[2]] == [(0, "a b c")]
    # blank/null docs emit nothing
    assert 3 not in by_doc and 4 not in by_doc
    # overlap invariant: consecutive chunks share size - stride tokens
    assert c1[0]["chunk_text"].split()[-1] == c1[1]["chunk_text"].split()[0]


def test_stride_chunks_short_tail(spark):
    from scotustician_spark.operators.corpus import stride_chunks

    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    # n=5, size=4, stride=3: chunks at 0 (a b c d) and 3 (d e) — the
    # tail chunk is short but starts inside the text
    out = sorted(
        stride_chunks(docs, "doc_id", "text", size=4, stride=3).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [(r["chunk_text"], r["n_chunk_tokens"]) for r in out] == [
        ("a b c d", 4),
        ("d e", 2),
    ]


def test_stride_chunks_stride_gt_size_no_phantom_chunks(spark):
    """Round-6 review: stride > size (gap sampling) overcounted —
    ceil((n-size)/stride)+1 includes starts PAST the text end,
    emitting zero-token chunks with empty text. Every emitted chunk
    must start within the text and be non-empty."""
    from scotustician_spark.operators.corpus import stride_chunks

    # 13 tokens, size=4, stride=8: starts 0 and 8 only (start 16 > 13)
    text = " ".join(f"t{i}" for i in range(13))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sorted(
        stride_chunks(docs, "doc_id", "text", size=4, stride=8).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [(r["chunk_idx"], r["n_chunk_tokens"]) for r in out] == [
        (0, 4),
        (1, 4),
    ]
    assert all(r["n_chunk_tokens"] > 0 and r["chunk_text"] for r in out)
    # boundary: n exactly on a stride multiple (n=16, stride=8) keeps
    # the start-16 chunk OUT (it would begin past the last token)
    t2 = " ".join(f"t{i}" for i in range(16))
    d2 = spark.createDataFrame([(1, t2)], "doc_id long, text string")
    out2 = stride_chunks(d2, "doc_id", "text", size=4, stride=8).collect()
    assert sorted(r["chunk_idx"] for r in out2) == [0, 1]


def test_hash_bucket_rejects_truncating_offsets(spark):
    """hex_off past 25 silently truncated the 8-hex window to fewer
    bits inside dataset_mix's window — now rejected outright."""
    import pytest

    from scotustician_spark.operators.corpus import hash_bucket

    with pytest.raises(ValueError, match="hex_off"):
        hash_bucket("doc_id", 1000, hex_off=27)
    with pytest.raises(ValueError, match="hex_off"):
        hash_bucket("doc_id", 1000, hex_off=0)


def test_source_overlap_exact_jaccard(spark):
    from scotustician_spark.operators.corpus import source_overlap

    docs = spark.createDataFrame(
        [
            (1, "A", "a b c d"),  # shingles {a b c, b c d}
            (2, "B", "b c d e"),  # shingles {b c d, c d e}
            (3, "B", "b c d"),  # duplicate shingle within B -> set semantics
            (4, "C", "x y z"),  # disjoint
            (5, "C", None),  # null text contributes nothing
        ],
        "doc_id long, source string, text string",
    )
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap(docs, "source", "text", n=3).collect()
    }
    # only A-B share a shingle; C pairs are absent (no shared shingles)
    assert set(rows) == {("A", "B")}
    ab = rows[("A", "B")]
    assert (ab["n_a"], ab["n_b"], ab["n_inter"]) == (2, 2, 1)
    assert abs(ab["jaccard"] - 1 / 3) < 1e-6  # jaccard rounds at 6 decimals


def test_incremental_components_equals_full_recompute(spark):
    from scotustician_spark.operators.components import (
        connected_components,
        incremental_components,
    )

    base_edges = spark.createDataFrame(
        [(1, 2), (3, 4)], "id_a long, id_b long"
    )
    verts = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id long")
    state = connected_components(base_edges, verts)
    # delta bridges the two base components AND introduces new vertices
    delta = spark.createDataFrame(
        [(2, 3), (6, 7)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["component_id"]
        for r in incremental_components(state, delta).collect()
    }
    all_edges = base_edges.unionByName(delta)
    all_verts = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    want = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(all_edges, all_verts).collect()
    }
    assert got == want
    assert got[4] == 1  # bridged: {1,2,3,4} collapse to min id 1
    assert got[5] == 5  # untouched singleton survives
    assert got[6] == 6 and got[7] == 6  # brand-new component from delta only


def test_incremental_components_chain_of_batches(spark):
    """Associativity over batches: ((base + d1) + d2) == full."""
    from scotustician_spark.operators.components import (
        connected_components,
        incremental_components,
    )

    verts = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    base = spark.createDataFrame([(5, 6)], "id_a long, id_b long")
    d1 = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    d2 = spark.createDataFrame([(2, 5)], "id_a long, id_b long")
    s0 = connected_components(base, verts)
    s1 = incremental_components(s0, d1)
    s2 = incremental_components(s1, d2)
    got = {r["doc_id"]: r["component_id"] for r in s2.collect()}
    full = connected_components(
        base.unionByName(d1).unionByName(d2), verts
    )
    want = {r["doc_id"]: r["component_id"] for r in full.collect()}
    assert got == want
    assert got[6] == 1  # 6-5-2-1 chain collapsed across three batches


def test_temperature_mix_rebalances_toward_small_sources(spark):
    import math

    from scotustician_spark.operators.corpus import temperature_mix

    # 400 'big' docs vs 25 'small' docs
    rows = [(i, "big" if i < 400 else "small") for i in range(425)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = temperature_mix(df, "src", alpha=0.5, id_col="doc_id")
    kept = {}
    for r in out.collect():
        kept[r["src"]] = kept.get(r["src"], 0) + 1
    # the smallest source keeps everything
    assert kept["small"] == 25
    # big keeps ~ floor(1000*sqrt(25/400))/1000 = 25% (md5-bucket noise)
    want_rate = math.floor(1000 * math.sqrt(25 / 400)) / 1000
    assert abs(kept["big"] / 400 - want_rate) < 0.08
    # deterministic: identical survivor set on re-run and re-partition
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in temperature_mix(
            df.repartition(7, "src"), "src", alpha=0.5, id_col="doc_id"
        ).collect()
    )
    assert a == b


def test_chunk_lang_consistency_flags_code_switching(spark, tmp_path):
    from scotustician_spark.plans import QUERY_REGISTRY

    en = "the cat is in the house and that is good " * 8  # ~80 tokens
    es = "el perro es de la casa y que es un dia " * 8
    docs = spark.createDataFrame(
        [
            (1, en + es, "en", "s", 0),  # code-switched: en chunk(s) + es chunk(s)
            (2, en, "en", "s", 0),  # monolingual
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in QUERY_REGISTRY["chunk_lang_consistency"].fn(spark, str(tmp_path)).collect()
    }
    assert out[2]["n_langs"] == 1 and not out[2]["is_mixed"]
    assert out[2]["major_lang"] == "en" and out[2]["major_frac"] == 1.0
    assert out[1]["is_mixed"] and out[1]["n_langs"] >= 2
    assert out[1]["major_lang"] in ("en", "es")
    assert out[1]["major_frac"] < 1.0


def test_scripted_components_match_python_loop(spark):
    """The SQL-scripting fixpoint (DECLARE/WHILE/IF, ping-pong tables)
    must produce exactly the Python-loop labeling on a random graph."""
    rng = random.Random(7)
    n = 40
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(30)]
    edges = [(a, b) for a, b in edges if a != b]
    e_df = spark.createDataFrame(edges, "u long, v long")
    v_df = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    e_df.createOrReplaceTempView("t_script_edges")
    v_df.createOrReplaceTempView("t_script_verts")

    from scotustician_spark.operators.components import (
        scripted_connected_components,
    )

    got = {
        r["doc_id"]: r["component_id"]
        for r in scripted_connected_components(
            spark, "t_script_edges", "t_script_verts", "t_cc_demo"
        ).collect()
    }
    want = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(
            e_df, v_df, src="u", dst="v"
        ).collect()
    }
    assert got == want
    # managed ping-pong tables are cleaned up
    assert not [t.name for t in spark.catalog.listTables() if "t_cc_demo" in t.name]


def test_scripted_components_string_ids(spark):
    """String vertex ids (docket numbers) through the SQL script: the
    xxhash64 convergence checksum must handle non-numeric labels, and a
    diameter-2 chain must still fully converge (regression for the
    numeric CAST signal that crashed/mislabeled on string ids)."""
    # chain A-B-C (diameter 2) plus a singleton and a disjoint pair
    edges = [
        ("80-1538", "81-0042"),
        ("81-0042", "79-0991"),
        ("99-2000", "99-2001"),
    ]
    verts = ["80-1538", "81-0042", "79-0991", "99-2000", "99-2001", "zz-solo"]
    e_df = spark.createDataFrame(edges, "u string, v string")
    v_df = spark.createDataFrame([(x,) for x in verts], "doc_id string")
    e_df.createOrReplaceTempView("t_script_edges_s")
    v_df.createOrReplaceTempView("t_script_verts_s")

    from scotustician_spark.operators.components import (
        scripted_connected_components,
    )

    got = {
        r["doc_id"]: r["component_id"]
        for r in scripted_connected_components(
            spark, "t_script_edges_s", "t_script_verts_s", "t_cc_str"
        ).collect()
    }
    assert got == {
        "80-1538": "79-0991",
        "81-0042": "79-0991",
        "79-0991": "79-0991",
        "99-2000": "99-2000",
        "99-2001": "99-2000",
        "zz-solo": "zz-solo",
    }
    assert not [t.name for t in spark.catalog.listTables() if "t_cc_str" in t.name]


def test_scripted_components_restores_conf_and_cleans_on_failure(spark):
    """A failing script must still drop the ping-pong tables and restore
    the prior scripting.enabled conf value."""
    import pytest as _pytest

    from scotustician_spark.operators.components import (
        scripted_connected_components,
    )

    prior = spark.conf.get("spark.sql.scripting.enabled", None)
    with _pytest.raises(Exception):
        scripted_connected_components(
            spark, "no_such_edges_view", "no_such_verts_view", "t_cc_fail"
        )
    assert spark.conf.get("spark.sql.scripting.enabled", None) == prior
    assert not [t.name for t in spark.catalog.listTables() if "t_cc_fail" in t.name]


def test_prefix_filter_lossless_and_prunes(spark):
    """AllPairs/PPJoin: result equals brute-force shingle Jaccard >= t
    (losslessness theorem), and the prefix candidate set is strictly
    smaller than the all-shared-shingle candidate set on data with a
    frequent common shingle."""
    from pyspark.sql import functions as F

    from scotustician_spark.functions.text import word_shingles
    from scotustician_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs,
    )

    # every doc shares the 'the quick brown' opener (frequent shingle);
    # docs 1/2 are near-dups, 3/4 distinct tails
    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy dog today"),
        (3, "the quick brown bear sleeps under a warm winter moon"),
        (4, "the quick brown hare races across a frozen spring field"),
        (5, None),
        (6, "   "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in prefix_filtered_jaccard_pairs(
            df, "doc_id", "text", 0.5
        ).collect()
    }

    # brute force in Python over the same shingle sets
    sh = {
        r["doc_id"]: set(r["s"])
        for r in df.select(
            "doc_id", word_shingles("text", 3).alias("s")
        ).collect()
        if r["s"]
    }
    want = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            if inter:
                j = round(inter / (len(sh[a] | sh[b])), 6)
                if j >= 0.5:
                    want[(a, b)] = j
    assert got == want
    assert (1, 2) in got and got[(1, 2)] >= 0.5
    # pruning: pairs sharing ANY shingle = all of {1,2,3,4} choose 2
    # (the common opener), but only the near-dup pair survives — and
    # the prefix join must generate fewer candidates than that
    assert len(got) == 1


def test_dedup_cluster_purity_matches_python_composition(spark, tmp_path, sf_dir):
    """dedup_cluster_purity vs an independent Python composition: take
    the SAME Spark LSH candidate pairs, then do components (union-find),
    exact shingle Jaccard (python sets via word_shingles semantics) and
    the size rollup entirely in Python."""
    from collections import defaultdict

    from scotustician_spark.operators.dedup import minhash_lsh_candidates
    from scotustician_spark.plans.corpus_q import dedup_cluster_purity

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = [
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            docs, "doc_id", "text", n=3, num_hashes=16, band_size=4
        ).collect()
    ]
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}

    def shingles(t):
        toks = (t or "").lower().split()
        if len(toks) >= 3:
            return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        return {" ".join(toks)} if toks else set()

    # union-find over doc ids
    parent = {d: d for d in texts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    csize = defaultdict(int)
    for d in texts:
        csize[find(d)] += 1

    agg = defaultdict(lambda: [set(), 0, 0, 0, 1.0])  # comps, pairs, i, u, minj
    for a, b in pairs:
        sa, sb = shingles(texts[a]), shingles(texts[b])
        inter = len(sa & sb)
        uni = len(sa) + len(sb) - inter
        comp = find(a)
        size = csize[comp]
        e = agg[size]
        e[0].add(comp)
        e[1] += 1
        e[2] += inter
        e[3] += uni
        e[4] = min(e[4], inter / uni)
    want = {
        size: (len(e[0]), e[1], round(e[2] / e[3], 6), round(e[4], 6))
        for size, e in agg.items()
    }
    got = {
        r["component_size"]: (
            r["n_components"],
            r["n_pairs"],
            r["micro_jaccard"],
            r["min_jaccard"],
        )
        for r in dedup_cluster_purity(spark, sf_dir).collect()
    }
    assert got == want


def test_prefix_filter_fp_safe_bound(spark):
    """FP regression: ceil(0.7*10) must be 7, not 8 — raw float gives
    7.000000000000001 -> ceil 8, shortening doc A's prefix below the
    lossless length and silently dropping a pair with jaccard exactly
    at the threshold. Construction: A = 12 distinct words (10
    shingles), B = A's last 9 words (7 shingles, all shared) ->
    jaccard = 7/10 = 0.7; A's 3 unique shingles have tdf=1 and fill
    the whole prefix when the bound is oversized by the FP error."""
    from scotustician_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs,
    )

    words = (
        "alpha bravo charlie delta echo foxtrot "
        "golf hotel india juliet kilo lima"
    ).split()
    rows = [(1, " ".join(words)), (2, " ".join(words[3:]))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in prefix_filtered_jaccard_pairs(df, "doc_id", "text", 0.7).collect()
    }
    assert got == {(1, 2): 0.7}


def test_per_source_cap_matches_naive_window(spark):
    """The two-phase cap (whole-bucket filter + boundary-bucket-only
    row_number) is row-identical to the naive PARTITION BY source
    window for caps that land mid-bucket, at bucket edges, above the
    source size, and at zero survivors per bucket."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from scotustician_spark.operators.corpus import hash_bucket, per_source_cap

    rows = [(i, f"s{i % 3}") for i in range(300)] + [(1000, "tiny")]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    for cap in (1, 7, 50, 100, 500):
        got = sorted(
            (r["source"], r["doc_id"])
            for r in per_source_cap(df, "source", "doc_id", cap=cap).collect()
        )
        w = W.partitionBy("source").orderBy(
            hash_bucket("doc_id", 1000, hex_off=9), "doc_id"
        )
        want = sorted(
            (r["source"], r["doc_id"])
            for r in df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= cap)
            .collect()
        )
        assert got == want, f"cap={cap}"
        per_src = {}
        for s, _ in got:
            per_src[s] = per_src.get(s, 0) + 1
        assert all(v <= cap for v in per_src.values())


def test_weighted_reservoir_sample_properties(spark):
    """Sharded two-stage selection equals the naive per-group window
    (selection property), every group yields min(k, group_size) rows,
    and inclusion tracks weight: over md5-uniform keys a doc with 9x
    the weight of the rest must enter the k=1 sample for far more
    groups than 1/n would."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from scotustician_spark.operators.corpus import weighted_reservoir_sample

    # 40 groups x 10 docs; doc 0 of each group carries 9x weight
    rows = [
        (g * 100 + i, f"g{g}", 9000 if i == 0 else 1000)
        for g in range(40)
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w long")

    out = weighted_reservoir_sample(df, ["grp"], "w", "doc_id", k=3)
    got = sorted(
        (r["grp"], r["doc_id"], r["rnk"]) for r in out.collect()
    )
    key = F.round(
        F.log(
            (
                F.conv(
                    F.substring(F.md5(F.col("doc_id").cast("string")), 13, 8),
                    16,
                    10,
                ).cast("long")
                .cast("double")
                + 0.5
            )
            / 4294967296.0
        )
        / F.col("w"),
        9,
    )
    w = W.partitionBy("grp").orderBy(F.desc("__k"), F.asc("doc_id"))
    want = sorted(
        (r["grp"], r["doc_id"], r["rn"])
        for r in df.withColumn("__k", key)
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .collect()
    )
    assert got == want
    assert len(got) == 40 * 3
    # weight bias: the heavy doc (P[in k=1 sample] ~ 9/18 = 0.5 per
    # group) appears as rank-1 far more often than uniform 1/10 would
    top1_heavy = sum(
        1 for g, d, r in got if r == 1 and d % 100 == 0
    )
    assert top1_heavy >= 10  # E~20 of 40; uniform would give E=4


def test_stable_global_index_no_row_loss_with_aqe(spark):
    """Regression (caught by the sf0.1 oracle sweep): the (pid, rn)
    placement relation feeds two consumers; without a materialization
    AQE may coalesce the two re-executions of the range shuffle
    differently, giving disjoint __pid spaces — and the offset join
    silently DROPPED rows (150k -> 66k at sf0.1). Pin: every row
    survives and the index is exactly the permutation 0..n-1 in sort
    order, at a size where AQE coalescing decisions actually engage."""
    from pyspark.sql import functions as F

    from scotustician_spark.operators.corpus import stable_global_index

    n = 150_000
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % 1000003).alias("key"), F.col("id")
    )
    out = stable_global_index(df, ["key", "id"], name="gidx")
    rows = out.select("key", "id", "gidx").collect()
    assert len(rows) == n
    idx = sorted(r["gidx"] for r in rows)
    assert idx[0] == 0 and idx[-1] == n - 1 and len(set(idx)) == n
    # index order == (key, id) sort order
    by_idx = sorted(rows, key=lambda r: r["gidx"])
    assert [(r["key"], r["id"]) for r in by_idx] == sorted(
        (r["key"], r["id"]) for r in rows
    )


def test_update_dedup_index_two_batches_equal_one_shot(spark, tmp_path):
    """Maintaining the dedup index with two batches equals building it
    from the union in one shot, a replayed batch is a no-op, and
    incremental_dedup probes the maintained index correctly."""
    from scotustician_spark.operators.dedup import (
        incremental_dedup,
        minhash_bands,
        update_dedup_index,
    )
    from scotustician_spark.functions.text import fingerprint
    from pyspark.sql import functions as F

    fp_path = str(tmp_path / "fps")
    band_path = str(tmp_path / "bands")
    b1 = [(i, f"alpha beta gamma delta epsilon zeta {i % 3}") for i in range(10)]
    b2 = [(i, f"alpha beta gamma delta epsilon zeta {i % 3}") for i in range(10, 20)]
    df1 = spark.createDataFrame(b1, "doc_id long, text string")
    df2 = spark.createDataFrame(b2, "doc_id long, text string")

    s1 = update_dedup_index(df1, fp_path, band_path)
    assert s1["fp_inserted"] == 10 and s1["band_inserted"] > 0
    s_replay = update_dedup_index(df1, fp_path, band_path)
    assert s_replay["fp_inserted"] == 0 and s_replay["band_inserted"] == 0
    update_dedup_index(df2, fp_path, band_path)

    both = spark.createDataFrame(b1 + b2, "doc_id long, text string")
    want_bands = sorted(
        map(tuple, minhash_bands(both, "doc_id", "text").collect())
    )
    got_bands = sorted(map(tuple, spark.read.parquet(band_path).collect()))
    assert got_bands == want_bands
    want_fps = sorted(
        (r["doc_id"], r["fp"])
        for r in both.select("doc_id", fingerprint("text").alias("fp")).collect()
    )
    got_fps = sorted(
        (r["doc_id"], r["fp"]) for r in spark.read.parquet(fp_path).collect()
    )
    assert got_fps == want_fps

    # the probe half consumes the maintained index: an exact dup of a
    # base doc triages as drop_exact
    delta = spark.createDataFrame(
        [(100, b1[0][1]), (101, "totally unrelated words qrs tuv wxy zab")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["decision"]
        for r in incremental_dedup(
            delta,
            spark.read.parquet(fp_path),
            spark.read.parquet(band_path),
            "doc_id",
            "text",
        ).collect()
    }
    assert got[100] == "drop_exact"
    assert got[101] == "keep"


def test_source_overlap_sketch_tracks_exact(spark, sf_dir):
    """VERDICT r6 #3: the minhash sketch arm's per-pair estimate must
    track exact source Jaccard within MinHash(128) sampling error
    (std = sqrt(J(1-J)/128) <= 0.045; 4-sigma plus a floor), and
    every exact pair of non-empty sources must appear in the sketch
    output (the signature join emits ALL pairs)."""
    from scotustician_spark.operators.corpus import (
        source_overlap,
        source_overlap_sketch,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {
        (r["source_a"], r["source_b"]): r["jaccard"]
        for r in source_overlap(docs, "source", "text", n=3).collect()
    }
    est = {
        (r["source_a"], r["source_b"]): r["jaccard_est"]
        for r in source_overlap_sketch(
            docs, "source", "text", n=3, num_hashes=128
        ).collect()
    }
    assert set(exact) <= set(est)
    for pair, j in exact.items():
        tol = max(0.05, 4.0 * (j * (1.0 - j) / 128.0) ** 0.5)
        assert abs(est[pair] - j) <= tol, (pair, j, est[pair])
    # pairs absent from exact share no shingle: estimate must be ~0
    for pair in set(est) - set(exact):
        assert est[pair] <= 0.05, (pair, est[pair])


def test_source_overlap_auto_dispatch(spark):
    """choose_overlap_strategy picks exact below the threshold and
    sketch above; source_overlap_auto returns the same (source_a,
    source_b, jaccard) schema from either arm, and below threshold its
    values ARE the exact path's."""
    from scotustician_spark.operators.corpus import (
        choose_overlap_strategy,
        source_overlap,
        source_overlap_auto,
    )

    assert choose_overlap_strategy(1024) == "exact"
    assert choose_overlap_strategy(1 << 40) == "sketch"
    docs = spark.createDataFrame(
        [
            (1, "s1", "the quick brown fox jumps over the lazy dog"),
            (2, "s1", "pack my box with five dozen liquor jugs"),
            (3, "s2", "the quick brown fox jumps over the lazy dog"),
            (4, "s3", "sphinx of black quartz judge my vow"),
        ],
        "doc_id long, source string, text string",
    )
    # explicit thresholds: Catalyst's size stat for an in-memory
    # LocalRelation is the conservative huge default, which correctly
    # dispatches to sketch — pin each arm here instead
    lo = source_overlap_auto(docs, "source", "text", exact_threshold=1 << 63)
    hi = source_overlap_auto(docs, "source", "text", exact_threshold=0)
    assert lo.columns == ["source_a", "source_b", "jaccard"]
    assert hi.columns == ["source_a", "source_b", "jaccard"]
    want = {
        (r["source_a"], r["source_b"]): r["jaccard"]
        for r in source_overlap(docs, "source", "text").collect()
    }
    got = {(r["source_a"], r["source_b"]): r["jaccard"] for r in lo.collect()}
    assert got == want
    # identical duplicated docs across s1/s2: the sketch must call the
    # shared pair near its true Jaccard and the disjoint pair near 0
    hi_v = {(r["source_a"], r["source_b"]): r["jaccard"] for r in hi.collect()}
    assert hi_v[("s1", "s2")] >= 0.3
    # disjoint pair: zero matches are filtered (exact-arm contract)
    assert hi_v.get(("s2", "s3"), 0.0) <= 0.1


def test_source_overlap_auto_oracle_arm(spark, sf_dir):
    """The registered source_overlap_auto query's DuckDB oracle is the
    EXACT arm, which is only valid while every correctness-tier corpus
    sits below OVERLAP_EXACT_THRESHOLD_BYTES. Pin that assumption for
    all three gate SFs so testdata growth flips this test, not the
    driver's hash compare. (The x10+ tiers are above the threshold by
    design — the sketch arm is the measured ≤2x scale path there.)"""
    from scotustician_spark.operators.bloom import plan_size_bytes
    from scotustician_spark.operators.corpus import (
        OVERLAP_EXACT_THRESHOLD_BYTES,
        choose_overlap_strategy,
    )

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        docs = spark.read.parquet(f"/root/testdata/{sf}/documents.parquet")
        size = plan_size_bytes(docs)
        assert choose_overlap_strategy(size) == "exact", (
            f"{sf}: corpus plan size {size} crossed "
            f"OVERLAP_EXACT_THRESHOLD_BYTES={OVERLAP_EXACT_THRESHOLD_BYTES}; "
            "the source_overlap_auto oracle no longer matches the "
            "dispatched arm — re-derive the threshold or switch oracle"
        )


def test_dsir_weights_favor_target_like_docs(spark):
    """DSIR log-weights must rank docs sharing the target's vocabulary
    above docs that don't, score empty/NULL text exactly 0.0 (no
    evidence), and assign identically under repartitioning (md5
    buckets, no RNG)."""
    from pyspark.sql import functions as F

    from scotustician_spark.operators.corpus import dsir_log_weights

    rows = [
        (1, "alpha beta gamma alpha beta", "t"),   # target
        (2, "alpha gamma beta beta alpha", "t"),   # target
        (3, "alpha beta gamma beta", "r"),         # raw, target-like
        (4, "delta epsilon zeta delta zeta", "r"), # raw, disjoint
        (5, "", "r"),                               # empty
        (6, None, "r"),                             # NULL
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    out = dsir_log_weights(
        df, F.col("src") == "t", n_buckets=64
    )
    w = {r["doc_id"]: r for r in out.collect()}
    assert len(w) == 6
    assert w[3]["log_weight"] > w[4]["log_weight"]
    for d in (5, 6):
        assert w[d]["n_feats"] == 0
        assert w[d]["log_weight"] == 0.0
    again = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(
            df.repartition(7), F.col("src") == "t", n_buckets=64
        ).collect()
    }
    assert again == {k: v["log_weight"] for k, v in w.items()}
    # the served arrow kernel and the oracle-shaped expression arm must
    # be bit-identical on every column (same md5 buckets, same 12dp llr
    # summed in the same feature order, same Spark-side rounding)
    expr_rows = sorted(
        dsir_log_weights(
            df, F.col("src") == "t", n_buckets=64, kernel="expr"
        ).collect()
    )
    assert sorted(out.collect()) == expr_rows
    # non-ASCII whitespace (NBSP) must tokenize identically in both
    # arms: Java \s is ASCII-only, so the Python kernel's regexes are
    # ASCII-flagged — an NBSP-joined pair stays ONE token
    nb = spark.createDataFrame(
        [(7, "alpha beta gamma", "r")], "doc_id long, text string, src string"
    )
    a7 = dsir_log_weights(nb, F.lit(False), n_buckets=64).collect()[0]
    e7 = dsir_log_weights(nb, F.lit(False), n_buckets=64, kernel="expr").collect()[0]
    assert a7 == e7 and a7["n_feats"] == 3  # 2 tokens + 1 bigram
    # a NULL target predicate (src NULL → isin NULL) must mean "not
    # target" in both arms: count_if skips NULLs, and the kernel must
    # not let pandas NaN (truthy!) count the doc as target
    nulls = spark.createDataFrame(
        [(1, "alpha beta", None), (2, "alpha beta", "t")],
        "doc_id long, text string, src string",
    )
    pred = F.col("src") == "t"
    an = sorted(dsir_log_weights(nulls, pred, n_buckets=64).collect())
    en = sorted(
        dsir_log_weights(nulls, pred, n_buckets=64, kernel="expr").collect()
    )
    assert an == en  # NaN-as-target would skew the kernel's llr table


def test_connected_components_long_chain_pointer_doubling(spark):
    """A 200-vertex path has diameter 199 > the 30-round cap: pure
    one-hop hash-min would exhaust max_iter and (before the doubling
    fix) SILENTLY return min-within-30-hops labels. Pointer doubling
    must converge in ~log2(199)+2 rounds and label everything 0 — and
    an impossibly small cap must raise rather than mislabel."""
    import pytest

    n = 200
    e_df = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a int, id_b int"
    )
    v_df = spark.createDataFrame([(i,) for i in range(n)], "doc_id int")
    got = connected_components(e_df, v_df).collect()
    assert len(got) == n
    assert all(r["component_id"] == 0 for r in got)

    with pytest.raises(ValueError, match="did not converge"):
        connected_components(e_df, v_df, max_iter=3).collect()


def test_dsir_serving_unseen_buckets_and_mismatch_guard(spark):
    """Serving off persisted counts: features hashing to buckets ABSENT
    from the state must score with the Laplace formula's zero-count llr
    (ln((R+aB)/(T+aB))), not 0.0; and counts built with a larger
    n_buckets than served must be rejected loudly."""
    import math

    import pytest
    from pyspark.sql import functions as F

    from scotustician_spark.operators.corpus import (
        dsir_bucket_counts,
        dsir_score_from_counts,
    )

    B = 64
    seen = spark.createDataFrame(
        [(1, "alpha beta", True), (2, "gamma delta", False)],
        "doc_id long, text string, is_target boolean",
    )
    counts = dsir_bucket_counts(seen, F.col("is_target"), n_buckets=B)
    rows = counts.collect()
    tot_r = sum(r["cr"] for r in rows)
    tot_t = sum(r["ct"] for r in rows)
    unseen_llr = round(math.log((tot_r + B) / (tot_t + B)), 12)

    # a doc whose single token (no bigram) is new vocabulary — unless
    # it collides with a seen bucket, its weight is exactly the
    # zero-count llr
    probe = spark.createDataFrame(
        [(9, "zzzzunseenzzzz")], "doc_id long, text string"
    )
    got = dsir_score_from_counts(probe, counts, n_buckets=B).collect()[0]
    assert got["n_feats"] == 1
    seen_buckets = {r["__b"] for r in rows}
    from scotustician_spark.operators.corpus import _dsir_feats_py
    import hashlib

    b9 = int(
        hashlib.md5(_dsir_feats_py("zzzzunseenzzzz")[0].encode()).hexdigest()[:8],
        16,
    ) % B
    if b9 not in seen_buckets:
        assert got["log_weight"] == round(unseen_llr, 6)

    # counts carrying bucket ids >= served n_buckets: loud rejection
    big = spark.createDataFrame(
        [(200, 5, 1)], "__b long, cr long, ct long"
    )
    with pytest.raises(ValueError, match="different n_buckets"):
        dsir_score_from_counts(probe, big, n_buckets=B).collect()


def test_dsir_arms_bit_equal_hypothesis(spark):
    """Property: the Arrow kernel and expression arms of DSIR are
    bit-identical on arbitrary text — whitespace variety (tabs,
    newlines, NBSP — ASCII \\s semantics), mixed case, punctuation,
    repeated tokens, empty and null docs."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from scotustician_spark.operators.corpus import dsir_log_weights

    token = st.text(
        # 'İ'/'I' are the locale-divergent pair: under a tr/az JVM
        # default locale Spark's lower() maps them to dotless 'ı'
        # while Python str.lower() does not — included so a
        # locale-sensitive environment fails THIS test loudly instead
        # of silently corrupting weights (round-8 review)
        alphabet="abZ9._éİI",
        min_size=1,
        max_size=5,
    )
    doc = st.one_of(
        st.none(),
        st.just(""),
        st.lists(token, min_size=0, max_size=6).map(" ".join),
        st.lists(token, min_size=2, max_size=4).map("\t".join),
        st.lists(token, min_size=2, max_size=3).map(" ".join),
    )

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(st.lists(doc, min_size=1, max_size=8))
    def prop(texts):
        rows = [(i, t, i % 2 == 0) for i, t in enumerate(texts)]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, is_t boolean"
        )
        a = sorted(
            dsir_log_weights(df, F.col("is_t"), n_buckets=32).collect()
        )
        e = sorted(
            dsir_log_weights(
                df, F.col("is_t"), n_buckets=32, kernel="expr"
            ).collect()
        )
        assert a == e

    prop()
