"""Incremental/streaming semantics: anti-join filter, AvailableNow
file-source pipeline with idempotent keyed sink, and the window
transforms driven through an actual writeStream."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from scotustician_spark.documents.flatten import flatten_utterances
from scotustician_spark.documents.schema import OA_DOCUMENT
from scotustician_spark.streaming import (
    incremental_filter,
    run_available_now,
    sessionize,
    stream_json_corpus,
    tumbling_agg,
)
from tests.fixtures_oa import make_corpus


def _write_jsonl(docs, path):
    path.mkdir(parents=True, exist_ok=True)
    for d in docs:
        (path / f"{d['id']}.json").write_text(json.dumps(d))


def test_incremental_filter(spark):
    new = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    done = spark.createDataFrame([(2,), (99,)], "k int")
    assert sorted(
        r["k"] for r in incremental_filter(new, done, ["k"]).collect()
    ) == [1, 3]


def test_available_now_pipeline_is_incremental_and_idempotent(spark, tmp_path):
    docs = make_corpus(n_docs=4, seed=3)
    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    _write_jsonl(docs[:2], src)

    def transform(batch):
        return flatten_utterances(batch.filter(F.size("transcript.sections") > 0))

    keys = ["case_id", "utterance_index"]
    stream = stream_json_corpus(spark, str(src), OA_DOCUMENT)
    run_available_now(stream, transform, str(out), str(ckpt), keys)
    n1 = spark.read.parquet(str(out)).count()
    assert n1 > 0

    # second trigger with no new files: checkpoint file-index skips all
    stream = stream_json_corpus(spark, str(src), OA_DOCUMENT)
    run_available_now(stream, transform, str(out), str(ckpt), keys)
    assert spark.read.parquet(str(out)).count() == n1

    # two more files: only their utterances are appended
    _write_jsonl(docs[2:], src)
    stream = stream_json_corpus(spark, str(src), OA_DOCUMENT)
    run_available_now(stream, transform, str(out), str(ckpt), keys)
    final = spark.read.parquet(str(out))
    assert final.count() > n1
    assert final.groupBy(*keys).count().filter("count > 1").count() == 0


def test_windows_run_in_streaming_mode(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    rows = [
        {"ts": "2024-01-01T00:00:00", "user_id": 1, "event_type": "a", "value": 1.0},
        {"ts": "2024-01-01T00:10:00", "user_id": 1, "event_type": "a", "value": 2.0},
        {"ts": "2024-01-01T01:10:00", "user_id": 1, "event_type": "b", "value": 3.0},
    ]
    (src / "e.json").write_text("\n".join(json.dumps(r) for r in rows))
    schema = "ts timestamp, user_id long, event_type string, value double"

    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        tumbling_agg(stream, "1 hour", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("tumbling_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"].isoformat(), r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    assert got == {("2024-01-01T00:00:00", "a"): 2, ("2024-01-01T01:00:00", "b"): 1}

    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        sessionize(stream, "30 minutes", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sess = spark.sql("SELECT * FROM sessions_out").collect()
    assert len(sess) == 2  # 00:00+00:10 merge; 01:10 is its own session
    assert {r["n_events"] for r in sess} == {2, 1}


def test_dynamic_gap_sessions_streaming_mode(spark, tmp_path):
    """session_window with a gap EXPRESSION must merge identically in
    streaming: a 'purchase' (45-min gap) holds the session open across
    a 40-min silence that would break a 15-min-gap session."""
    import json as _json

    from pyspark.sql import functions as F

    from scotustician_spark.streaming.windows import sessionize_dynamic_gap

    src = tmp_path / "dyn_events"
    src.mkdir()
    rows = [
        {"ts": "2024-01-01T00:00:00", "user_id": 1, "event_type": "purchase", "value": 1.0},
        {"ts": "2024-01-01T00:40:00", "user_id": 1, "event_type": "view", "value": 2.0},
        {"ts": "2024-01-01T02:00:00", "user_id": 1, "event_type": "view", "value": 3.0},
    ]
    (src / "e.json").write_text("\n".join(_json.dumps(r) for r in rows))
    schema = "ts timestamp, user_id long, event_type string, value double"
    stream = spark.readStream.schema(schema).json(str(src))
    gap = F.when(F.col("event_type") == "purchase", "45 minutes").otherwise(
        "15 minutes"
    )
    q = (
        sessionize_dynamic_gap(stream, gap, watermark="4 hours")
        .writeStream.format("memory")
        .queryName("dyn_sessions_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sess = sorted(
        spark.sql("SELECT * FROM dyn_sessions_out").collect(),
        key=lambda r: r["session_start"],
    )
    # purchase@00:00 extends to 00:45 → view@00:40 merges (15-min gap
    # alone would have closed at 00:15); view@02:00 is separate
    assert len(sess) == 2
    assert sess[0]["n_events"] == 2 and sess[1]["n_events"] == 1


def test_dedup_stream_bounded_state_across_runs(spark, tmp_path):
    from scotustician_spark.streaming import dedup_stream

    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    src.mkdir()
    schema = "ts timestamp, doc_key string, payload string"

    def run():
        stream = spark.readStream.schema(schema).json(str(src))
        (
            dedup_stream(stream, ["doc_key"], watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    (src / "b1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"ts": "2024-01-01T00:00:00", "doc_key": "a", "payload": "first"},
                {"ts": "2024-01-01T00:01:00", "doc_key": "b", "payload": "first"},
                {"ts": "2024-01-01T00:01:30", "doc_key": "a", "payload": "same-batch-dup"},
            ]
        )
    )
    run()
    got = {r["doc_key"]: r["payload"] for r in spark.read.parquet(str(out)).collect()}
    assert got == {"a": "first", "b": "first"}

    # second run, same checkpoint: the redelivered "a" (within the
    # watermark horizon) is dropped by state persisted across restarts;
    # "c" is new and passes
    (src / "b2.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"ts": "2024-01-01T00:02:00", "doc_key": "a", "payload": "cross-run-dup"},
                {"ts": "2024-01-01T00:03:00", "doc_key": "c", "payload": "first"},
            ]
        )
    )
    run()
    rows = spark.read.parquet(str(out)).collect()
    assert len(rows) == 3
    got = {r["doc_key"]: r["payload"] for r in rows}
    assert got == {"a": "first", "b": "first", "c": "first"}


def test_stream_interval_join(spark, tmp_path):
    from scotustician_spark.streaming.joins import stream_interval_join

    lsrc, rsrc = tmp_path / "l", tmp_path / "r"
    lsrc.mkdir(); rsrc.mkdir()
    lrows = [
        {"ts": "2024-01-01T00:00:00", "k": 1, "lid": 10},
        {"ts": "2024-01-01T01:00:00", "k": 1, "lid": 11},
        {"ts": "2024-01-01T00:00:00", "k": 2, "lid": 12},
    ]
    rrows = [
        {"rts": "2024-01-01T00:05:00", "k": 1, "rid": 20},  # joins lid 10
        {"rts": "2024-01-01T00:20:00", "k": 1, "rid": 21},  # outside upper
        {"rts": "2024-01-01T01:05:00", "k": 1, "rid": 22},  # joins lid 11
        {"rts": "2024-01-01T00:05:00", "k": 3, "rid": 23},  # key mismatch
    ]
    (lsrc / "l.json").write_text("\n".join(json.dumps(r) for r in lrows))
    (rsrc / "r.json").write_text("\n".join(json.dumps(r) for r in rrows))
    l = spark.readStream.schema("ts timestamp, k long, lid long").json(str(lsrc))
    r = spark.readStream.schema("rts timestamp, k long, rid long").json(str(rsrc))
    q = (
        stream_interval_join(l, r, on="k", upper="10 minutes")
        .select("lid", "rid")
        .writeStream.format("memory")
        .queryName("sj_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(row["lid"], row["rid"]) for row in spark.sql("SELECT * FROM sj_out").collect()}
    assert got == {(10, 20), (11, 22)}


def test_stream_static_enrich_broadcasts(spark, tmp_path):
    from scotustician_spark.streaming.joins import stream_static_enrich

    src = tmp_path / "s"
    src.mkdir()
    (src / "s.json").write_text(json.dumps({"k": 1, "v": 5}))
    dim = spark.createDataFrame([(1, "gold")], "k long, tier string")
    stream = spark.readStream.schema("k long, v long").json(str(src))
    q = (
        stream_static_enrich(stream, dim, "k")
        .writeStream.format("memory")
        .queryName("enrich_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM enrich_out").collect()
    assert [(r["k"], r["v"], r["tier"]) for r in rows] == [(1, 5, "gold")]


def test_run_quantile_state_update_two_batches(spark, tmp_path):
    """Streaming quantile-state maintenance: state after two
    AvailableNow runs must equal a single-pass partial over all data,
    and replay with nothing new is a no-op."""
    from scotustician_spark.operators.quantiles import (
        quantile_finalize,
        quantile_partial,
    )
    from scotustician_spark.streaming.incremental import run_quantile_state_update

    src = tmp_path / "q_src"
    src.mkdir()
    state = str(tmp_path / "q_state")
    ckpt = str(tmp_path / "q_ckpt")
    schema = "k STRING, v DOUBLE"

    def feed(rows):
        import uuid

        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").json(
            str(src / uuid.uuid4().hex)
        )

    def stream():
        return spark.readStream.schema(schema).json(str(src) + "/*")

    def run():
        run_quantile_state_update(
            stream(), state, ckpt, ["k"], "v", lo=0.0, hi=100.0, n_bins=10
        )

    batch1 = [("g", float(v)) for v in range(50)]
    batch2 = [("g", float(v)) for v in range(50, 100)]
    feed(batch1)
    run()
    feed(batch2)
    run()
    all_rows = spark.createDataFrame(batch1 + batch2, schema)
    expected = quantile_partial(all_rows, ["k"], "v", 0.0, 100.0, 10).collect()
    got = spark.read.parquet(state).collect()
    assert got == expected
    out = quantile_finalize(
        spark.read.parquet(state), ["k"], {"p50": 0.5}, 0.0, 100.0, 10
    ).collect()[0]
    assert (out["n"], out["p50"]) == (100, 40.0)

    run()  # replay: checkpoint has seen every file
    assert spark.read.parquet(state).collect() == expected


def test_run_cdc_apply_two_batches(spark, tmp_path):
    from scotustician_spark.streaming.incremental import run_cdc_apply

    src = tmp_path / "cdc_src"
    src.mkdir()
    table = str(tmp_path / "cdc_table")
    ckpt = str(tmp_path / "cdc_ckpt")
    schema = "k INT, name STRING, v INT, op STRING, seq LONG"

    def feed(rows):
        import uuid

        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").json(
            str(src / uuid.uuid4().hex)
        )

    def stream():
        return spark.readStream.schema(schema).json(str(src) + "/*")

    # batch 1: two inserts
    feed([(1, "a", 10, "I", 1), (2, "b", 20, "I", 2)])
    run_cdc_apply(stream(), table, ckpt, ["k"], seq_col="seq")
    assert {r["k"]: r["v"] for r in spark.read.parquet(table).collect()} == {1: 10, 2: 20}

    # batch 2: update k=1, delete k=2, insert k=3
    feed([(1, "a2", 11, "U", 3), (2, None, None, "D", 4), (3, "c", 30, "I", 5)])
    run_cdc_apply(stream(), table, ckpt, ["k"], seq_col="seq")
    rows = {r["k"]: (r["name"], r["v"]) for r in spark.read.parquet(table).collect()}
    assert rows == {1: ("a2", 11), 3: ("c", 30)}

    # re-running with nothing new is a no-op (checkpoint dedupes files)
    run_cdc_apply(stream(), table, ckpt, ["k"], seq_col="seq")
    rows2 = {r["k"]: (r["name"], r["v"]) for r in spark.read.parquet(table).collect()}
    assert rows2 == rows

    # batch 3: an at-least-once source REDELIVERS stale changes in a
    # later batch — the seq=1 insert for k=1 (now at seq=3) and the
    # seq=2 insert for the DELETED k=2 (tombstone at seq=4). Both must
    # be row-level no-ops (round-7 review: the old in-place merge
    # dropped seq from the table and regressed k=1 to the stale row,
    # and resurrected the deleted k=2)
    feed([(1, "a", 10, "I", 1), (2, "b", 20, "I", 2)])
    run_cdc_apply(stream(), table, ckpt, ["k"], seq_col="seq")
    rows3 = {r["k"]: (r["name"], r["v"]) for r in spark.read.parquet(table).collect()}
    assert rows3 == rows  # still {1: ('a2', 11), 3: ('c', 30)}


def test_stream_interval_join_left_outer_emits_on_watermark(spark, tmp_path):
    """leftOuter stream-stream join: an unmatched left row emits with
    NULL right columns only once a later batch advances the watermark
    past its match window (its state-eviction moment)."""
    from scotustician_spark.streaming.joins import stream_interval_join

    lsrc, rsrc = tmp_path / "l", tmp_path / "r"
    lsrc.mkdir(); rsrc.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    (lsrc / "l1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"ts": "2024-01-01T00:00:00", "k": 1, "lid": 10},
                {"ts": "2024-01-01T00:00:00", "k": 2, "lid": 12},  # never matches
            ]
        )
    )
    (rsrc / "r1.json").write_text(
        json.dumps({"rts": "2024-01-01T00:05:00", "k": 1, "rid": 20})
    )

    def run():
        l = spark.readStream.schema("ts timestamp, k long, lid long").json(str(lsrc))
        r = spark.readStream.schema("rts timestamp, k long, rid long").json(str(rsrc))
        q = (
            stream_interval_join(l, r, on="k", upper="10 minutes", how="leftOuter")
            .select("lid", "rid")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    first = {(r["lid"], r["rid"]) for r in spark.read.parquet(out).collect()}
    assert first == {(10, 20)}  # lid 12 still buffered, not yet provably unmatched

    # far-future rows on BOTH sides drag the GLOBAL watermark (min of
    # the two stream watermarks) past lid 12's window; the NULL row
    # lands in the batch AFTER the advance, so a third run (another new
    # file → another batch) flushes it
    (rsrc / "r2.json").write_text(
        json.dumps({"rts": "2024-01-01T03:00:00", "k": 9, "rid": 99})
    )
    (lsrc / "l2.json").write_text(
        json.dumps({"ts": "2024-01-01T03:00:00", "k": 8, "lid": 13})
    )
    run()
    (rsrc / "r3.json").write_text(
        json.dumps({"rts": "2024-01-01T03:10:00", "k": 9, "rid": 100})
    )
    (lsrc / "l3.json").write_text(
        json.dumps({"ts": "2024-01-01T03:10:00", "k": 8, "lid": 14})
    )
    run()
    rows = {(r["lid"], r["rid"]) for r in spark.read.parquet(out).collect()}
    assert (12, None) in rows
    assert (10, 20) in rows


def test_run_topk_state_update_two_batches(spark, tmp_path):
    """Streaming top-k state across two AvailableNow runs must equal the
    single-pass top-k over all streamed vectors; replay is a no-op."""
    import random as _r

    from scotustician_spark.operators.similarity import (
        rank_topk,
        score_queries,
    )
    from scotustician_spark.streaming.incremental import run_topk_state_update

    rng = _r.Random(9)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(60)]
    queries = spark.createDataFrame(
        vecs[:3], "vec_id long, embedding array<double>"
    )
    src = tmp_path / "vec_src"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, rows):
        (src / name).write_text(
            "\n".join(
                json.dumps({"vec_id": i, "embedding": v}) for i, v in rows
            )
        )

    def run():
        stream = spark.readStream.schema(
            "vec_id long, embedding array<double>"
        ).json(str(src))
        run_topk_state_update(stream, queries, state, ckpt, k=5)

    write_batch("b1.json", vecs[3:30])
    run()
    write_batch("b2.json", vecs[30:])
    run()
    run()  # no new files: replay must not change the state

    got = sorted(
        (r.query_id, r.rnk, r.neighbor_id)
        for r in spark.read.parquet(state).collect()
    )
    full_corpus = spark.createDataFrame(
        vecs[3:], "vec_id long, embedding array<double>"
    )
    want = sorted(
        (r.query_id, r.rnk, r.neighbor_id)
        for r in rank_topk(score_queries(queries, full_corpus), 5).collect()
    )
    assert got == want and len(got) == 15


def test_run_components_state_update_two_batches(spark, tmp_path):
    """Streaming component state across two AvailableNow runs must equal
    a full recompute over all streamed edges; replay is a no-op."""
    from scotustician_spark.operators.components import connected_components
    from scotustician_spark.streaming.incremental import (
        run_components_state_update,
    )

    src = tmp_path / "edge_src"
    src.mkdir()
    state = str(tmp_path / "cc_state")
    ckpt = str(tmp_path / "cc_ckpt")

    def write_batch(name, edges):
        (src / name).write_text(
            "\n".join(json.dumps({"id_a": a, "id_b": b}) for a, b in edges)
        )

    def run():
        stream = spark.readStream.schema("id_a long, id_b long").json(str(src))
        run_components_state_update(stream, state, ckpt)

    b1 = [(1, 2), (3, 4), (10, 11)]
    b2 = [(2, 3), (20, 21)]  # bridges {1,2}+{3,4}; adds new vertices
    write_batch("b1.json", b1)
    run()
    write_batch("b2.json", b2)
    run()
    run()  # no new files: replay must not change the state

    got = {
        r["doc_id"]: r["component_id"]
        for r in spark.read.parquet(state).collect()
    }
    all_edges = spark.createDataFrame(b1 + b2, "id_a long, id_b long")
    verts = spark.createDataFrame(
        [(v,) for v in sorted({x for e in b1 + b2 for x in e})], "doc_id long"
    )
    want = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(all_edges, verts).collect()
    }
    assert got == want
    assert got[4] == 1  # cross-batch bridge collapsed
    assert got[21] == 20  # batch-2-only component present


def test_run_cms_state_update_two_batches(spark, tmp_path):
    """Streaming CMS maintenance: sketch state after two AvailableNow
    runs equals the single-pass sketch over all data (sketch addition
    is exact), and replay with nothing new is a no-op."""
    from scotustician_spark.operators.frequency import cms_cells, cms_estimate
    from scotustician_spark.streaming.incremental import run_cms_state_update

    src = tmp_path / "cms_src"
    src.mkdir()
    state = str(tmp_path / "cms_state")
    ckpt = str(tmp_path / "cms_ckpt")
    schema = "token STRING"

    def feed(rows):
        import uuid

        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").json(
            str(src / uuid.uuid4().hex)
        )

    def stream():
        return spark.readStream.schema(schema).json(str(src) + "/*")

    def run():
        run_cms_state_update(stream(), state, ckpt, "token", width=64)

    batch1 = [(f"t{i % 7}",) for i in range(60)]
    batch2 = [(f"t{i % 11}",) for i in range(40)]
    feed(batch1)
    run()
    feed(batch2)
    run()
    all_rows = spark.createDataFrame(batch1 + batch2, schema)
    expected = sorted(
        map(tuple, cms_cells(all_rows, "token", width=64).collect())
    )
    got = sorted(map(tuple, spark.read.parquet(state).collect()))
    assert got == expected

    # the maintained sketch answers point queries with the one-sided
    # guarantee against TRUE stream-lifetime counts
    probes = spark.createDataFrame([("t0",), ("t5",)], schema)
    est = {
        r["token"]: r["cms_est"]
        for r in cms_estimate(
            spark.read.parquet(state), probes, "token", width=64
        ).collect()
    }
    true = {
        r["token"]: r["n"]
        for r in all_rows.groupBy("token").agg(F.count("*").alias("n")).collect()
    }
    assert est["t0"] >= true["t0"] and est["t5"] >= true["t5"]

    run()  # replay: checkpoint has seen every file
    assert sorted(map(tuple, spark.read.parquet(state).collect())) == expected


def test_exactly_once_merge_sink_replay_noop(spark, tmp_path):
    """foreachBatch is at-least-once: replaying a batch id that was
    already merged must not double-count. The versioned merge keys
    every apply to its batch id and derives state only from the
    latest COMPLETE version, so a replay only republishes."""
    from pyspark.sql import functions as F

    from scotustician_spark.streaming.incremental import (
        exactly_once_merge_sink,
    )

    state = str(tmp_path / "state")

    def merge(base, p):
        return (
            base.unionByName(p)
            .groupBy("k")
            .agg(F.sum("c").cast("long").alias("c"))
        )

    def batch(rows):
        return spark.createDataFrame(rows, "k string, c long")

    exactly_once_merge_sink(spark, state, 0, batch([("a", 2), ("b", 1)]), merge)
    # crash-replay of batch 0 (same data, same id) — must be a no-op
    exactly_once_merge_sink(spark, state, 0, batch([("a", 2), ("b", 1)]), merge)
    exactly_once_merge_sink(spark, state, 1, batch([("a", 3)]), merge)
    # replay of batch 1 too
    exactly_once_merge_sink(spark, state, 1, batch([("a", 3)]), merge)

    got = {r["k"]: r["c"] for r in spark.read.parquet(state).collect()}
    assert got == {"a": 5, "b": 1}


def test_exactly_once_merge_sink_heals_torn_publish(spark, tmp_path):
    """A crash between the version write and the publish leaves the
    published copy missing/torn while the versioned copy is complete;
    the replayed batch must republish from the version without
    re-merging."""
    import shutil

    from pyspark.sql import functions as F

    from scotustician_spark.streaming.incremental import (
        exactly_once_merge_sink,
    )

    state = str(tmp_path / "state")

    def merge(base, p):
        return (
            base.unionByName(p)
            .groupBy("k")
            .agg(F.sum("c").cast("long").alias("c"))
        )

    def batch(rows):
        return spark.createDataFrame(rows, "k string, c long")

    exactly_once_merge_sink(spark, state, 0, batch([("a", 2)]), merge)
    # simulate the crash window: the published copy vanishes, the
    # complete version dir survives
    shutil.rmtree(state)
    exactly_once_merge_sink(spark, state, 0, batch([("a", 2)]), merge)
    got = {r["k"]: r["c"] for r in spark.read.parquet(state).collect()}
    assert got == {"a": 2}  # healed, not doubled
    exactly_once_merge_sink(spark, state, 1, batch([("a", 5)]), merge)
    got = {r["k"]: r["c"] for r in spark.read.parquet(state).collect()}
    assert got == {"a": 7}


def test_run_lsh_index_update_two_batches(spark, tmp_path):
    """Streaming LSH index maintenance: the maintained bucket relation
    after two AvailableNow drains equals the one-shot bucket relation
    of the union, replay with nothing new is a no-op, and the served
    probe over the maintained index equals the inline-bucketing probe."""
    import uuid

    from pyspark.sql import functions as F

    from scotustician_spark.operators.similarity import (
        lsh_bucket_relation,
        lsh_bucket_topk,
    )
    from scotustician_spark.streaming.incremental import run_lsh_index_update

    dim = 8
    src = tmp_path / "lsh_src"
    src.mkdir()
    bucket_path = str(tmp_path / "lsh_buckets")
    ckpt = str(tmp_path / "lsh_ckpt")
    schema = f"vec_id LONG, embedding ARRAY<DOUBLE>"

    def vec(i):
        return [((i * 7 + j * 3) % 17 - 8) / 8.0 for j in range(dim)]

    def feed(ids):
        spark.createDataFrame(
            [(i, vec(i)) for i in ids], schema
        ).coalesce(1).write.mode("append").json(str(src / uuid.uuid4().hex))

    def run():
        stream = spark.readStream.schema(schema).json(str(src) + "/*")
        return run_lsh_index_update(stream, bucket_path, ckpt, dim)

    feed(range(0, 30))
    s1 = run()
    feed(range(30, 50))
    feed(range(25, 35))  # overlap redelivery: 25-29 must be SKIPPED
    s2 = run()
    s3 = run()  # nothing new: no-op, zero batches

    # per-batch insert/skip counts surface the append-only contract:
    # a redelivered id is counted skipped, never silently dropped
    assert [sum(s[k] for s in s1) for k in ("inserted", "skipped")] == [30, 0]
    assert sum(s["inserted"] for s in s2) == 20
    # ids 25-29 redelivered -> skipped (>=5: micro-batch split may
    # also count 30-34 as skips if they arrive in a later batch)
    assert sum(s["skipped"] for s in s2) >= 5
    assert s3 == []

    both = spark.createDataFrame([(i, vec(i)) for i in range(50)], schema)
    want = sorted(
        (r["neighbor_id"], r["bucket"])
        for r in lsh_bucket_relation(both, dim).collect()
    )
    got = sorted(
        (r["neighbor_id"], r["bucket"])
        for r in spark.read.parquet(bucket_path).collect()
    )
    assert got == want

    queries = both.filter(F.col("vec_id") < 3)
    served = lsh_bucket_topk(
        both, queries, dim, k=3, sim_round=6,
        corpus_buckets=spark.read.parquet(bucket_path),
    )
    inline = lsh_bucket_topk(both, queries, dim, k=3, sim_round=6)
    key = lambda d: sorted(map(tuple, d.select("query_id", "neighbor_id", "sim", "rnk").collect()))
    assert key(served) == key(inline)


def test_run_dsir_state_update_two_batches(spark, tmp_path):
    """Streaming DSIR sufficient-statistic maintenance: bucket counts
    after two AvailableNow drains must equal the one-shot counts over
    the union, replay is a no-op, and weights SERVED off the state
    (dsir_score_from_counts) are bit-identical to the batch
    dsir_log_weights over the same corpus."""
    from pyspark.sql import functions as F

    from scotustician_spark.operators.corpus import (
        dsir_bucket_counts,
        dsir_log_weights,
        dsir_score_from_counts,
    )
    from scotustician_spark.streaming.incremental import run_dsir_state_update

    src = tmp_path / "d_src"
    src.mkdir()
    state = str(tmp_path / "d_state")
    ckpt = str(tmp_path / "d_ckpt")
    schema = "doc_id LONG, text STRING, is_target BOOLEAN"

    def feed(rows):
        import uuid

        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).json(str(src / uuid.uuid4().hex))

    def run():
        run_dsir_state_update(
            spark.readStream.schema(schema).json(str(src) + "/*"),
            state,
            ckpt,
            n_buckets=64,
        )

    batch1 = [
        (1, "alpha beta gamma alpha", True),
        (2, "delta epsilon zeta", False),
    ]
    batch2 = [
        (3, "alpha gamma beta beta", True),
        (4, "eta theta iota kappa", False),
        (5, None, False),
    ]
    feed(batch1)
    run()
    feed(batch2)
    run()

    all_rows = spark.createDataFrame(batch1 + batch2, schema)
    expected = sorted(
        dsir_bucket_counts(
            all_rows, F.col("is_target"), n_buckets=64
        ).collect()
    )
    got = sorted(spark.read.parquet(state).collect())
    assert got == expected

    run()  # replay with nothing new: a no-op on the counts
    assert sorted(spark.read.parquet(state).collect()) == expected

    served = dsir_score_from_counts(
        all_rows, spark.read.parquet(state), n_buckets=64
    )
    batch = dsir_log_weights(all_rows, F.col("is_target"), n_buckets=64)
    assert sorted(served.collect()) == sorted(batch.collect())
