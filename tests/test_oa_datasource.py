"""Python DataSource (PySpark 4 API): batch read with term-partition
pruning via filter pushdown, quarantine-not-fail on bad files, and
streaming new-file discovery with checkpointed offsets."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from scotustician_spark.sources.oa_datasource import OaDocsDataSource


def _write_corpus(root: str, terms: dict[str, dict[str, dict]]) -> None:
    for term, docs in terms.items():
        d = os.path.join(root, f"term={term}")
        os.makedirs(d, exist_ok=True)
        for key, doc in docs.items():
            with open(os.path.join(d, f"{key}.json"), "w") as fh:
                json.dump(doc, fh)


def _registered(spark):
    # runtime set as well, so the test is independent of session tuning
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(OaDocsDataSource)
    return spark


def test_batch_read_all_terms(spark, tmp_path):
    root = str(tmp_path / "corpus")
    _write_corpus(
        root,
        {
            "2023": {"a": {"id": 1}, "b": {"id": 2}},
            "2024": {"c": {"id": 3}},
        },
    )
    df = _registered(spark).read.format("oa_docs").option("path", root).load()
    rows = df.collect()
    assert len(rows) == 3
    assert {r["term"] for r in rows} == {"2023", "2024"}
    payload = json.loads([r for r in rows if r["source_key"] == "a.json"][0]["payload"])
    assert payload == {"id": 1}
    assert all(r["error"] is None for r in rows)


def test_term_filter_prunes_partitions(spark, tmp_path):
    root = str(tmp_path / "corpus")
    _write_corpus(root, {"2023": {"a": {"id": 1}}, "2024": {"b": {"id": 2}}})
    df = (
        _registered(spark)
        .read.format("oa_docs")
        .option("path", root)
        .load()
        .filter(F.col("term") == "2024")
    )
    # pushFilters accepted the term filter -> only term=2024 is listed;
    # 1 partition means 1 task
    assert df.rdd.getNumPartitions() == 1
    assert [r["source_key"] for r in df.collect()] == ["b.json"]


def test_in_filter_pushdown_and_intersection(spark, tmp_path):
    """Round-6 review: (a) pushed isin() filters crashed — pyspark's
    In dataclass carries its tuple in `.value`, not `.values`; (b)
    accepted filters are conjunctive and Spark does NOT re-apply
    them, so two term predicates must INTERSECT, never last-wins."""
    root = str(tmp_path / "corpus")
    _write_corpus(
        root,
        {
            "2023": {"a": {"id": 1}},
            "2024": {"b": {"id": 2}},
            "2025": {"c": {"id": 3}},
        },
    )
    base = _registered(spark).read.format("oa_docs").option("path", root).load()
    got = base.filter(F.col("term").isin("2023", "2025")).collect()
    assert sorted(r["term"] for r in got) == ["2023", "2025"]
    # conjunction with empty intersection must return NOTHING
    empty = base.filter(F.col("term").isin("2023")).filter(
        F.col("term").isin("2024", "2025")
    )
    assert empty.collect() == []
    # overlapping conjunction keeps only the common term
    both = base.filter(F.col("term").isin("2023", "2024")).filter(
        F.col("term").isin("2024", "2025")
    )
    assert [r["term"] for r in both.collect()] == ["2024"]


def test_max_retries_zero_still_reads(spark, tmp_path):
    """Round-6 review: max_retries=0 ('no retries') skipped the
    attempt loop entirely, yielding payload=None error=None for every
    row — silent data loss indistinguishable from success. At least
    one attempt always runs."""
    root = str(tmp_path / "corpus")
    _write_corpus(root, {"2023": {"a": {"id": 1}}})
    rows = (
        _registered(spark)
        .read.format("oa_docs")
        .option("path", root)
        .option("max_retries", "0")
        .load()
        .collect()
    )
    assert len(rows) == 1
    assert rows[0]["payload"] is not None and rows[0]["error"] is None


def test_unreadable_file_quarantines(spark, tmp_path):
    root = str(tmp_path / "corpus")
    _write_corpus(root, {"2023": {"ok": {"id": 1}}})
    # a directory named *.json is unreadable as a file -> error row
    os.makedirs(os.path.join(root, "term=2023", "bad.json"))
    rows = {
        r["source_key"]: r
        for r in _registered(spark)
        .read.format("oa_docs")
        .option("path", root)
        .option("max_retries", "2")
        .load()
        .collect()
    }
    assert rows["ok.json"]["error"] is None
    assert rows["bad.json"]["payload"] is None
    assert "Error" in rows["bad.json"]["error"]


def test_stage_rows_separator_collision(tmp_path):
    """Round-6 review: f'{term}__{name}' staged names collide for
    distinct (term, key) pairs when the term contains '__' — one
    payload clobbered the other and the second publish os.replace
    crashed mid-commit. Hashed staged names keep the pairs apart."""
    from scotustician_spark.sources.oa_datasource import _stage_rows

    rows = [
        {"term": "a__b", "source_key": "c", "payload": "P1"},
        {"term": "a", "source_key": "b__c", "payload": "P2"},
    ]
    msg = _stage_rows(str(tmp_path), iter(rows))
    assert len(msg.entries) == 2
    assert len({p for _, _, p in msg.entries}) == 2  # distinct files
    contents = {
        (t, n): open(p, encoding="utf-8").read() for t, n, p in msg.entries
    }
    assert contents[("a__b", "c.json")] == "P1"
    assert contents[("a", "b__c.json")] == "P2"


def test_stream_discovers_only_new_files(spark, tmp_path):
    root = str(tmp_path / "corpus")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_corpus(root, {"2023": {"a": {"id": 1}}})
    _registered(spark)

    def run_batch():
        q = (
            spark.readStream.format("oa_docs")
            .option("path", root)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch()
    first = spark.read.parquet(out).collect()
    assert [r["source_key"] for r in first] == ["a.json"]

    # second file arrives; a new run picks up ONLY the new key
    _write_corpus(root, {"2023": {"z": {"id": 9}}})
    run_batch()
    rows = spark.read.parquet(out).collect()
    assert sorted(r["source_key"] for r in rows) == ["a.json", "z.json"]
    # no duplicates: 'a.json' was not re-fetched (offset watermark held)
    assert len(rows) == 2


def test_writer_roundtrip_and_manifest(spark, tmp_path):
    root = str(tmp_path / "sink")
    os.makedirs(root)
    df = spark.createDataFrame(
        [
            ("2023", "a", '{"id": 1}'),
            ("2023", "b.json", '{"id": 2}'),
            ("2024", "c", '{"id": 3}'),
        ],
        "term string, source_key string, payload string",
    ).repartition(2)
    _registered(spark)
    df.write.format("oa_docs").option("path", root).mode("append").save()

    back = {
        (r["term"], r["source_key"]): r["payload"]
        for r in spark.read.format("oa_docs").option("path", root).load().collect()
    }
    assert back[("2023", "a.json")] == '{"id": 1}'
    assert back[("2024", "c.json")] == '{"id": 3}'
    assert len(back) == 3
    with open(os.path.join(root, "_ingest_manifest.json")) as fh:
        manifest = json.load(fh)
    assert manifest == {"terms": {"2023": 2, "2024": 1}, "total": 3}
    # staging fully cleaned up on commit
    assert os.listdir(os.path.join(root, "_staging")) == []


def test_writer_overwrite_replaces_terms(spark, tmp_path):
    root = str(tmp_path / "sink")
    os.makedirs(root)
    _registered(spark)
    one = spark.createDataFrame(
        [("2023", "old", "x")], "term string, source_key string, payload string"
    )
    one.write.format("oa_docs").option("path", root).mode("append").save()
    two = spark.createDataFrame(
        [("2024", "new", "y")], "term string, source_key string, payload string"
    )
    two.write.format("oa_docs").option("path", root).mode("overwrite").save()
    rows = spark.read.format("oa_docs").option("path", root).load().collect()
    assert [(r["term"], r["source_key"]) for r in rows] == [("2024", "new.json")]


def test_writer_failed_job_publishes_nothing(spark, tmp_path):
    """Two-phase commit: a task failure mid-job must leave the target
    layout untouched — no term dirs, no manifest (staged leftovers of
    the failed attempt are invisible to the reader)."""
    import pytest
    from pyspark.sql import functions as SF

    root = str(tmp_path / "sink")
    os.makedirs(root)
    _registered(spark)

    @SF.udf("string")
    def boom(key):
        if key == "bad":
            raise ValueError("synthetic failure")
        return "{}"

    df = (
        spark.createDataFrame(
            [("2023", "good"), ("2023", "bad")], "term string, source_key string"
        )
        .repartition(2, "source_key")
        .withColumn("payload", boom("source_key"))
    )
    with pytest.raises(Exception):
        df.write.format("oa_docs").option("path", root).mode("append").save()
    assert not [d for d in os.listdir(root) if d.startswith("term=")]
    assert not os.path.exists(os.path.join(root, "_ingest_manifest.json"))


def test_arrow_read_mode_identical_rows(spark, tmp_path):
    """arrow=true yields RecordBatches over the Python->JVM boundary;
    rows, pruning and quarantine semantics must match the tuple path."""
    root = str(tmp_path / "corpus")
    _write_corpus(
        root,
        {"2023": {"a": {"id": 1}, "b": {"id": 2}}, "2024": {"c": {"id": 3}}},
    )
    _registered(spark)

    def load(**opts):
        r = spark.read.format("oa_docs").option("path", root)
        for k, v in opts.items():
            r = r.option(k, v)
        return sorted(
            (x["term"], x["source_key"], x["payload"], x["error"])
            for x in r.load().collect()
        )

    plain = load()
    arrow = load(arrow="true", arrow_batch_size="2")
    assert arrow == plain and len(arrow) == 3


def test_stream_writer_incremental_and_idempotent(spark, tmp_path):
    """writeStream.format('oa_docs'): per-batch atomic publish with a
    manifest marker; a second run publishes only new rows, a replay run
    with no new data publishes nothing."""
    src = tmp_path / "src"
    src.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(sink)
    _registered(spark)

    def run():
        q = (
            spark.readStream.schema("term string, source_key string, payload string")
            .json(str(src))
            .writeStream.format("oa_docs")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    (src / "b1.json").write_text(
        json.dumps({"term": "2023", "source_key": "a", "payload": "{}"})
    )
    run()
    def published():
        return sorted(
            (r["term"], r["source_key"])
            for r in spark.read.format("oa_docs").option("path", sink).load().collect()
        )
    assert published() == [("2023", "a.json")]

    (src / "b2.json").write_text(
        json.dumps({"term": "2024", "source_key": "b", "payload": "{}"})
    )
    run()
    assert published() == [("2023", "a.json"), ("2024", "b.json")]

    run()  # no new data: replay publishes nothing new
    assert published() == [("2023", "a.json"), ("2024", "b.json")]
    manifests = sorted(os.listdir(os.path.join(sink, "_batch_manifests")))
    assert len(manifests) >= 2


def test_writer_duplicate_keys_single_publish(spark, tmp_path):
    """Duplicate (term, source_key) rows must not crash commit: they
    collapse to one published file (last wins) and count once."""
    root = str(tmp_path / "sink")
    os.makedirs(root)
    _registered(spark)
    df = spark.createDataFrame(
        [("2023", "a", "v1"), ("2023", "a", "v2")],
        "term string, source_key string, payload string",
    ).coalesce(1)
    df.write.format("oa_docs").option("path", root).mode("append").save()
    rows = spark.read.format("oa_docs").option("path", root).load().collect()
    assert len(rows) == 1 and rows[0]["source_key"] == "a.json"
    with open(os.path.join(root, "_ingest_manifest.json")) as fh:
        assert json.load(fh)["total"] == 1
