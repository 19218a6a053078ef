"""transformWithStateInPandas operator: state accumulates across real
micro-batches on the RocksDB state store provider.

The API's driver worker imports google.protobuf (the state-server
wire protocol); environments without the protobuf wheel skip — the
applyInPandasWithState twin in test_skew_stateful.py still runs
everywhere."""

from __future__ import annotations

import json

import pytest

pytest.importorskip(
    "google.protobuf.descriptor",
    reason="transformWithStateInPandas needs the `protobuf` wheel "
    "(pyspark 4.x's pyspark/sql/streaming/proto uses protobuf>=4.25 "
    "runtime messages for the state-server wire protocol). Round-8 "
    "un-gate attempt, exact blocker: `pip download protobuf` fails at "
    "DNS resolution ([Errno -2] Name or service not known — the "
    "sandbox has no network egress at all), and a filesystem sweep "
    "finds no protobuf wheel/sdist/package anywhere on disk (only "
    "typeshed stubs and JVM-shaded jars, neither importable). A "
    "hand-written google.protobuf shim would have to fake the whole "
    "descriptor/message runtime pyspark's generated pb2 modules use — "
    "a fake worse than the skip. `pip install 'protobuf>=4.25,<6'` "
    "un-gates this file unchanged. Round-9 re-verification "
    "(2026-08-16): unchanged — DNS still fails ([Errno -2]), pip's "
    "index unreachable, and the filesystem sweep still finds no "
    "protobuf or Pillow wheel anywhere on disk.",
)

from scotustician_spark.streaming.stateful_v2 import (
    ROCKSDB_PROVIDER,
    running_user_totals_tws,
)


@pytest.fixture()
def rocksdb_session(spark):
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    yield spark
    if prev is None:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    else:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_tws_running_totals_accumulates(rocksdb_session, tmp_path):
    spark = rocksdb_session
    src = tmp_path / "stream"
    src.mkdir()
    batch1 = [
        {"ts": "2024-01-01T00:00:00", "user_id": 1, "value": 1.0},
        {"ts": "2024-01-01T00:01:00", "user_id": 1, "value": 2.0},
        {"ts": "2024-01-01T00:02:00", "user_id": 2, "value": 5.0},
    ]
    batch2 = [{"ts": "2024-01-01T01:00:00", "user_id": 1, "value": 10.0}]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in batch1))
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in batch2))

    stream = (
        spark.readStream.schema("ts timestamp, user_id long, value double")
        .option("maxFilesPerTrigger", 1)  # force two micro-batches
        .json(str(src))
    )
    q = (
        running_user_totals_tws(stream)
        .writeStream.format("memory")
        .queryName("tws_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM tws_out").collect()
    last = {}
    for r in rows:
        if r["user_id"] not in last or r["n_events"] > last[r["user_id"]]["n_events"]:
            last[r["user_id"]] = r
    assert last[1]["n_events"] == 3 and abs(last[1]["sum_value"] - 13.0) < 1e-9
    assert last[2]["n_events"] == 1 and abs(last[2]["sum_value"] - 5.0) < 1e-9
    # the ValueState slot carried across micro-batches: user 1 emitted
    # an updated row in each of the two batches
    assert sum(1 for r in rows if r["user_id"] == 1) == 2
