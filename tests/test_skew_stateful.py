"""Salted aggregation equivalence + custom stateful streaming op."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from scotustician_spark.operators.skew import salted_agg
from scotustician_spark.streaming.stateful import running_user_totals


def test_salted_agg_equals_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.sum("l_quantity").alias("sum_qty"),
        F.min("l_linenumber").alias("mn"),
        F.max("l_linenumber").alias("mx"),
        F.avg("l_extendedprice").alias("avg_price"),
    )
    salted = salted_agg(
        li,
        ["l_returnflag"],
        [
            ("*", "count", "n_rows"),
            ("l_quantity", "sum", "sum_qty"),
            ("l_linenumber", "min", "mn"),
            ("l_linenumber", "max", "mx"),
            ("l_extendedprice", "avg", "avg_price"),
        ],
        n_salts=8,
    )
    p = {r["l_returnflag"]: r for r in plain.collect()}
    s = {r["l_returnflag"]: r for r in salted.collect()}
    assert set(p) == set(s)
    for k in p:
        assert p[k]["n_rows"] == s[k]["n_rows"]
        assert abs(p[k]["sum_qty"] - s[k]["sum_qty"]) < 1e-6
        assert p[k]["mn"] == s[k]["mn"] and p[k]["mx"] == s[k]["mx"]
        assert abs(p[k]["avg_price"] - s[k]["avg_price"]) < 1e-6


def test_running_user_totals_accumulates_state(spark, tmp_path):
    src = tmp_path / "stream"
    src.mkdir()
    batch1 = [
        {"ts": "2024-01-01T00:00:00", "user_id": 1, "value": 1.0},
        {"ts": "2024-01-01T00:01:00", "user_id": 1, "value": 2.0},
        {"ts": "2024-01-01T00:02:00", "user_id": 2, "value": 5.0},
    ]
    batch2 = [
        {"ts": "2024-01-01T01:00:00", "user_id": 1, "value": 10.0},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in batch1))
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in batch2))
    schema = "ts timestamp, user_id long, value double"

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force two micro-batches
        .json(str(src))
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("totals_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM totals_out").collect()
    # update mode appends one row per key per batch; the row with the
    # highest n_events per key carries the final accumulated state
    # (memory-sink row order is not batch order)
    last = {}
    for r in rows:
        if r["user_id"] not in last or r["n_events"] > last[r["user_id"]]["n_events"]:
            last[r["user_id"]] = r
    u1, u2 = last[1], last[2]
    assert u1["n_events"] == 3 and abs(u1["sum_value"] - 13.0) < 1e-9
    assert u2["n_events"] == 1 and abs(u2["sum_value"] - 5.0) < 1e-9
    # state survived across micro-batches: user 1 appears twice
    assert sum(1 for r in rows if r["user_id"] == 1) == 2


def test_salted_join_equals_plain_join(spark, sf_dir):
    from scotustician_spark.operators.skew import salted_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_linenumber"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    plain = li.join(o, "l_orderkey", "inner")
    hot = [r["l_orderkey"] for r in li.groupBy("l_orderkey").count()
           .orderBy(F.desc("count")).limit(3).collect()]
    salted = salted_join(li, o, "l_orderkey", hot_keys=hot, n_salts=8)
    assert salted.count() == plain.count()
    key = lambda r: (r["l_orderkey"], r["l_linenumber"], r["o_orderstatus"])
    assert sorted(map(key, salted.collect())) == sorted(map(key, plain.collect()))


def test_streaming_heavy_hitters_bounded_state(spark, tmp_path):
    """MG summaries as keyed stream state: an item frequent across TWO
    micro-batches must appear in the final snapshot with a lower-bound
    count <= true count, state bounded at n_shards x k."""
    from scotustician_spark.streaming.frequency import streaming_heavy_hitters

    src = tmp_path / "hh_stream"
    src.mkdir()
    batch1 = [{"item": "hot"}] * 20 + [{"item": f"rare{i}"} for i in range(30)]
    batch2 = [{"item": "hot"}] * 15 + [{"item": f"late{i}"} for i in range(30)]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in batch1))
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in batch2))

    stream = (
        spark.readStream.schema("item string")
        .option("maxFilesPerTrigger", 1)  # force two micro-batches
        .json(str(src))
    )
    q = (
        streaming_heavy_hitters(stream, "item", k=8, n_shards=2)
        .writeStream.format("memory")
        .queryName("hh_snap")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from hh_snap").collect()
    # last update-batch snapshot for "hot"'s shard must carry hot with a
    # lower-bound count reflecting BOTH batches (state survived)
    hot = [r for r in rows if r["item"] == "hot"]
    assert hot, rows
    assert max(r["mg_count"] for r in hot) <= 35
    assert max(r["mg_count"] for r in hot) > 15  # cross-batch accumulation
    # bounded state: each per-batch shard snapshot holds <= k items, so
    # across the 2 micro-batches the memory sink sees <= 2k distinct
    # items per shard
    seen = {}
    for r in rows:
        seen.setdefault(r["shard"], set()).add(r["item"])
    assert all(len(v) <= 2 * 8 for v in seen.values()), {
        s: len(v) for s, v in seen.items()
    }


def test_streaming_rate_anomaly_matches_batch_on_closed_hours(spark, tmp_path):
    """The stateful streaming detector's closed-hour verdicts must equal
    the batch event_rate_anomaly rows (the last, still-open hour is the
    only legitimate difference), across TWO AvailableNow runs so state
    survives a restart."""
    import datetime as dt
    import json

    from scotustician_spark.plans import QUERY_REGISTRY
    from scotustician_spark.streaming.stateful import streaming_rate_anomaly

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(31):
        n = 45 if h == 28 else (2 if h % 2 == 0 else 4)
        for _ in range(n):
            eid += 1
            rows.append(
                {
                    "ts": (base + dt.timedelta(hours=h, minutes=eid % 55)).isoformat(),
                    "event_type": "view",
                    "event_id": eid,
                }
            )
    src = tmp_path / "anomaly_src"
    src.mkdir()
    ckpt = str(tmp_path / "anomaly_ckpt")
    out_dir = str(tmp_path / "anomaly_out")
    split = len(rows) // 2
    schema = "ts timestamp, event_type string, event_id long"

    def run():
        stream = spark.readStream.schema(schema).json(str(src))
        (
            streaming_rate_anomaly(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows[:split]))
    run()
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in rows[split:]))
    run()

    got = {
        r["hour_epoch"]: r for r in spark.read.parquet(out_dir).collect()
    }
    # batch oracle over the same events written as an events table
    ev = spark.createDataFrame(
        [
            (r["event_id"], dt.datetime.fromisoformat(r["ts"]), 1, "view", 0.0, "{}")
            for r in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    batch = {
        int(
            dt.datetime.strptime(r["hour_s"], "%Y-%m-%d %H:%M:%S").timestamp()
            // 3600
        ): r
        for r in QUERY_REGISTRY["event_rate_anomaly"].fn(spark, str(tmp_path)).collect()
    }
    # streaming closes every hour except the final one
    assert set(got) == set(batch) - {max(batch)}
    for h, s in got.items():
        b = batch[h]
        assert s["cnt"] == b["cnt"]
        assert abs(s["mu"] - b["mu"]) < 1e-6
        assert abs(s["sigma"] - b["sigma"]) < 1e-6
        assert s["is_anomaly"] == b["is_anomaly"]
    # the spike hour was flagged
    spike_h = int((base + dt.timedelta(hours=28)).timestamp() // 3600)
    assert got[spike_h]["is_anomaly"]


def test_auto_agg_strategy_and_equality(spark):
    """auto_agg: plain and salted branches return identical results;
    the measured-skew gate picks salting only past the threshold, and
    the salted plan really fans the key out (two aggregation phases)."""
    from pyspark.sql import functions as F

    from scotustician_spark.operators.skew import (
        auto_agg,
        choose_agg_strategy,
    )

    assert choose_agg_strategy(None) == "plain"
    assert choose_agg_strategy(3.0) == "plain"
    assert choose_agg_strategy(50.0) == "salted"

    rows = [("hot", float(i % 7), i) for i in range(3000)] + [
        (f"k{i % 5}", float(i), i) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "k string, v double, c long")
    aggs = [("v", "sum", "sv"), ("c", "count", "nc"), ("v", "avg", "av"),
            ("v", "min", "mn"), ("v", "max", "mx")]

    plain = auto_agg(df, ["k"], aggs)
    salted = auto_agg(df, ["k"], aggs, skew_ratio=100.0)
    to_set = lambda d: {
        r["k"]: (round(r["sv"], 6), r["nc"], round(r["av"], 9), r["mn"], r["mx"])
        for r in d.collect()
    }
    assert to_set(plain) == to_set(salted)

    p_plain = plain._jdf.queryExecution().executedPlan().toString()
    p_salted = salted._jdf.queryExecution().executedPlan().toString()
    assert "__salt" not in p_plain
    assert "__salt" in p_salted
