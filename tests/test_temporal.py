"""Temporal join operators: as-of (union+window) and binned range
join — equivalence against naive formulations plus plan-shape checks
(the whole point of these operators is the plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scotustician_spark.operators.temporal import asof_join, range_join_binned


def _left(spark):
    # (key, ts, left payload)
    return spark.createDataFrame(
        [
            (1, 100, "l-a"),
            (1, 205, "l-b"),  # ties exactly with a right row at 205
            (1, 50, "l-c"),  # before any right row -> nulls
            (2, 300, "l-d"),
            (3, 10, "l-e"),  # key with no right rows at all
        ],
        "k int, ts long, tag string",
    )


def _right(spark):
    return spark.createDataFrame(
        [
            (1, 90, 11, 0.5),
            (1, 205, 12, 1.5),  # at-or-before: ts == left 205 must match
            (1, 205, 13, 2.5),  # tie on ts -> max rid (13) wins
            (1, 300, 14, 3.5),  # after every left row for k=1
            (2, 100, 21, 9.0),
            (2, 299, 22, 8.0),
        ],
        "k int, rts long, rid int, rv double",
    )


def test_asof_join_semantics(spark):
    out = asof_join(
        _left(spark),
        _right(spark),
        on="k",
        left_ts="ts",
        right_ts="rts",
        right_payload={"rid": "prior_id", "rv": "prior_v"},
        tie_col="rid",
    )
    got = {r["tag"]: (r["prior_id"], r["prior_v"]) for r in out.collect()}
    assert got == {
        "l-a": (11, 0.5),  # latest right at-or-before 100 is 90
        "l-b": (13, 2.5),  # exact-ts match included; tie -> max rid
        "l-c": (None, None),  # nothing at-or-before
        "l-d": (22, 8.0),
        "l-e": (None, None),  # key absent from right
    }
    assert out.count() == 5  # left-outer: every left row exactly once


def test_asof_join_null_payload_field_not_backfilled(spark):
    # the latest right row has rv=NULL; argmax semantics must surface
    # that NULL, not back-fill rv from the older right row (a torn row
    # mixing fields of two right rows)
    left = spark.createDataFrame([(1, 300, "x")], "k int, ts long, tag string")
    right = spark.createDataFrame(
        [(1, 100, 11, 0.5), (1, 200, 12, None)],
        "k int, rts long, rid int, rv double",
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        right_payload={"rid": "prior_id", "rv": "prior_v"}, tie_col="rid",
    )
    [row] = out.collect()
    assert (row["prior_id"], row["prior_v"]) == (12, None)


def test_asof_join_single_exchange(spark):
    out = asof_join(
        _left(spark),
        _right(spark),
        on="k",
        left_ts="ts",
        right_ts="rts",
        right_payload={"rid": "prior_id"},
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one shuffle on the key — no join, no pair explosion
    assert plan.count("Exchange") == 1, plan


def test_range_join_binned_matches_naive(spark):
    import random

    rng = random.Random(7)
    left = spark.createDataFrame(
        [(rng.randrange(5), rng.randrange(1000), i) for i in range(200)],
        "k int, ts long, lid int",
    )
    right = spark.createDataFrame(
        [(rng.randrange(5), rng.randrange(1000), 100 + i) for i in range(200)],
        "k int, rts long, rid int",
    )
    lower, upper = 10, 75  # window [ts+10, ts+75)
    naive = (
        left.join(right, "k")
        .filter((F.col("rts") >= F.col("ts") + lower) & (F.col("rts") < F.col("ts") + upper))
        .select("lid", "rid")
    )
    expected = {(r["lid"], r["rid"]) for r in naive.collect()}
    assert expected  # sanity: the window actually matches something
    for bin_us in (upper - lower, 7, 1000):  # default, tiny, huge bins
        got = range_join_binned(
            left, right, on="k", left_ts="ts", right_ts="rts",
            lower_us=lower, upper_us=upper, bin_us=bin_us,
        ).select("lid", "rid")
        assert {(r["lid"], r["rid"]) for r in got.collect()} == expected, bin_us


def test_range_join_rejects_empty_window(spark):
    """Round-6 review: an inverted window made F.sequence descend over
    up to |upper-lower| bins per row (executor-memory blow-up) instead
    of 'no pairs' — reject loudly."""
    import pytest

    from scotustician_spark.operators.temporal import range_join_binned

    l = spark.createDataFrame([(1, 0)], "on int, lt long")
    r = spark.createDataFrame([(1, 0)], "on int, rt long")
    with pytest.raises(ValueError, match="empty range window"):
        range_join_binned(l, r, "on", "lt", "rt", lower_us=3_600_000_000, upper_us=0)


def test_range_join_is_equi_join(spark):
    left = spark.createDataFrame([(1, 100, 1)], "k int, ts long, lid int")
    right = spark.createDataFrame([(1, 120, 2)], "k int, rts long, rid int")
    out = range_join_binned(
        left, right, on="k", left_ts="ts", right_ts="rts", lower_us=0, upper_us=60
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the range predicate must NOT degrade the join to nested-loop
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan


def test_asof_join_forward_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 205, "b"), (1, 900, "c"), (2, 10, "d")],
        "k int, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 205, 11, 1.0), (1, 300, 12, 2.0), (1, 205, 13, 3.0)],
        "k int, ts long, rid int, val double",
    )
    fwd = {
        r["tag"]: r
        for r in asof_join(
            left,
            right,
            on="k",
            left_ts="ts",
            right_ts="ts",
            right_payload={"rid": "rid", "val": "val"},
            tie_col="rid",
            direction="forward",
        ).collect()
    }
    # at-or-after: exact ts 205 matches; ties (two right rows @205)
    # break by MIN rid for forward
    assert fwd["a"]["rid"] == 11  # next right after 100 is @205, min rid
    assert fwd["b"]["rid"] == 11  # exact-ts match counts
    assert fwd["c"]["rid"] is None  # nothing at-or-after 900
    assert fwd["d"]["rid"] is None  # key with no right rows
    # payload consistency: val belongs to the matched rid's row
    assert fwd["a"]["val"] == 1.0

    tol = {
        r["tag"]: r
        for r in asof_join(
            left,
            right,
            on="k",
            left_ts="ts",
            right_ts="ts",
            right_payload={"rid": "rid"},
            tie_col="rid",
            direction="forward",
            tolerance=50,
        ).collect()
    }
    # 100 -> 205 is 105 away: outside tolerance 50 -> null
    assert tol["a"]["rid"] is None
    assert tol["b"]["rid"] == 11  # distance 0

    back_tol = {
        r["tag"]: r
        for r in asof_join(
            left,
            right,
            on="k",
            left_ts="ts",
            right_ts="ts",
            right_payload={"rid": "rid"},
            tie_col="rid",
            direction="backward",
            tolerance=100,
        ).collect()
    }
    # backward @900: latest prior is @300 (gap 600) -> outside tolerance
    assert back_tol["c"]["rid"] is None
    # backward @205: exact match, ties break by MAX rid
    assert back_tol["b"]["rid"] == 13


def test_scd2_intervals_collapse_and_versions(spark):
    from scotustician_spark.operators.temporal import scd2_intervals

    rows = [
        # key A: x, x (re-observation, collapses), y, x again (new interval)
        ("A", 10, "x", 1),
        ("A", 20, "x", 2),
        ("A", 30, "y", 3),
        ("A", 40, "x", 4),
        # key B: single observation -> one open interval
        ("B", 15, "z", 5),
        # key C: attr flips to NULL and back -> NULL-safe change detection
        ("C", 1, "s", 6),
        ("C", 2, None, 7),
        ("C", 3, None, 8),
        ("C", 4, "s", 9),
    ]
    df = spark.createDataFrame(rows, "k string, ts long, attr string, eid long")
    out = scd2_intervals(df, "k", "ts", ["attr"], tie_col="eid").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    a = sorted(by_key["A"], key=lambda r: r["version"])
    assert [(r["attr"], r["valid_from"], r["valid_to"]) for r in a] == [
        ("x", 10, 30),
        ("y", 30, 40),
        ("x", 40, None),
    ]
    assert [r["is_current"] for r in a] == [False, False, True]
    assert [r["version"] for r in a] == [1, 2, 3]
    b = by_key["B"]
    assert len(b) == 1 and b[0]["is_current"] and b[0]["valid_from"] == 15
    c = sorted(by_key["C"], key=lambda r: r["version"])
    # s -> NULL (change), NULL re-observed (collapse), NULL -> s (change)
    assert [(r["attr"], r["valid_from"]) for r in c] == [
        ("s", 1),
        (None, 2),
        ("s", 4),
    ]


def test_scd2_single_shuffle_plan(spark):
    from scotustician_spark.operators.temporal import scd2_intervals

    df = spark.createDataFrame(
        [("A", 1, "x", 1), ("A", 2, "y", 2)], "k string, ts long, attr string, eid long"
    )
    plan = scd2_intervals(df, "k", "ts", ["attr"], tie_col="eid")._jdf.queryExecution().executedPlan().toString()
    # both window passes ride ONE exchange on the key
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_event_transition_matrix_hand_sequence(spark, tmp_path):
    import datetime as dt

    from scotustician_spark.plans import QUERY_REGISTRY

    # user 1: view -> click -> view; user 2: view -> click
    # transitions: view->click x2, click->view x1
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 1, "view", 0.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 0, 1, 0), 1, "click", 0.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 0, 2, 0), 1, "view", 0.0, "{}"),
        (4, dt.datetime(2024, 1, 1, 0, 0, 0), 2, "view", 0.0, "{}"),
        (5, dt.datetime(2024, 1, 1, 0, 1, 0), 2, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        (r["from_type"], r["next_type"]): r
        for r in QUERY_REGISTRY["event_transition_matrix"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out[("view", "click")]["n"] == 2
    assert out[("view", "click")]["prob"] == 1.0  # view always -> click
    assert out[("click", "view")]["n"] == 1
    assert out[("click", "view")]["prob"] == 1.0
    assert len(out) == 2  # no transition rows for sequence-final events
