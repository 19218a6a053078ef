"""Bloom-filter semi-join pruning: zero false negatives by
construction, exact-result equivalence to a plain semi join, and the
pre-filter genuinely dropping rows before the exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from scotustician_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_num_bits,
    bloom_semi_join,
)


def test_bloom_no_false_negatives_and_fpp(spark):
    dim = spark.range(0, 500).select((F.col("id") * 7 + 3).alias("k"))
    bits = bloom_num_bits(500, fpp=0.01)
    bloom = bloom_build(dim, "k", bits)
    probe = spark.range(0, 20000).select(F.col("id").alias("k")).join(
        F.broadcast(bloom)
    )
    hits = probe.filter(bloom_might_contain(F.col("__bloom"), F.col("k"), bits))
    hit_keys = {r["k"] for r in hits.collect()}
    member = {i * 7 + 3 for i in range(500) if i * 7 + 3 < 20000}
    # every true member passes the filter — bloom never false-negatives
    assert member <= hit_keys
    # false-positive rate lands near the sizing target (generous bound)
    fp = len(hit_keys - member) / (20000 - len(member))
    assert fp < 0.05, fp


def test_bloom_semi_join_equals_plain_semi(spark):
    fact = spark.range(0, 5000).select(
        (F.col("id") % 997).alias("fk"), F.col("id").alias("payload")
    )
    dim = spark.range(0, 200).select((F.col("id") * 5).alias("dk"))
    out = bloom_semi_join(fact, dim, "fk", "dk", num_bits=1 << 12)
    plain = fact.join(
        dim.select(F.col("dk").alias("fk")).distinct(), "fk", "left_semi"
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, plain.collect()))


def test_bloom_prefilter_drops_rows_before_join(spark):
    fact = spark.range(0, 10000).select(F.col("id").alias("fk"))
    dim = spark.range(0, 50).select((F.col("id") * 100).alias("dk"))
    bits = bloom_num_bits(50, fpp=0.001)
    bloom = bloom_build(dim, "dk", bits)
    pre = fact.join(F.broadcast(bloom)).filter(
        bloom_might_contain(F.col("__bloom"), F.col("fk"), bits)
    )
    n_pre = pre.count()
    # 50 members out of 10000 — the pre-filter must kill almost all
    # non-members before any join happens
    assert n_pre < 200, n_pre
    assert bloom_semi_join(fact, dim, "fk", "dk", num_bits=bits).count() == 50


def test_bloom_anti_join_equals_plain_anti(spark):
    from scotustician_spark.operators.bloom import bloom_anti_join

    fact = spark.range(0, 5000).select(
        (F.col("id") % 997).alias("fk"), F.col("id").alias("payload")
    )
    dim = spark.range(0, 200).select((F.col("id") * 5).alias("dk"))
    out = bloom_anti_join(fact, dim, "fk", "dk", num_bits=1 << 12)
    plain = fact.join(
        dim.select(F.col("dk").alias("fk")).distinct(), "fk", "left_anti"
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, plain.collect()))
    # and with an undersized (high-fpp) bloom, results are STILL exact
    tiny = bloom_anti_join(fact, dim, "fk", "dk", num_bits=256)
    assert sorted(map(tuple, tiny.collect())) == sorted(map(tuple, plain.collect()))


def test_choose_semi_strategy_branches():
    from scotustician_spark.operators.bloom import choose_semi_strategy

    mb = 1024 * 1024
    assert choose_semi_strategy(5 * mb) == "broadcast"
    assert choose_semi_strategy(50 * mb) == "bloom"
    assert choose_semi_strategy(50 * mb, skew_ratio=3.0) == "bloom"
    assert choose_semi_strategy(50 * mb, skew_ratio=20.0) == "salted"
    # skew never overrides a broadcastable dim: broadcast has no
    # shuffle to skew
    assert choose_semi_strategy(5 * mb, skew_ratio=20.0) == "broadcast"


def test_auto_semi_join_all_branches_agree(spark):
    """The three strategies return identical rows, and each forced
    branch produces its signature plan shape: broadcast -> a LeftSemi
    BroadcastHashJoin with no bloom bit-set filter; bloom -> the
    xxhash64 bit-probe in the scan-stage Filter; salted -> the settle
    join keyed on (key, __salt)."""
    from pyspark.sql import functions as F

    from scotustician_spark.operators.bloom import auto_semi_join

    fact = spark.range(2000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(40).select((F.col("id") * 2).alias("dk"))
    want = sorted(
        (r["k"], r["v"])
        for r in fact.join(
            dim.select(F.col("dk").alias("k")), "k", "left_semi"
        ).collect()
    )

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    # measured path at this size: broadcast
    auto = auto_semi_join(fact, dim, "k", "dk")
    assert sorted((r["k"], r["v"]) for r in auto.collect()) == want
    p = plan_of(auto)
    assert "BroadcastHashJoin" in p and "LeftSemi" in p
    assert "xxhash64" not in p and "__salt" not in p

    # forced bloom (threshold below any real relation estimate)
    bloom = auto_semi_join(fact, dim, "k", "dk", broadcast_threshold=-1)
    assert sorted((r["k"], r["v"]) for r in bloom.collect()) == want
    p = plan_of(bloom)
    assert "xxhash64" in p and "__salt" not in p

    # forced salted settle (too-big dim + measured skew)
    salted = auto_semi_join(
        fact, dim, "k", "dk", broadcast_threshold=-1, skew_ratio=100.0
    )
    assert sorted((r["k"], r["v"]) for r in salted.collect()) == want
    p = plan_of(salted)
    assert "xxhash64" in p and "__salt" in p


def test_auto_semi_join_salted_handles_maps_and_duplicate_rows(spark):
    """ADVICE r5 + round-6 review: the salt must (a) not fail
    analysis on MAP-typed fact columns, (b) spread a hot key whose
    rows differ in any column across salts, and (c) stay
    DETERMINISTIC per row — it feeds the shuffle key, so
    monotonically_increasing_id-style expressions would drop or
    duplicate rows under partial stage recompute (SPARK-23207).
    Exact full-row duplicates sharing one salt is the documented
    residual caveat."""
    from pyspark.sql import functions as F

    from scotustician_spark.operators.bloom import auto_semi_join

    fact = (
        spark.range(400)
        .select(
            F.lit(7).alias("k"),
            F.col("id").cast("int").alias("v"),  # hot key, distinct rows
            F.create_map(F.lit("a"), F.lit(1)).alias("m"),  # unhashable
        )
        .unionByName(
            spark.range(50).select(
                (F.col("id") % 5).alias("k"),
                F.col("id").cast("int").alias("v"),
                F.create_map(F.lit("b"), F.lit(2)).alias("m"),
            )
        )
    )
    dim = spark.createDataFrame([(7,), (2,), (4,)], "dk long")
    out = auto_semi_join(
        fact, dim, "k", "dk", broadcast_threshold=-1, skew_ratio=100.0,
        n_salts=8,
    )
    rows = out.collect()  # analyzes and executes despite the MAP column
    assert len(rows) == 400 + 20  # hot k=7 rows + k in {2,4} from the range
    # determinism + spread: the salt expression (hashable columns only)
    # is a pure function of row values — same rows, same salts, every
    # evaluation — and the hot key's distinct rows fan out over salts
    hashable = [c for c, t in fact.dtypes if "map<" not in t]
    salt = F.pmod(F.xxhash64(*hashable), F.lit(8)).cast("int")
    s1 = fact.filter(F.col("k") == 7).select(salt.alias("s"))
    assert s1.distinct().count() > 1
    assert sorted(r["s"] for r in s1.collect()) == sorted(
        r["s"] for r in s1.collect()
    )


def test_estimated_rows_floor_on_heuristic_estimates(spark):
    """sizeInBytes-derived estimates (no CBO rowCount) are floored at
    ESTIMATE_FLOOR_KEYS: a post-filter dim that Catalyst underestimates
    must never produce a near-zero-bit filter whose FPP→1 silently
    turns the pre-filter into a no-op at scale (r10 VERDICT item).
    The floor only ever LOWERS the FPP, so results stay exact."""
    import pandas as pd

    from scotustician_spark.operators.bloom import (
        ESTIMATE_FLOOR_KEYS,
        estimated_rows,
    )

    # Arrow local relation → LocalRelation leaf: sizeInBytes is tiny
    # and rowCount is absent through the Filter+Project chain, so this
    # lands on the byte-heuristic path the floor guards
    dim = spark.createDataFrame(pd.DataFrame({"k": list(range(100))}))
    narrowed = dim.filter(F.col("k") % 97 == 0).select("k")
    plan = narrowed._jdf.queryExecution().optimizedPlan()
    if plan.stats().rowCount().isDefined():
        import pytest

        pytest.skip("engine provided an exact rowCount; heuristic path not hit")
    assert estimated_rows(narrowed) >= ESTIMATE_FLOOR_KEYS
