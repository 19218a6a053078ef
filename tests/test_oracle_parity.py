"""Differential test: every registry query vs its DuckDB oracle at
sf0.001 — the same comparison the driver's correctness gate runs at
sf0.01 (row-count + schema + order-insensitive value hash).

Queries without an oracle (non-SQL-expressible) get a weaker
runs-and-returns-rows smoke check.
"""

from __future__ import annotations

import pytest

from scotustician_spark.plans import QUERY_REGISTRY
from scotustician_spark.plans import relational, vectors_text  # noqa: F401
from scotustician_spark.testing import compare_spark_duckdb

ALL = sorted(QUERY_REGISTRY)

# The declared rows-only set: every other query MUST carry an oracle.
# Growing this set is a deliberate decision, not drift — add the name
# here WITH a reason in the query's doc, or the coverage test fails.
ROWS_ONLY: set[str] = set()
# Round 7 emptied the set: als_recommendations (the last rows-only row)
# now persists its fitted factor tables and both engines recompute
# score = dot(user, item) + top-k FROM them, so BLAS-nondeterministic
# factor values are comparison inputs rather than outputs. Rounds 5-6
# converted the other four ML rows via deterministic twins (lloyd_ctes
# / power-iteration PCA / JSON parse-back) — see plans/ml_analysis.py.


def test_registry_oracle_coverage_does_not_drift():
    """The driver samples ~50 queries per round; this pins the full
    registry's oracle coverage so unsampled oracles cannot silently
    disappear: every non-declared query has an oracle, and the
    per-query parametrization below therefore runs the identical
    driver comparison over ALL of them every CI run."""
    total = len(QUERY_REGISTRY)
    no_oracle = {n for n, q in QUERY_REGISTRY.items() if not q.oracle}
    assert total >= 168, f"registry shrank to {total}"
    assert no_oracle == ROWS_ONLY, (
        f"oracle coverage drifted: unexpected rows-only {sorted(no_oracle - ROWS_ONLY)}, "
        f"missing {sorted(ROWS_ONLY - no_oracle)}"
    )


def test_driver_window_contains_resample_pins():
    """The driver hash-verifies the FIRST 50 registry entries. Two
    invariants keep the rotation honest: every _MUST_RESAMPLE pin
    (prior driver-RED or rows-only-era rows) is inside that window,
    and pins resolve to real registered queries — a rename or a
    rotation edit that silently drops a pin would leave a known-weak
    row unverified for another round."""
    from scotustician_spark.plans import _MUST_RESAMPLE

    names = list(QUERY_REGISTRY)
    window = set(names[:50])
    missing = [n for n in _MUST_RESAMPLE if n not in QUERY_REGISTRY]
    assert not missing, f"_MUST_RESAMPLE names not in registry: {missing}"
    out = [n for n in _MUST_RESAMPLE if n not in window]
    assert not out, f"_MUST_RESAMPLE pins outside the first-50 window: {out}"


def test_no_oracle_emits_hugeint(duck, spark, sf_dir):
    """Guard for the round-7 driver regression: an untyped sum() over an
    integer column is typed HUGEINT by DuckDB, and the driver's value
    hash renders HUGEINT differently from BIGINT even when the Python
    ints are identical (dataset_splits / pack_sequences were driver-red
    for exactly this in r07). DESCRIBE every registered oracle and
    reject any 128-bit output column — wrap integer sums as
    CAST(sum(...) AS BIGINT), per the repo's float-parity ladder."""
    # The ALS oracle reads the PERSISTED factor tables (rel_cache glob);
    # with the per-run test cache root (conftest) nothing has built them
    # yet when this sweep runs before the parity loop — run the Spark
    # side once so every oracle is DESCRIBE-able.
    QUERY_REGISTRY["als_recommendations"].fn(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    offenders = {}
    for name in ALL:
        q = QUERY_REGISTRY[name]
        if q.oracle is None:
            continue
        cols = duck.execute(f"DESCRIBE {q.oracle}").fetchall()
        bad = [
            (c[0], c[1])
            for c in cols
            if c[1].upper() in ("HUGEINT", "UHUGEINT")
            or c[1].upper().startswith("DECIMAL")
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"oracles with 128-bit/DECIMAL output columns: {offenders}"


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    q = QUERY_REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    if q.oracle is None:
        rows = sdf.limit(1001).collect()
        assert rows is not None and sdf.columns, f"{name}: empty schema"
        return
    problems = compare_spark_duckdb(sdf, duck, q.oracle)
    assert not problems, f"{name}: {problems}"
