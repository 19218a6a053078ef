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
