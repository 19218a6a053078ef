"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in ``scotustician_spark.plans`` (one registry entry per
operator from SURVEY.md §2); this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scotustician_spark.plans import QUERY_REGISTRY  # noqa: E402
from scotustician_spark.plans import relational  # noqa: E402,F401  (registers queries)
from scotustician_spark.plans import vectors_text  # noqa: E402,F401  (registers queries)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Star-join revenue rollup: scan→filter→join(broadcast dims)→agg —
    exercises the core of the engine in one plan.
    """
    return QUERY_REGISTRY["star_join_revenue"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in QUERY_REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each SQL-expressible query."""
    return {name: q.oracle for name, q in QUERY_REGISTRY.items() if q.oracle is not None}
