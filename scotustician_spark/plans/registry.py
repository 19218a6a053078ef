"""Query registry: every operator from SURVEY.md §2 gets a named query
over the driver's synthetic tables plus (when SQL-expressible) an
equivalent DuckDB oracle SQL string.

The registry is the single source of truth consumed by
``__spark_entry__.py`` (driver contract), ``bench.py`` and the tests.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over pre-registered table views
    doc: str = ""
    bench: bool = False  # include in bench.py headline set


QUERY_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = "", bench: bool = False):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERY_REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc, bench=bench)
        return fn

    return deco
