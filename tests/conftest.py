"""Shared fixtures: one tuned SparkSession per test run, a DuckDB
connection with the driver's tables registered, and the sf dir under
test (sf0.001 by default — fast dev loop; the driver gate runs sf0.01).
"""

from __future__ import annotations

import atexit
import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Point the build-once caches (persisted ANN indexes, rel_cache) at a
# per-run throwaway root BEFORE any engine module imports: tmp-path
# datasets the suites sweep mint fresh identity tags whose builds
# otherwise accumulate in the repo warehouse without bound (105 stale
# dirs by round 8). Must be set via env (the roots are module-level).
if "SPARK_GRAFT_CACHE_ROOT" not in os.environ:
    _cache_root = tempfile.mkdtemp(prefix="spark_graft_test_cache_")
    os.environ["SPARK_GRAFT_CACHE_ROOT"] = _cache_root
    atexit.register(shutil.rmtree, _cache_root, ignore_errors=True)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from scotustician_spark.session import get_spark

    spark = get_spark("pytest", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    import duckdb

    from scotustician_spark.testing import register_duckdb_views

    con = duckdb.connect()
    register_duckdb_views(con, sf_dir)
    yield con
    con.close()
