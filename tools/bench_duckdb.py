"""DuckDB side of the performance anchor.

BASELINE.md's driver-imposed target is "within 2x of baseline at the
same scale factor", with DuckDB-on-sf0.1 named as the practical anchor
for the relational layer. This runs every bench-flagged query's ORACLE
SQL on DuckDB over the same parquet bench.py reads, min-of-3, and
prints one JSON line shaped like bench.py's so the two are directly
comparable.

Caveat for reading the numbers: DuckDB executes here as a single
in-process engine with zero planning/scheduling overhead, while each
Spark query pays ~0.5-1.5 s of fixed driver/scheduler cost that is
amortized to nothing at real data sizes. Per-query deltas beyond that
fixed cost are the signal.

Usage: python tools/bench_duckdb.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings"


def main() -> int:
    import duckdb

    from scotustician_spark.plans import QUERY_REGISTRY

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES.split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    out, total = {}, 0.0
    for name, q in QUERY_REGISTRY.items():
        if not q.bench or not q.oracle:
            continue
        best = None
        for _ in range(3):
            t0 = time.time()
            con.execute(q.oracle).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        total += best
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": out,
                "sf": float(sf_dir.rstrip("/").split("sf")[-1]),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
