"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is materialized via the noop sink (full execution, no
collect/serialization cost), timed individually after the session is
warm. value = total seconds across the headline set.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from scotustician_spark.plans import QUERY_REGISTRY
    from scotustician_spark.plans import relational, vectors_text  # noqa: F401
    from scotustician_spark.session import get_spark

    spark = get_spark("bench")
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else -1.0

    headline = [name for name, q in QUERY_REGISTRY.items() if q.bench]

    # One untimed warmup pass (JIT/codegen + parquet footer cache), then
    # three timed passes per query, keeping the minimum — steady-state
    # throughput on a long-lived cluster, robust to host-level noise
    # (observed run-to-run variance up to 5× on shared hardware).
    for name in headline:
        QUERY_REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()

    timings: dict[str, float] = {}
    for name in headline:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            QUERY_REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
