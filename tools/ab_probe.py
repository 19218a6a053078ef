"""Same-host A/B timer for the ANN serving-path queries.

Round-8 VERDICT isolated a +0.2-0.3 s/call regression on
ann_probe_only / ann_append_probe / lsh_ann_topk (ivfflat and the
window_ranks scheduler-floor control stayed flat). This harness times
exactly that family in ISOLATION — one session, one untimed warmup
per query (builds any persisted index), then min-of-N timed noop
sinks — so a run on HEAD and a run inside a worktree at the r7 bench
commit are directly comparable (the round-8 judge's technique).

Usage: python tools/ab_probe.py [label]   # prints one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))

QUERIES = [
    "ann_probe_only",
    "ann_append_probe",
    "lsh_ann_topk",
    "ivfflat_probe_only",
    "ann_rerank_topk",
    "window_ranks",  # scheduler-floor control: flat unless the host moved
]


def main() -> None:
    from scotustician_spark.plans import QUERY_REGISTRY
    from scotustician_spark.session import get_spark

    label = sys.argv[1] if len(sys.argv) > 1 else "head"
    spark = get_spark("ab_probe")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, float] = {}
    for name in QUERIES:
        if name not in QUERY_REGISTRY:
            continue
        fn = QUERY_REGISTRY[name].fn
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        out[name] = round(min(runs), 3)
    print(json.dumps({"label": label, "sf_dir": SF_DIR, "min_of": N_RUNS, "queries": out}))


if __name__ == "__main__":
    main()
