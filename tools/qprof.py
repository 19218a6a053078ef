"""Per-stage profiler for a single registry query (guide §1: measure
first). Runs the query via the noop sink with the Spark UI enabled,
then reads the UI REST API to print every completed stage's wall,
task count, shuffle read/write and input bytes, sorted by submission
— so multi-job queries (iterative graph loops, index builds) show
exactly where the seconds go instead of one opaque total.

Usage: python tools/qprof.py <query> [more queries...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_QPROF_RUNS (default 1 timed run after 1 warmup)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("SPARK_GRAFT_QPROF_RUNS", "1"))


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> int:
    from scotustician_spark.plans import QUERY_REGISTRY
    from scotustician_spark.session import get_spark

    names = sys.argv[1:]
    spark = get_spark("qprof", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    for name in names:
        fn = QUERY_REGISTRY[name].fn
        # untimed warmup (footer cache, codegen, persisted index builds)
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

        jobs_before = {j["jobId"] for j in _get(f"{ui}/api/v1/applications/{app_id}/jobs")}
        walls = []
        for i in range(N_RUNS):
            spark.sparkContext.setJobGroup(f"qprof-{name}", f"qprof {name} run{i}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
        spark.sparkContext.setJobGroup("qprof-idle", "idle")
        wall = min(walls)

        jobs = [
            j
            for j in _get(f"{ui}/api/v1/applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before and j.get("jobGroup", "").startswith(f"qprof-{name}")
        ]
        # keep only the FIRST timed run's jobs (between run0 start and run1 start)
        stage_ids = set()
        run0 = [j for j in jobs if "run0" in (j.get("description") or "")]
        if not run0:
            run0 = jobs
        for j in run0:
            stage_ids.update(j["stageIds"])

        stages = _get(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
        rows = []
        for s in stages:
            if s["stageId"] not in stage_ids:
                continue
            dur = s.get("executorRunTime", 0) / 1000.0
            sub = s.get("submissionTime", "")
            ct = s.get("completionTime", "")
            rows.append(
                (
                    s["stageId"],
                    sub,
                    ct,
                    s.get("numCompleteTasks", 0),
                    dur,
                    s.get("inputBytes", 0),
                    s.get("shuffleReadBytes", 0),
                    s.get("shuffleWriteBytes", 0),
                    (s.get("name") or "").split("\n")[0][:80],
                )
            )
        rows.sort(key=lambda r: r[0])
        print(f"\n=== {name}: wall(min of {N_RUNS}) = {wall:.3f}s, "
              f"{len(run0)} jobs, {len(rows)} stages ===")
        print(f"{'stage':>5} {'tasks':>5} {'cpu_s':>8} {'input':>10} "
              f"{'sh_read':>10} {'sh_write':>10}  name")
        for r in rows:
            print(
                f"{r[0]:>5} {r[3]:>5} {r[4]:>8.2f} {r[5]:>10} {r[6]:>10} "
                f"{r[7]:>10}  {r[8]}"
            )
        # wall decomposition by job (submission→completion)
        from datetime import datetime

        def _p(ts):
            return datetime.strptime(ts[:23], "%Y-%m-%dT%H:%M:%S.%f")

        jrows = []
        for j in sorted(run0, key=lambda j: j["jobId"]):
            try:
                d = (_p(j["completionTime"]) - _p(j["submissionTime"])).total_seconds()
            except Exception:
                d = float("nan")
            jrows.append((j["jobId"], d, len(j["stageIds"])))
        print(f"{'job':>5} {'wall_s':>8} {'stages':>6}")
        for jid, d, ns in jrows:
            print(f"{jid:>5} {d:>8.3f} {ns:>6}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
