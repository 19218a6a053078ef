"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE compact JSON line (see the output contract below — no per-query
map on stdout; that is exactly the field whose size made BENCH_r04
and BENCH_r05 unparseable).

Each query is materialized via the noop sink (full execution, no
collect/serialization cost), timed individually after the session is
warm: one untimed warmup pass, then five timed passes keeping the
MINIMUM (the steady-state number — host noise on shared hardware is
up to 5× and only inflates) with the MEDIAN alongside as the
noise-aware reading. The same JSON also carries the paired DuckDB
anchor — each bench query's ORACLE SQL, min-of-3 on the same parquet
— so the Spark/DuckDB ratio is machine-readable per query
("paired": {name: {spark, duckdb, ratio}}) and in total ("ratio").
Set SPARK_GRAFT_SKIP_DUCKDB=1 to skip the anchor pass.

Output contract (round 6): stdout carries ONE compact JSON line —
{"metric", "value", "unit", "sf", "n_queries", "ratio",
"duckdb_total"} and NOTHING ELSE. BENCH_r04 and BENCH_r05 were both
parsed:null because the per-query map (~2 KB for 69 queries) alone
overflowed the driver's tail capture; the map now lives ONLY in
BENCH_DETAIL.json (per-query mins, medians, paired
spark/duckdb/ratio triples) next to this file.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
)


def duckdb_paired(registry, headline: list[str]) -> dict[str, float]:
    """Min-of-3 DuckDB wall for every headline query that has an
    oracle, over the same parquet. Single in-process engine, zero
    scheduler cost — per-query deltas beyond Spark's ~0.3-0.5 s fixed
    driver overhead are the signal."""
    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES.split():
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    out: dict[str, float] = {}
    for name in headline:
        oracle = registry[name].oracle
        if not oracle:
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(oracle).fetchall()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    con.close()
    return out


def main() -> None:
    from scotustician_spark.plans import QUERY_REGISTRY
    from scotustician_spark.plans import relational, vectors_text  # noqa: F401
    from scotustician_spark.session import get_spark

    spark = get_spark("bench")
    # bounded-relation global windows (top-N candidate pages, day/bucket
    # grids) are deliberate, but their per-task WindowExec warnings
    # nearly drowned the one-line stdout contract once (VERDICT r6
    # wrong-item c) — silence log noise for the bench run only
    spark.sparkContext.setLogLevel("ERROR")
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else -1.0

    headline = [name for name, q in QUERY_REGISTRY.items() if q.bench]

    # Untimed warmup pass (JIT/codegen + parquet footer cache + any
    # build-once index materialization), then N timed passes per query.
    for name in headline:
        QUERY_REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name in headline:
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            QUERY_REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)
        medians[name] = round(statistics.median(runs), 3)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
    }
    detail = {"queries": timings, "queries_median": medians, "sf": sf}

    if os.environ.get("SPARK_GRAFT_SKIP_DUCKDB") != "1":
        try:
            ddb = duckdb_paired(QUERY_REGISTRY, headline)
        except Exception as exc:  # anchor failure must not kill bench
            result["duckdb_error"] = str(exc)[:200]
        else:
            paired = {
                n: {
                    "spark": timings[n],
                    "duckdb": ddb[n],
                    "ratio": round(timings[n] / ddb[n], 2) if ddb[n] > 0 else None,
                }
                for n in ddb
            }
            sp = sum(timings[n] for n in ddb)
            dd = sum(ddb.values())
            detail["paired"] = paired
            detail["spark_paired_total"] = round(sp, 3)
            result["duckdb_total"] = round(dd, 3)
            result["ratio"] = round(sp / dd, 2) if dd > 0 else None

    here = os.path.dirname(os.path.abspath(__file__))
    # Legacy filename kept byte-for-byte compatible (driver contract);
    # ADDITIONALLY snapshot per-core-count detail so a later run at a
    # different $SPARK_GRAFT_CPUS (the driver's scaling pass) no longer
    # destroys the 32-core per-query numbers — r10's PERF per_query and
    # scaling tables were empty for exactly this reason (VERDICT r10
    # item 2: observability only; stdout contract unchanged).
    detail["cpus"] = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    for fname in ("BENCH_DETAIL.json", f"BENCH_DETAIL_c{detail['cpus']}.json"):
        with open(os.path.join(here, fname), "w") as fh:
            json.dump(detail, fh, indent=1)

    # The compact summary MUST be the final stdout line (driver tail
    # capture); detail lives in BENCH_DETAIL.json only.
    print(json.dumps(result))


if __name__ == "__main__":
    main()
