"""Measured scaling curve: run representative operators at sf0.001 /
sf0.01 / sf0.1 (1x / 10x / 100x rows) plus a SYNTHETIC 10x-of-sf0.1
tier (~sf1: 6M lineitem, 1.5M orders, 1M events, 50k documents, 20k
vectors) and record wall-clock per scale, writing SCALING.md.

The point is evidence for the 100 TB claims: an operator whose cost is
dominated by per-row work should scale ~linearly in rows once the
fixed driver/scheduler cost (~0.2-0.5 s per query on this host) is
amortized; candidate-generation operators (LSH/banding) should scale
with collision counts, not pairs; a SERVED index probe should scale
with |probed lists|, i.e. stay nearly flat as the corpus grows.

The synthetic tier is 10 key-shifted copies of the sf0.1 tables with
REALISTIC variation (driver data stays read-only, the tier caches
under spark-warehouse/):
- documents: copy k drops every (k+2)-th token — each doc gains ~9
  near-duplicate variants, the boilerplate-variant structure a real
  crawl has, so dedup candidate counts grow with real clique shape
  (pair output grows FASTER than rows by construction — that is the
  workload, not the algorithm).
- embeddings: per-copy deterministic perturbation (no exact-tie
  collapse); relational tables: FK-consistent key offsets.

Run on a QUIET host (no concurrent pytest/bench) — host noise is up to
2x on shared hardware; min-of-3 only filters the upside.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["0.001", "0.01", "0.1"]
COPIES = 10
OFF = 1_000_000_000  # per-copy key offset, above any base key

# operator families: per-row compute, candidate-generation, join/agg,
# window/rank, iterative graph, served-index probe
QUERIES = [
    "dedup_exact_groups",
    "minhash_lsh_pairs",
    "simhash_near_pairs",
    "winnowing_pairs",
    "duplicate_spans",
    "token_heavy_hitters",
    "star_join_revenue",
    "case_summaries",
    "cosine_topk",
    "embedding_near_dup",
    "label_propagation_communities",
    "hybrid_rrf_search",
    "bpe_compression_by_source",
    "vocab_growth",
]

# subset measured on the synthetic ~sf1 tier (the all-pairs and
# span-index ops are excluded where the constructed near-dup cliques
# would measure the workload blow-up, not the operator)
X1000_QUERIES = [
    "dedup_exact_groups",
    "minhash_lsh_pairs",
    "token_heavy_hitters",
    "star_join_revenue",
    "case_summaries",
    "cosine_topk",
    "bpe_apply_tokenize",
    "quality_classifier_filter",
    "label_propagation_communities",
    "ann_probe_only",
    "source_overlap_jaccard",
    "cms_token_error",
    "psi_drift",
    "event_sessions",
    "copurchase_triangles",
    "bpe_compression_by_source",
    "vocab_growth",
]


def build_x1000_tier(spark, base: str, out: str) -> None:
    """10 FK-consistent, realistically-varied copies of every sf0.1
    table, cached under ``out``. Idempotent via the last table's
    _SUCCESS marker."""
    from pyspark.sql import functions as F

    if os.path.exists(f"{out}/embeddings.parquet/_SUCCESS"):
        return
    os.makedirs(out, exist_ok=True)

    def tenfold(t, shift_cols=(), variant=None):
        df = spark.read.parquet(f"{base}/{t}.parquet")
        parts = []
        for k in range(COPIES):
            c = df
            for col in shift_cols:
                c = c.withColumn(col, F.col(col) + F.lit(k * OFF))
            if variant is not None:
                c = variant(c, k)
            parts.append(c)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/{t}.parquet")

    for t in ("region", "nation"):  # fixed dims, like TPC-H
        spark.read.parquet(f"{base}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
    tenfold("customer", ("c_custkey",))
    tenfold("supplier", ("s_suppkey",))
    tenfold("part", ("p_partkey",))
    tenfold("orders", ("o_orderkey", "o_custkey"))
    tenfold("lineitem", ("l_orderkey", "l_partkey", "l_suppkey"))
    tenfold("events", ("event_id", "user_id"))

    def doc_variant(c, k):
        if k == 0:
            return c
        toks = F.split(
            F.regexp_replace(F.col("text"), r"^\s+|\s+$", ""), r"\s+"
        )
        kept = F.array_join(
            F.filter(toks, lambda t, i: i % (k + 2) != 0), " "
        )
        return c.withColumn("text", kept).withColumn(
            "n_chars", F.length("text").cast("long")
        )

    tenfold("documents", ("doc_id",), doc_variant)

    def emb_variant(c, k):
        if k == 0:
            return c
        pert = F.transform(
            F.col("embedding"),
            lambda x, i: (
                x + F.sin(F.col("vec_id") * 7 + i + k * 13) * 0.05
            ).cast("float"),
        )
        return c.withColumn("embedding", pert)

    tenfold("embeddings", ("vec_id",), emb_variant)


def _time(q, spark, sf_dir: str, n: int = 3) -> float:
    q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    from scotustician_spark.plans import QUERY_REGISTRY
    from scotustician_spark.session import get_spark

    spark = get_spark(
        "scaling-audit",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    x1000_dir = os.path.join(repo, "spark-warehouse", "sfx10_synth")
    build_x1000_tier(spark, "/root/testdata/sf0.1", x1000_dir)

    rows: dict[str, dict[str, float]] = {}
    for name in QUERIES:
        q = QUERY_REGISTRY[name]
        rows[name] = {}
        for sf in SFS:
            rows[name][sf] = _time(q, spark, f"/root/testdata/sf{sf}")
            print(f"{name} sf{sf}: {rows[name][sf]:.3f}s", flush=True)

    x1000: dict[str, tuple[float, float]] = {}
    for name in X1000_QUERIES:
        q = QUERY_REGISTRY[name]
        base = rows.get(name, {}).get("0.1") or _time(
            q, spark, "/root/testdata/sf0.1"
        )
        big = _time(q, spark, x1000_dir, n=2)
        x1000[name] = (base, big)
        print(f"{name} x10-tier: {big:.3f}s (sf0.1 {base:.3f}s)", flush=True)

    lines = [
        "# SCALING — measured wall-clock across 1x / 10x / 100x data",
        "",
        "Generated by tools/scaling_audit.py on local[32]; min-of-3 after a",
        "warm-up pass, noop sink (full execution, no collect). The",
        "`x10→x100` column is the wall-clock ratio for the final 10x data",
        "step — the informative one: at sf0.001 nearly every query sits on",
        "the ~0.2-0.5 s driver/scheduler floor. Ratios well under 10 on the",
        "10x step mean the operator is still amortizing fixed cost or its",
        "work scales sub-linearly (candidate generation bounded by",
        "collisions); ratios near 10 are honest per-row linearity.",
        "",
        "| query | sf0.001 | sf0.01 | sf0.1 | x10→x100 |",
        "|---|---|---|---|---|",
    ]
    for name in QUERIES:
        r = rows[name]
        step = r["0.1"] / r["0.01"] if r["0.01"] > 0 else float("nan")
        lines.append(
            f"| {name} | {r['0.001']:.3f}s | {r['0.01']:.3f}s "
            f"| {r['0.1']:.3f}s | {step:.1f}x |"
        )
    lines += [
        "",
        "## Synthetic ~sf1 tier (10x sf0.1: 6M lineitem / 1.5M orders /",
        "1M events / 50k documents / 20k vectors)",
        "",
        "Ten FK-consistent key-shifted copies of sf0.1 with realistic",
        "variation (per-copy token dropout in documents — each doc gains",
        "~9 near-duplicate variants, a crawl's boilerplate-variant shape;",
        "deterministic embedding perturbation). min-of-2. Notes:",
        "dedup pair OUTPUT grows faster than rows here by construction",
        "(the near-dup cliques are the workload); ann_probe_only pays a",
        "one-time index build for the tier (cached by fingerprint), the",
        "probe itself is the measured number and should stay nearly flat —",
        "its cost is |probed lists|, not corpus size.",
        "",
        "| query | sf0.1 | x10 tier | ratio |",
        "|---|---|---|---|",
    ]
    for name in X1000_QUERIES:
        base, big = x1000[name]
        lines.append(
            f"| {name} | {base:.3f}s | {big:.3f}s | {big / base:.1f}x |"
        )
    out = os.path.join(repo, "SCALING.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
