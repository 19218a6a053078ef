"""Lineage cuts for iterative loops: local by default, RELIABLE on
request.

Every iterative operator in this package (pagerank, label propagation,
k-core peel, connected components, the BPE merge loop) cuts lineage
per round — otherwise the plan grows by one join+agg per round and the
optimizer re-analyzes an ever-deeper tree. ``localCheckpoint`` is the
cheap cut (blocks cached on executors), but its blocks DIE WITH THE
EXECUTOR: on a real cluster an executor loss mid-loop forces an
unbounded lineage recomputation that the cut just discarded. For
cluster runs, pass ``checkpoint_dir`` to the iterative operators and
the cut becomes a reliable ``checkpoint()`` to that fault-tolerant
store (HDFS/S3) — round state survives executor loss at the cost of
one write per round.

The two cuts produce IDENTICAL results (asserted in tests); the
parameter trades recovery cost for per-round write cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut_lineage(
    df: DataFrame, eager: bool = True, checkpoint_dir: str | None = None
) -> DataFrame:
    """Cut ``df``'s lineage: ``localCheckpoint(eager)`` by default, or
    a reliable ``checkpoint(eager)`` into ``checkpoint_dir`` when set
    (the directory is registered with the SparkContext on first use;
    re-registering the same dir is a no-op)."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty() or (
        checkpoint_dir not in str(sc._jsc.sc().getCheckpointDir().get())
    ):
        sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=eager)


def cut_lineage_observed(
    df: DataFrame, exprs, checkpoint_dir: str | None = None
) -> tuple[DataFrame, dict]:
    """Eagerly cut ``df``'s lineage and piggyback observed aggregate
    metrics on the SAME materialization job.

    Iterative convergence loops need one aggregate per round (a label
    checksum, a surviving-edge count) to decide whether to stop. Run
    as a separate ``.agg(...).collect()`` that is one extra Spark job
    per round on top of the eager cut — pure scheduler/agg overhead
    that the x10 LPA audit measured at ~0.16 s/round. Attaching the
    aggregate as a ``pyspark.sql.Observation`` instead makes
    ``CollectMetricsExec`` accumulate it WHILE the checkpoint job runs
    (``Dataset.checkpoint`` goes through ``withAction``, so the
    observed-metrics listener fires for both local and reliable cuts —
    verified for both in tests), so the probe becomes free.

    Returns ``(cut_df, metrics_dict)``. The returned relation's plan is
    the post-checkpoint scan — the CollectMetrics node does not survive
    into downstream plans. Empty relations observe NULL sums (callers
    compare checksums with ``==``, and None == None is the correct
    "stable" verdict for an empty fixpoint).
    """
    from pyspark.sql import Observation

    obs = Observation()
    cut = cut_lineage(df.observe(obs, *exprs), True, checkpoint_dir)
    return cut, obs.get
