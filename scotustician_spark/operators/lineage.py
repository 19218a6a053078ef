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
