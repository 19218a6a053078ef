"""Connected components over a candidate-pair graph.

The dedup operators (``operators/dedup.py``) emit *pairs* — but a
training-data pipeline must resolve pairs into duplicate *clusters*
(A~B and B~C puts A,B,C in one group even if A,C never collided) and
keep one canonical document per cluster. The reference has nothing
like this (its dedup is exact unique-key skip, helpers.py:287-296);
it is the standard missing piece between LSH and an actual dedup'd
corpus.

Algorithm: hash-min label propagation WITH POINTER DOUBLING. Every
vertex starts labeled with its own id; each round, every vertex takes
the min label over itself and its neighbors, then follows its label's
own label (label(label(v)) — the shortcutting step of Shiloach-Vishkin
/ Kiveris et al.'s MapReduce components). The neighbor step alone
moves a minimum one hop per round (O(diameter) rounds — a chain longer
than max_iter would be SILENTLY mislabeled); composing with the
doubling step squares the reach, so convergence is O(log diameter) —
near-dup clusters are dense and tiny (diameter ≲ 3-4, 3-5 rounds in
practice), and the default 30-round cap now covers diameter ~2^29
instead of 30. Each round is one equi-join + one groupBy + one
label-lookup self-join, all keyed on vertex ids, so AQE can
coalesce/skew-split them; lineage is cut per round with
localCheckpoint, or the loop would replan a 2^k-deep DAG. Convergence
is detected by a type-agnostic label checksum (sum of xxhash64(comp),
accumulated in decimal so it cannot overflow) observed ON the
checkpoint job — no extra action, no extra join — and it works for
string vertex ids (docket numbers like '80-1538') exactly as for
numeric ones; a numeric cast would crash under ANSI mode or go NULL
silently otherwise. Exhausting max_iter without the checksum settling
raises instead of returning min-within-reach labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lineage import cut_lineage, cut_lineage_observed


def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    id_col: str = "doc_id",
    max_iter: int = 30,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Label every vertex with the minimum vertex id reachable from it
    (the component id). Vertices absent from ``edges`` are singleton
    components labeled by themselves.

    ``checkpoint_dir``: use RELIABLE per-round checkpoints (survive
    executor loss on a cluster) instead of localCheckpoint — see
    operators/lineage.py.

    Returns (``id_col``, ``component_id``).
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = cut_lineage(sym.distinct(), True, checkpoint_dir)  # reused every round

    verts = vertices.select(F.col(id_col).alias("u")).distinct()
    # seed labels from vertices ∪ EDGE ENDPOINTS: an endpoint missing
    # from `vertices` would otherwise enter labels only via neighbor
    # messages — its own id never participates in the min, so e.g.
    # edges=[(1,5)], vertices=[5] would label 5 as component 5 instead
    # of the true minimum 1. Phantom endpoints propagate their ids but
    # are filtered from the OUTPUT, preserving the one-row-per-vertex
    # contract.
    seed = verts.unionByName(sym.select("u")).distinct()
    # hash-min labels only ever decrease, so the label multiset is
    # stable iff its hash-sum is; xxhash64 works on any id type
    # (string doc ids included) and the decimal accumulator cannot
    # overflow or go NULL, so checksum equality ⇔ convergence
    # (modulo a 2^-64 collision). The checksum rides as an Observation
    # on the per-round checkpoint job itself (cut_lineage_observed) —
    # the former separate .agg().collect() was one extra job per round.
    _ck = F.sum(F.xxhash64("comp").cast("decimal(38,0)")).alias("s")
    labels, m = cut_lineage_observed(
        seed.select("u", F.col("u").alias("comp")), [_ck], checkpoint_dir
    )
    prev_sum = m["s"]
    converged = False
    for _ in range(max_iter):
        msgs = sym.join(labels, "u").select(F.col("v").alias("u"), "comp")
        cand = (
            labels.unionByName(msgs)
            .groupBy("u")
            .agg(F.min("comp").alias("comp"))
        )
        # pointer doubling: follow the label's own label. Pure hash-min
        # moves a component's minimum ONE hop per round — O(diameter)
        # rounds, and a chain longer than max_iter silently mislabeled
        # (the streaming bench's 50k-edge stitched paths hit exactly
        # this). Composing each round with label(label(v)) squares the
        # reach per round — O(log diameter) — for one extra
        # vertex-keyed self-join per round. Label values are always
        # seed-vertex ids (mins over seed ids), so the lookup always
        # hits; LEFT + least() guards the invariant anyway (least
        # skips NULLs).
        hop = cand.join(
            cand.select(F.col("u").alias("comp"), F.col("comp").alias("__c2")),
            "comp",
            "left",
        ).select("u", F.least("comp", "__c2").alias("comp"))
        labels, m = cut_lineage_observed(hop, [_ck], checkpoint_dir)
        cur_sum = m["s"]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # labels-after-max_iter are min-within-reach, NOT components;
        # returning them silently corrupts every downstream dedup
        # decision. With doubling, 30 rounds cover diameter ~2^29, so
        # this fires only on a user-set tiny cap.
        raise ValueError(
            f"connected_components did not converge within max_iter="
            f"{max_iter} rounds; raise max_iter (doubling needs about "
            "log2(graph diameter) + 2 rounds)"
        )
    return labels.join(verts, "u", "left_semi").select(
        F.col("u").alias(id_col), F.col("comp").alias("component_id")
    )


def dedup_resolution(
    edges: DataFrame,
    vertices: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    id_col: str = "doc_id",
) -> DataFrame:
    """Components plus the dedup decision: component size and whether
    this row is the canonical keeper (the min id of its cluster)."""
    comps = connected_components(edges, vertices, src, dst, id_col)
    from pyspark.sql.window import Window as W

    w = W.partitionBy("component_id")
    return comps.select(
        id_col,
        "component_id",
        F.count("*").over(w).cast("bigint").alias("component_size"),
        (F.col(id_col) == F.col("component_id")).alias("is_keeper"),
    )


def incremental_components(
    state: DataFrame,
    delta_edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    id_col: str = "doc_id",
    max_iter: int = 30,
) -> DataFrame:
    """Merge NEW edges into an existing component labeling WITHOUT
    rescanning the base edge set — the partial-state-merge discipline
    (MV / quantile / top-k family) applied to graph connectivity, for
    the standing near-dup graph a streaming corpus maintains.

    Correctness by contraction: each labeled vertex contributes one
    (vertex → label) edge, and connectivity of (base ∪ delta) equals
    connectivity of (contraction ∪ delta) — every base component is
    already connected as a star through its label, and hash-min labels
    are vertex ids, so the merged minimum is the true component
    minimum. The propagation therefore runs on |state| + |delta| edges
    (nodes + new pairs) instead of |base edges| + |delta| — at corpus
    scale the base PAIR set is the expensive relation (quadratic-ish in
    bucket sizes) and never needs to exist again once labeled.

    ``state``: (id_col, component_id) from a prior
    ``connected_components`` run. ``delta_edges`` may mention brand-new
    vertices; they join the vertex universe automatically. Returns the
    updated (id_col, component_id) — exactly equal to a full recompute
    over (base ∪ delta) edges.
    """
    contract = state.select(
        F.col(id_col).alias("id_a"), F.col("component_id").alias("id_b")
    ).filter(F.col("id_a") != F.col("id_b"))
    edges = (
        delta_edges.select(F.col(src).alias("id_a"), F.col(dst).alias("id_b"))
        .unionByName(contract)
    )
    verts = (
        state.select(F.col(id_col))
        .unionByName(delta_edges.select(F.col(src).alias(id_col)))
        .unionByName(delta_edges.select(F.col(dst).alias(id_col)))
        .distinct()
    )
    return connected_components(
        edges, verts, "id_a", "id_b", id_col, max_iter=max_iter
    )


def scripted_connected_components(
    spark,
    edges_view: str,
    verts_view: str,
    table_prefix: str = "cc_script",
    max_iter: int = 30,
) -> DataFrame:
    """The hash-min fixpoint expressed as a PURE SQL SCRIPT (Spark 4
    SQL scripting: DECLARE / WHILE / IF): the driver-side Python loop
    of ``connected_components`` moves into the engine, with ping-pong
    parquet tables as the per-round materialization (INSERT OVERWRITE
    cannot read its own target, and a self-replacing temp view would
    resolve cyclically) and the label-hash SUM in DECIMAL(38,0) as the
    convergence signal (labels only decrease, so the label multiset is
    stable iff its xxhash64-sum is; a BIGINT sum of hashes would
    overflow under ANSI). Demonstrates that even iterative graph
    algorithms fit the declarative surface — the script ships to any
    Spark SQL endpoint (Connect, Thrift) with no client-side loop.

    ``edges_view`` (u, v) and ``verts_view`` (doc_id) must be
    registered views; vertex ids may be any orderable type — the
    convergence signal is ``sum(xxhash64(comp))`` in DECIMAL(38,0),
    the same type-agnostic checksum the Python loop uses, so string
    ids (docket numbers like '80-1538') work identically to numeric
    ones. NOTE: this demo keeps the plain ONE-HOP hash-min recurrence
    (O(diameter) rounds, bounded by ``max_iter``) — production callers
    use ``connected_components``, whose pointer-doubling loop is
    O(log diameter) and raises on a non-converged cap. Creates and drops managed tables ``{table_prefix}_a/_b``;
    cleanup and the prior ``scripting.enabled`` value are restored
    even if the script fails mid-run.
    """
    prior_scripting = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    a, b = f"{table_prefix}_a", f"{table_prefix}_b"
    script = f"""
    BEGIN
      DECLARE prev DECIMAL(38,0) DEFAULT -1;
      DECLARE cur DECIMAL(38,0) DEFAULT -2;
      DECLARE rounds INT DEFAULT 0;
      CREATE OR REPLACE TEMPORARY VIEW {table_prefix}_sym AS
        SELECT u, v FROM {edges_view} UNION SELECT v, u FROM {edges_view};
      DROP TABLE IF EXISTS {a};
      DROP TABLE IF EXISTS {b};
      CREATE TABLE {a} USING parquet AS
        SELECT doc_id AS u, doc_id AS comp FROM {verts_view};
      CREATE TABLE {b} USING parquet AS
        SELECT u, comp FROM {a} WHERE 1 = 0;
      WHILE prev <> cur AND rounds < {max_iter} DO
        SET prev = cur;
        IF rounds % 2 = 0 THEN
          INSERT OVERWRITE TABLE {b}
            SELECT u, min(comp) AS comp FROM (
              SELECT u, comp FROM {a}
              UNION ALL
              SELECT s.v AS u, l.comp
              FROM {table_prefix}_sym s JOIN {a} l ON s.u = l.u
            ) GROUP BY u;
          SET cur = (SELECT sum(CAST(xxhash64(comp) AS DECIMAL(38,0))) FROM {b});
        ELSE
          INSERT OVERWRITE TABLE {a}
            SELECT u, min(comp) AS comp FROM (
              SELECT u, comp FROM {b}
              UNION ALL
              SELECT s.v AS u, l.comp
              FROM {table_prefix}_sym s JOIN {b} l ON s.u = l.u
            ) GROUP BY u;
          SET cur = (SELECT sum(CAST(xxhash64(comp) AS DECIMAL(38,0))) FROM {a});
        END IF;
        SET rounds = rounds + 1;
      END WHILE;
      IF rounds % 2 = 1 THEN
        SELECT u AS doc_id, comp AS component_id FROM {b};
      ELSE
        SELECT u AS doc_id, comp AS component_id FROM {a};
      END IF;
    END
    """
    try:
        out = spark.sql(script).localCheckpoint(eager=True)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {a}")
        spark.sql(f"DROP TABLE IF EXISTS {b}")
        spark.catalog.dropTempView(f"{table_prefix}_sym")
        if prior_scripting is None:
            spark.conf.unset("spark.sql.scripting.enabled")
        else:
            spark.conf.set("spark.sql.scripting.enabled", prior_scripting)
    return out
