"""Corpus-assembly operators for training-data pipelines.

Beyond-reference (the reference stops at embeddings + clustering);
these are the standard last-mile steps between a cleaned document
table and a training run, each a pure DataFrame plan with
oracle-reproducible arithmetic (md5-derived buckets, never RNG — a
resharded or re-run corpus assigns every document identically, which
is what makes splits auditable):

- ``hash_bucket``     — stable per-row bucket in [0, n) from md5 of
  the id. The primitive under splits and sampling.
- ``assign_splits``   — train/val/test by bucket threshold. No
  sampling bias, no state, no join: a map-stage CASE.
- ``stratified_sample`` — per-stratum keep rates (e.g. downsample a
  dominant language) via per-mille bucket thresholds. Deterministic
  twin of ``df.sampleBy`` (whose seed-dependent survivors differ by
  partitioning).
- ``pack_by_budget``  — concat-and-chunk sequence packing: shard the
  corpus by hash, order each shard deterministically, running-sum the
  cost column and cut bins every ``budget`` units. The window runs
  per-shard, so parallelism is the shard count and no global sort
  exists anywhere — the 100 TB-safe formulation of "pack documents
  into ~N-token sequences".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def hash_bucket(id_col: Column | str, n: int, hex_off: int = 1) -> Column:
    """Deterministic bucket in [0, n): 32 md5 bits (8 hex digits
    starting at ``hex_off``) of the id's string form, mod n.

    ``hex_off`` selects independent hash bits — use different offsets
    for independent bucketings (split vs shard), so e.g. the test
    split is not correlated with the pack shard. Offsets are 1-based
    and need a full 8-hex window: anything past 25 would silently
    truncate to fewer bits (and overlap the 25..32 window) — rejected.
    """
    if not 1 <= hex_off <= 25:
        raise ValueError(f"hex_off must be in [1, 25], got {hex_off}")
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(F.substring(F.md5(c.cast("string")), hex_off, 8), 16, 10).cast("long")
    return h % F.lit(n)


def assign_splits(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Add a ``split`` column: 'train'/'val'/'test' by hash-bucket
    percentile. Percentages are integers out of 100."""
    b = hash_bucket(id_col, 100)
    return df.withColumn(
        "split",
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates_permille: dict[str, int],
    id_col: str = "doc_id",
    default_permille: int = 1000,
) -> DataFrame:
    """Keep each row iff its per-mille bucket < its stratum's rate.

    E.g. ``{"en": 300}`` keeps a deterministic 30% of English rows and
    100% of everything else — corpus rebalancing that re-runs
    identically (unlike seeded RNG sampling, whose survivors shift
    with partitioning).
    """
    b = hash_bucket(id_col, 1000, hex_off=17)
    rate = F.lit(default_permille)
    for stratum, permille in sorted(rates_permille.items()):
        rate = F.when(F.col(stratum_col) == stratum, permille).otherwise(rate)
    return df.filter(b < rate)


def pack_by_budget(
    df: DataFrame,
    cost_col: str,
    budget: int,
    id_col: str = "doc_id",
    n_shards: int = 16,
) -> DataFrame:
    """Concat-and-chunk packing: assign every row a (shard, seq_id) so
    consecutive rows of a shard fill each sequence up to ~``budget``
    cost units (a row starts a new sequence when the running total
    before it crosses a budget boundary).

    The running sum is windowed per shard — shards are hash-uniform,
    so the heaviest partition carries ~1/n_shards of the corpus and
    scale-out is a parameter, not a rewrite. Output adds ``shard``,
    ``seq_id``, ``offset_in_seq`` (running cost before this row within
    its sequence).
    """
    shard = hash_bucket(id_col, n_shards, hex_off=9)
    w = W.partitionBy("shard").orderBy(id_col).rowsBetween(W.unboundedPreceding, -1)
    with_cum = df.withColumn("shard", shard).withColumn(
        "__before", F.coalesce(F.sum(cost_col).over(w), F.lit(0)).cast("long")
    )
    return (
        with_cum.withColumn(
            "seq_id", F.floor(F.col("__before") / F.lit(budget)).cast("long")
        )
        .withColumn(
            "offset_in_seq", (F.col("__before") % F.lit(budget)).cast("long")
        )
        .drop("__before")
    )


def stable_global_index(
    df: DataFrame,
    order_cols: list[str],
    name: str = "global_idx",
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Globally-ordered 0-based row index WITHOUT the single-partition
    trap: ``row_number().over(Window.orderBy(...))`` with no
    partitionBy collapses the whole dataset onto ONE task — the
    classic unscalable plan. This computes the identical index as
    range-partition + in-partition row_number + per-partition offset:

    1. ``repartitionByRange(order_cols)`` — sampled boundaries give
       balanced, globally-ordered partitions (one shuffle);
    2. within-partition position WITHOUT a window:
       ``monotonically_increasing_id()`` encodes (partition id << 33)
       + row index in task order, so pid/row-index are two bit-ops on
       the sorted stage itself — a window keyed on the partition id
       would make Catalyst re-Exchange the whole dataset on that key
       (a second full-data shuffle for data already placed);
    3. partition row-counts (one tiny agg: #partitions rows) become
       cumulative offsets, broadcast back.

    ``order_cols`` must end in a tiebreaker that is unique per row —
    with ties at a range boundary the per-partition numbering would
    otherwise disagree with the global ordering (and the index itself
    would be nondeterministic under any formulation).

    The 100 TB use: deterministic corpus sequencing (shard manifests,
    resumable training order) where sort order matters — where it
    doesn't, ``hash_bucket``/``pack_by_budget`` stay shuffle-lighter.
    """
    from .lineage import cut_lineage

    part = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    ).sortWithinPartitions(*order_cols)
    mid = F.monotonically_increasing_id()
    # MATERIALIZED before fan-out: the (pid, rn) columns are placement
    # facts, and this relation feeds TWO consumers (the counts agg and
    # the offset join). Without a materialization each consumer
    # re-executes the range shuffle and AQE may coalesce the two
    # executions DIFFERENTLY — disjoint __pid spaces, and the inner
    # join silently drops every row whose pid has no offset (observed
    # at sf0.1: 150k rows → 66k). The cut pins one placement that both
    # consumers read; pass checkpoint_dir for a fault-tolerant cut on
    # a real cluster.
    with_pos = cut_lineage(
        part.select(
            "*",
            F.shiftright(mid, 33).alias("__pid"),
            mid.bitwiseAND(F.lit((1 << 33) - 1)).alias("__rn"),
        ),
        True,
        checkpoint_dir,
    )
    counts = (
        with_pos.groupBy("__pid")
        .agg(F.count("*").alias("__n"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__n").over(
                    W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .select("__pid", "__offset")
    )
    return (
        with_pos.join(F.broadcast(counts), "__pid")
        .withColumn(name, F.col("__rn") + F.col("__offset"))
        .drop("__pid", "__rn", "__offset")
    )


def dataset_mix(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    id_col: str = "doc_id",
    hex_off: int = 25,
) -> DataFrame:
    """Proportional corpus mixing: sample each listed source so the
    output matches the target weight distribution at the largest
    achievable size.

    N = min_s(count_s / w_s) is the biggest mix every source can
    supply; each source keeps floor(1000 · w_s · N / count_s) per
    mille of its rows (the binding source keeps everything) via the
    deterministic md5 bucket — identical survivors at any parallelism,
    re-runnable across epochs. This is the data-mixture step of
    training-corpus assembly (fixed sampling weights per source à la
    Pile/LLaMA mixes), built from two tiny aggregations: per-source
    counts (one row per source) and the global cap (one row), both
    broadcast back onto the scan — the corpus itself never shuffles.
    Sources absent from ``weights`` are dropped.
    """
    srcs = sorted(weights)
    w_expr = F.lit(None).cast("double")
    for s in srcs:
        w_expr = F.when(F.col(source_col) == s, F.lit(weights[s])).otherwise(w_expr)
    pool = df.filter(F.col(source_col).isin(srcs))
    counts = pool.groupBy(source_col).agg(F.count("*").alias("__cnt"))
    cap = counts.select(
        F.min(F.col("__cnt") / w_expr).alias("__cap")
    )
    rates = (
        counts.crossJoin(F.broadcast(cap))
        .select(
            source_col,
            F.least(
                F.lit(1000),
                F.floor(F.lit(1000.0) * w_expr * F.col("__cap") / F.col("__cnt")),
            )
            .cast("int")
            .alias("__rate"),
        )
    )
    b = hash_bucket(id_col, 1000, hex_off=hex_off)
    return (
        pool.join(F.broadcast(rates), source_col)
        .filter(b < F.col("__rate"))
        .drop("__rate")
    )


def pps_systematic(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    n_select: int,
    bucket_width: int = 65536,
) -> DataFrame:
    """Deterministic systematic probability-proportional-to-size
    sampling: lay every row's INTEGER weight end-to-end along a line
    in ``order_col`` order, then take ``n_select`` equally-spaced
    points (stride ``S = total div n``, first point at ``S div 2``) —
    a row is drawn once per point inside its weight span, so
    selection probability is proportional to weight with zero RNG
    (re-runnable across epochs, the corpus-sampling discipline of
    ``dataset_splits``). Weights MUST be integral (scale currency to
    cents, tokens stay tokens): the running positions are exact
    BIGINT sums, so the same rows are drawn on any engine and any
    partitioning — no float cumsum to drift.

    The exclusive running weight is the bucketed prefix sum (in-bucket
    window per ``order_col div bucket_width`` + carry-in from the
    bucket-grain totals — the same single-partition-free pattern as
    ``operators/sweep.py`` and ``stable_global_index``); the stride
    arithmetic is row-local. Returns the selected rows with
    ``n_hits`` (> 1 when one heavy row swallows several points).

    Contract: ``order_col`` must be UNIQUE and non-NULL (ties would
    make the cumulative position order-dependent and the draw
    engine-specific); weights must be non-negative integers —
    zero-weight rows occupy no span and are never drawn.
    """
    from .prefix import bucketed_running_sum

    w = F.col("__w")
    base = df.withColumn("__w", F.col(weight_col).cast("long"))
    running = bucketed_running_sum(
        base,
        order_col=order_col,
        value_col="__w",
        bucket_width=bucket_width,
        out_col="__c",
    )
    total = base.agg(F.sum("__w").alias("__total"))
    pos = (
        running.crossJoin(F.broadcast(total))
        # integer stride and midpoint first point — every step is BIGINT
        # `div` (no double division anywhere: positions can exceed 2^53
        # at corpus scale). Points sit at off + j*stride, j = 0..n-1;
        # stride floors to >= 1 so total < n degrades gracefully.
        .withColumn(
            "__stride",
            F.greatest(F.lit(1).cast("long"), F.expr(f"__total div {n_select}")),
        )
        .withColumn("__off", F.expr("__stride div 2"))
    )

    # count of points j with off + j*stride < x  ==  ceil((x-off)/stride)
    # clamped to [0, n] — ((max(0, x-off) + stride - 1) div stride), all
    # BIGINT `div`
    def points_below(x_col: str) -> str:
        return (
            f"least(CAST({n_select} AS BIGINT), "
            f"(greatest(0L, {x_col} - __off) + __stride - 1L) div __stride)"
        )

    out = (
        pos.withColumn("__hi", F.col("__c") + w)
        .withColumn(
            "n_hits",
            F.expr(f"{points_below('__hi')} - {points_below('__c')}"),
        )
        .filter(F.col("n_hits") > 0)
    )
    return out.drop("__w", "__c", "__hi", "__total", "__stride", "__off")


def source_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact pairwise Jaccard overlap between corpus SOURCES over their
    distinct word-shingle sets — the dataset-level twin of document
    near-dup detection. The question it answers ("how much of source B
    is already in source A?") gates dataset mixing and cross-dataset
    decontamination: two highly-overlapping sources should not both
    enter ``dataset_mix`` at full weight.

    Plan shape for 100 TB: one pass shingles every document in-row
    (array_distinct before the explode — per-doc dedup costs no
    shuffle), one distinct keyed on (source, shingle), one groupBy
    shingle whose posting lists are bounded by the SOURCE count (a few
    dozen, never corpus-sized), in-row pair expansion, and a final
    groupBy over source pairs (quadratic only in #sources). The corpus
    text itself shuffles once, as (source, shingle) postings.

    Returns (source_a, source_b, n_inter, n_a, n_b, jaccard) for every
    source pair sharing at least one shingle, source_a < source_b.
    """
    from ..functions.text import word_shingles
    from ..session import repartition_for_compute

    sh = (
        repartition_for_compute(df)
        .select(
            F.col(group_col).alias("grp"),
            F.explode(F.array_distinct(word_shingles(text_col, n))).alias("shingle"),
        )
        .filter(F.col("shingle").isNotNull())
    )
    # posting list per shingle = the sources containing it (≤ #sources
    # entries); collect_set dedupes (source, shingle) repeats in the
    # partial agg — no separate distinct() exchange needed, so the
    # text-sized relation crosses the wire exactly ONCE; array_sort
    # fixes the a < b orientation by construction
    gs = F.array_sort(F.collect_set("grp"))
    post = sh.groupBy("shingle").agg(gs.alias("gs"))
    # The postings aggregate feeds the pair intersections AND the
    # per-source sizes. Expressed as separate consumers (inter +
    # two size joins) the corpus was scanned and shingled THREE times
    # — ReusedExchange does not fire across broadcast-side subqueries
    # (round-8 EXPLAINS finding: three byte-identical
    # FileScan→explode→agg subtrees). Instead, post is consumed
    # exactly ONCE: the in-row expansion emits the self-pair (x, x)
    # alongside every ordered pair (x, y), x < y — slice from i+1
    # instead of i+2 — so after the pair aggregate the (a, a) rows
    # ARE the per-source distinct-shingle counts. n_a/n_b then come
    # from two window maxes over that ≤ |sources|² relation (tiny
    # exchanges), not from joins that would re-derive the postings.
    # One corpus scan, one postings shuffle — fully linear plan.
    pairs_expr = F.flatten(
        F.transform(
            F.col("gs"),
            lambda x, i: F.transform(
                F.slice(F.col("gs"), i + 1, F.size(F.col("gs"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    counts = (
        post.select(F.explode(pairs_expr).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.count("*").alias("n"))
    )
    self_n = F.max(F.when(F.col("a") == F.col("b"), F.col("n")))
    return (
        counts.withColumn("n_a", self_n.over(W.partitionBy("a")))
        .withColumn("n_b", self_n.over(W.partitionBy("b")))
        .filter(F.col("a") < F.col("b"))
        .select(
            F.col("a").alias("source_a"),
            F.col("b").alias("source_b"),
            F.col("n").alias("n_inter"),
            "n_a",
            "n_b",
            F.round(
                F.col("n")
                / (F.col("n_a") + F.col("n_b") - F.col("n")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def source_overlap_sketch(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 128,
    kernel: str = "pandas",
) -> DataFrame:
    """MinHash estimate of pairwise source Jaccard in ONE bounded pass
    — the at-scale arm of ``source_overlap`` (VERDICT r6 #3: the exact
    postings relation grows with the corpus; this one never does).

    min over a UNION of sets is the min of per-set minima, so the
    per-source signature is the element-wise MIN of the per-document
    in-row signatures (``dedup.minhash_signature_*`` kernels — one md5
    per distinct shingle, k universal hashes, pure map). The only
    shuffle carries ``num_hashes`` (grp, pos, v) rows per document,
    partial-aggregated map-side to #sources × num_hashes per
    partition — corpus text NEVER crosses the wire, vs the exact
    path's full (source, shingle) postings relation. Pair estimation
    is then a self-join over the #sources-row signature relation.

    ``num_hashes`` a power of two keeps ``n_match / num_hashes`` exact
    in binary — the estimate is engine-reproducible without rounding.
    Returns (source_a, source_b, n_match, jaccard_est), source_a <
    source_b; sources with no non-blank document drop out (their
    signature is all-null), matching the exact path which emits no
    postings for them.
    """
    from ..session import repartition_for_compute
    from .dedup import _minhash_sig

    sig_long = (
        repartition_for_compute(df)
        .select(
            F.col(group_col).alias("grp"),
            F.posexplode(_minhash_sig(text_col, n, num_hashes, kernel)).alias(
                "pos", "v"
            ),
        )
        .groupBy("grp", "pos")
        .agg(F.min("v").alias("v"))
        .filter(F.col("v").isNotNull())
    )
    a = sig_long.select(
        F.col("grp").alias("source_a"), "pos", F.col("v").alias("va")
    )
    b = sig_long.select(
        F.col("grp").alias("source_b"), "pos", F.col("v").alias("vb")
    )
    return (
        a.join(b, "pos")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(
                F.when(F.col("va") == F.col("vb"), 1).otherwise(0)
            ).alias("n_match")
        )
        .select(
            "source_a",
            "source_b",
            F.col("n_match").cast("bigint").alias("n_match"),
            (F.col("n_match") / F.lit(float(num_hashes))).alias("jaccard_est"),
        )
    )


#: Measured crossover (round-8, x10 tier ≈5 MB compressed corpus): the
#: exact arm's (source, shingle) postings shuffle is already 4.5× the
#: single-node oracle engine there, while the sketch arm — whose only
#: shuffle is 128 signature rows per doc — holds 1.0×. Exact is kept
#: below this plan-size estimate (where it is sub-second and serves as
#: the value oracle); everything larger takes the sketch, the plan
#: you'd launch at 100 TB.
OVERLAP_EXACT_THRESHOLD_BYTES = 1 << 21  # 2 MiB compressed corpus text


def choose_overlap_strategy(
    corpus_bytes: int,
    exact_threshold: int = OVERLAP_EXACT_THRESHOLD_BYTES,
) -> str:
    """Pick the source-overlap plan from a measured input size (the
    ``choose_semi_strategy`` discipline — operators/bloom.py): 'exact'
    while the (source, shingle) postings relation the exact path
    shuffles is affordable, 'sketch' above, where only per-source
    minhash signatures move."""
    return "exact" if corpus_bytes <= exact_threshold else "sketch"


def source_overlap_auto(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 128,
    exact_threshold: int = OVERLAP_EXACT_THRESHOLD_BYTES,
) -> DataFrame:
    """Size-dispatched source overlap: exact postings Jaccard below
    ``exact_threshold`` (Catalyst plan-size estimate of the corpus
    input — read from footer stats, never executed), minhash estimate
    above. Common output (source_a, source_b, jaccard): downstream
    mixing gates consume either arm unchanged."""
    from .bloom import plan_size_bytes

    strategy = choose_overlap_strategy(plan_size_bytes(df), exact_threshold)
    if strategy == "exact":
        return source_overlap(df, group_col, text_col, n).select(
            "source_a", "source_b", "jaccard"
        )
    # n_match > 0 mirrors the exact arm's contract (only pairs with
    # detectable overlap appear). Catalyst's size estimate is
    # conservative for non-file relations (unknown → huge), which errs
    # toward the sketch — the safe direction at scale.
    return (
        source_overlap_sketch(df, group_col, text_col, n, num_hashes)
        .filter(F.col("n_match") > 0)
        .select("source_a", "source_b", F.col("jaccard_est").alias("jaccard"))
    )


def stride_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 64,
    stride: int = 32,
) -> DataFrame:
    """Overlapping fixed-size token-window chunking (size tokens per
    chunk, stride tokens between chunk starts) — the standard
    RAG-indexing / context-window-packing chunker, where the overlap
    (size − stride) preserves cross-boundary context that hard
    splitting loses.

    Chunk i covers tokens [i·stride, i·stride + size); the chunk count
    is 1 for docs that fit in one window, else
    ceil((n − size)/stride) + 1 CAPPED at floor((n − 1)/stride) + 1 —
    the last chunk may be short but always starts within the text
    (the cap matters only when stride > size, where the uncapped
    count emitted phantom zero-token chunks starting past the end).
    Zero-token docs emit nothing.

    Entirely in-row (sequence → transform → posexplode-style explode):
    a pure map stage, no shuffle at any scale — chunking 100 TB costs
    exactly one read and one write.
    """
    from ..functions.text import tokens
    from ..session import repartition_for_compute

    toks = tokens(F.col(text_col))
    n = F.size(toks)
    in_text = (F.floor((n - 1) / F.lit(float(stride)))).cast("int") + 1
    n_chunks = (
        F.when(n <= 0, F.lit(0))
        .when(n <= size, F.lit(1))
        .otherwise(
            F.least(
                (F.ceil((n - size) / F.lit(float(stride)))).cast("int") + 1,
                in_text,
            )
        )
    )
    chunk_struct = F.transform(
        F.sequence(F.lit(0), F.col("__nc") - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.slice(F.col("__toks"), i * stride + 1, size).alias("ctoks"),
        ),
    )
    return (
        repartition_for_compute(df)
        .select(F.col(id_col), toks.alias("__toks"), n_chunks.alias("__nc"))
        .filter(F.col("__nc") > 0)
        .select(F.col(id_col), F.explode(chunk_struct).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.size("c.ctoks").alias("n_chunk_tokens"),
            F.array_join("c.ctoks", " ").alias("chunk_text"),
        )
    )


def temperature_mix(
    df: DataFrame,
    source_col: str,
    alpha: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-weighted source mixing: sampling rates derived from
    the source sizes themselves, p_s ∝ count_s^(α−1), normalized so the
    SMALLEST source keeps 100% — the multilingual/multi-source rebalance
    (α < 1 upweights small sources toward uniform; α = 1 is natural
    proportions; expected output sizes ∝ count_s^α). The self-tuning
    sibling of ``dataset_mix``, which takes externally-fixed weights.

    rate_s = floor(1000 · (count_min / count_s)^(1−α)) per mille via
    the deterministic md5 bucket. At α = 0.5 the exponent is a square
    root — IEEE sqrt (and double division) are exactly rounded, so the
    per-mille rates are BIT-IDENTICAL on any engine and the survivor
    set is engine-deterministic (a generic pow() is only
    faithfully rounded — last-ulp differences could flip a floor()).

    Same physical shape as dataset_mix: per-source counts (one tiny
    relation) and the min (one row) broadcast onto the scan; the
    corpus never shuffles.
    """
    counts = df.groupBy(source_col).agg(F.count("*").alias("__cnt"))
    mn = counts.agg(F.min("__cnt").alias("__mn"))
    ratio = F.col("__mn") / F.col("__cnt")
    factor = F.sqrt(ratio) if alpha == 0.5 else F.pow(ratio, 1.0 - alpha)
    rates = (
        counts.crossJoin(F.broadcast(mn))
        .select(
            source_col,
            F.least(F.lit(1000).cast("bigint"), F.floor(F.lit(1000.0) * factor))
            .cast("int")
            .alias("__rate"),
        )
    )
    # Independence from the OTHER samplers via domain separation
    # (salted hash input), not a hex window: the md5 hex has only four
    # disjoint 8-char windows and all four are allocated (splits 1,
    # shard/cap 9, stratified 17, dataset_mix 25) — the former
    # hex_off=27 default silently truncated to 24 bits INSIDE
    # dataset_mix's window, correlating the two samplers.
    salted = F.concat(F.lit("tmix:"), F.col(id_col).cast("string"))
    b = hash_bucket(salted, 1000)
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(b < F.col("__rate"))
        .drop("__rate")
    )


def per_source_cap(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    cap: int = 10,
    hex_off: int = 9,
    n_buckets: int = 1000,
) -> DataFrame:
    """Keep at most ``cap`` documents per source, deterministically —
    the per-domain cap of crawl pipelines (bound any one domain's
    share of the training mix). Selection order is (md5 bucket,
    id): a stable pseudo-random sample, identical at any parallelism
    and on any engine.

    Scale shape (the global_row_index two-phase trick, applied per
    source): a naive row_number window PARTITION BY source puts an
    entire source on one reducer — a 10M-doc domain serializes. Here:

    1. per-(source, bucket) counts — a tiny relation, at most
       |sources| × n_buckets rows, map-side combined;
    2. running offsets per source over that COUNTS relation (window
       over ≤ n_buckets rows per source, never over documents);
    3. broadcast back: buckets whose offset+count ≤ cap pass whole
       (an in-row filter on the scan); only the single BOUNDARY
       bucket per source pays a row_number — ~1/n_buckets of the
       source, not the source.

    Row-identical to the naive window (the oracle) by construction:
    both implement rank-by-(bucket, id) ≤ cap under a strict total
    order.
    """

    b = hash_bucket(id_col, n_buckets, hex_off=hex_off)
    with_b = df.withColumn("__b", b)
    counts = with_b.groupBy(source_col, "__b").agg(F.count("*").alias("__cnt"))
    w = W.partitionBy(source_col).orderBy("__b")
    offs = counts.withColumn(
        "__before",
        F.coalesce(
            F.sum("__cnt").over(w.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    joined = with_b.join(F.broadcast(offs), [source_col, "__b"])
    whole = joined.filter(F.col("__before") + F.col("__cnt") <= cap)
    boundary = (
        joined.filter(
            (F.col("__before") < cap) & (F.col("__before") + F.col("__cnt") > cap)
        )
        .withColumn(
            "__rn",
            F.row_number().over(
                W.partitionBy(source_col, "__b").orderBy(id_col)
            ),
        )
        .filter(F.col("__rn") <= cap - F.col("__before"))
        .drop("__rn")
    )
    return whole.unionByName(boundary).drop("__b", "__cnt", "__before")


def weighted_reservoir_sample(
    df: DataFrame,
    group_cols: list[str],
    weight_col: str,
    id_col: str = "doc_id",
    k: int = 5,
    n_shards: int = 64,
    hex_off: int = 13,
) -> DataFrame:
    """Weighted sampling without replacement, k per group — the
    Efraimidis–Spirakis (2006) reservoir scheme, determinized: each
    row draws u from its own md5 bits and ranks by ln(u)/w (the
    monotone twin of u^(1/w)); the k largest keys per group are the
    sample, with inclusion probability proportional to weight. No
    RNG state, identical survivors at any parallelism and on any
    engine (keys rounded to 9dp before ranking so libm last-ulp
    differences cannot flip an order; ties break on id).

    Scale shape — distributed TOP-K SELECTION, not a group-wide sort:
    a PARTITION BY group window buffers an entire group on one
    reducer. Instead the rows shard by independent md5 bits and each
    (group, shard) aggregates its own k best into a bounded array
    (array_sort over collect_list, capped by slice — the agg buffer
    holds one shard's rows, 1/n_shards of the group); the second
    aggregation merges n_shards×k candidates per group. Exact by the
    selection property: the global top-k is contained in the union of
    shard top-ks. Returns (group_cols..., id, key rank 1..k).
    """
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), hex_off, 8), 16, 10
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    key = F.round(F.log(u) / F.col(weight_col), 9)
    shard = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), hex_off + 8, 8), 16, 10
        ).cast("long")
        % n_shards
    )
    scored = df.filter(F.col(weight_col) > 0).select(
        *group_cols,
        F.col(id_col),
        key.alias("__key"),
        shard.alias("__shard"),
    )
    # sort ascending on (-key, id) == key desc, id asc
    item = F.struct((-F.col("__key")).alias("nk"), F.col(id_col).alias("i"))
    stage1 = scored.groupBy(*group_cols, "__shard").agg(
        F.slice(F.array_sort(F.collect_list(item)), 1, k).alias("__top")
    )
    merged = (
        stage1.select(*group_cols, F.explode("__top").alias("c"))
        .groupBy(*group_cols)
        .agg(F.slice(F.array_sort(F.collect_list("c")), 1, k).alias("__top"))
    )
    return merged.select(
        *group_cols, F.posexplode("__top").alias("__pos", "c")
    ).select(
        *group_cols,
        F.col("c.i").alias(id_col),
        (-F.col("c.nk")).alias("sample_key"),
        (F.col("__pos") + 1).cast("bigint").alias("rnk"),
    )


def dsir_log_weights(
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    alpha: float = 1.0,
    kernel: str = "arrow",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    in the raw pool by how much its hashed-n-gram profile looks like
    the TARGET subset (rows where ``target_pred`` holds), as the
    log-likelihood ratio of two bag-of-buckets multinomials.

    Features are unigrams + adjacent bigrams of the lowercased
    whitespace tokens, hashed into ``n_buckets`` md5 buckets (the same
    hashing trick as the quality classifier). Bucket probabilities are
    Laplace-smoothed (``alpha``); llr[b] = ln(p_target[b]) -
    ln(p_raw[b]) is rounded to 12dp so any engine reproduces identical
    per-bucket weights, then each document's log-weight is the
    sequential feature-order sum of llr over its own features.

    Plan shape at 100 TB — two corpus passes, nothing per-doc ever
    shuffles:
      1. count pass: per-partition bucket-count partials (≤ n_buckets
         rows per Arrow batch), ONE hash aggregate keyed by bucket;
      2. the n_buckets llr rows are collected (a bounded driver read,
         same class as the k-means centroid probes) and scoring is a
         pure map over the documents scan — zero per-doc exchanges.

    ``kernel`` picks the scoring implementation, minhash-style:
      - ``"arrow"`` (default): hashlib-md5 pandas kernels with a
        per-batch feature→bucket cache (corpus features repeat).
        Measured ~10x the expression arm: the expression form's HOFs
        are CodegenFallback, so 100+ interpreted expression-tree walks
        per document.
      - ``"expr"``: pure Catalyst higher-order functions — the arm
        whose algebra the SQL oracle replays term-for-term; equality
        with the arrow arm is pinned by test. The tokens() expression
        is let-bound (operators/dedup.py::_let) so ProjectCollapse
        cannot inline the regexp split into every element_at site.
    Both arms share the same md5 buckets (hashlib md5 of UTF-8 ==
    Spark md5; ASCII-flagged Python regexes == Java \\s semantics, the
    minhash_signature_pandas recipe), and BOTH leave the Gumbel key
    and all rounding to Spark expressions, so arm choice never changes
    a bit of output: log-weights sum the same 12dp llr values in the
    same feature order (IEEE adds from 0.0 — order-identical is
    bit-identical), and the resample key is built from the
    ALREADY-6dp-ROUNDED weight (raw sums differ across ENGINES at
    ~1e-13 from summation order, which at a 9dp boundary would flip
    bits; after the 6dp round only ln()'s last ulp remains, far
    inside the 9dp grid). Gumbel-top-k (u from the row's own md5
    bits, key = log_weight + Gumbel(u)) samples ∝ weight without
    replacement, no RNG state; ties break on id downstream.

    Returns (id_col, n_feats, log_weight, resample_key) for EVERY raw
    doc (empty-token docs score 0.0 — they carry no evidence).
    """
    from ..session import repartition_for_compute

    # feature expansion + per-feature md5 is the compute-heavy per-row
    # stage: widen a single-split scan first or both passes serialize
    # onto one core (no-op on real multi-split inputs)
    docs = repartition_for_compute(docs)
    flagged = docs.select(
        F.col(id_col),
        # NULL predicate (e.g. isin over a NULL source) must mean "not
        # target" in BOTH arms: count_if skips NULLs, but a NULL
        # reaching the Arrow kernel becomes pandas NaN, which is truthy
        F.coalesce(target_pred, F.lit(False)).alias("__is_target"),
        F.col(text_col),
    )

    if kernel == "arrow":
        cnt, scored = _dsir_arrow(flagged, id_col, text_col, n_buckets)
    elif kernel == "expr":
        cnt, scored = _dsir_expr(flagged, id_col, text_col, n_buckets)
    else:
        raise ValueError(f"unknown dsir kernel {kernel!r}")

    llr = _dsir_llr(cnt.collect(), n_buckets, alpha)
    # scored() yields raw (id, n_feats, __logw); Gumbel + rounding stay
    # Spark-side so arm choice never changes output bits
    return _dsir_finalize(scored(llr), id_col)


def _dsir_llr(rows, n_buckets: int, alpha: float) -> list[float]:
    """Laplace-smoothed per-bucket log-likelihood ratios from
    (__b, cr, ct) count rows, 12dp-rounded (engine-portable).

    Buckets ABSENT from ``rows`` get the smoothing formula's own
    zero-count value, ln((tot_r + αB) / (tot_t + αB)) — not 0.0. The
    one-shot pass never reads those entries (every scored feature was
    counted), but ``dsir_score_from_counts`` serves NEW docs off
    persisted state, and their out-of-state vocabulary must score as
    "never seen" under the same smoothing, not as neutral. Rejects
    counts whose bucket ids exceed ``n_buckets`` — state built with a
    different bucket count would otherwise serve silently wrong
    weights (the reverse mismatch, a larger serving n_buckets, is
    undetectable from state alone: keep B consistent per state path).
    """
    import math

    bad = [r["__b"] for r in rows if not 0 <= r["__b"] < n_buckets]
    if bad:
        raise ValueError(
            f"bucket ids {sorted(bad)[:5]} outside [0, {n_buckets}) — "
            "counts were built with a different n_buckets"
        )
    tot_r = sum(r["cr"] for r in rows)
    tot_t = sum(r["ct"] for r in rows)
    unseen = round(
        math.log((tot_r + alpha * n_buckets) / (tot_t + alpha * n_buckets)),
        12,
    )
    llr = [unseen] * n_buckets
    for r in rows:
        llr[r["__b"]] = round(
            math.log((r["ct"] + alpha) / (tot_t + alpha * n_buckets))
            - math.log((r["cr"] + alpha) / (tot_r + alpha * n_buckets)),
            12,
        )
    return llr


def _dsir_finalize(per_doc: DataFrame, id_col: str) -> DataFrame:
    """Attach the Gumbel resample key and the rounding ladder (6dp
    weight → 9dp key; see dsir_log_weights) to raw scored docs."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("dsir|"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = ((h % 1000003) + 1).cast("double") / F.lit(1000004.0)
    gumbel = -F.log(-F.log(u))
    lw = F.round(F.col("__logw"), 6)
    return per_doc.select(
        id_col,
        F.col("n_feats").cast("bigint").alias("n_feats"),
        lw.alias("log_weight"),
        F.round(lw + gumbel, 9).alias("resample_key"),
    )


def dsir_bucket_counts(
    docs: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """DSIR's sufficient statistic alone: (__b, cr, ct) hashed-n-gram
    bucket counts for the raw pool and the target subset. Counts are
    exact and associative — batch-splittable sums — which is what
    makes the statistic STREAMABLE (streaming/incremental.py::
    run_dsir_state_update maintains it per micro-batch) and mergeable
    across corpus shards."""
    from ..session import repartition_for_compute

    flagged = repartition_for_compute(docs).select(
        F.coalesce(target_pred, F.lit(False)).alias("__is_target"),
        F.col(text_col),
    )
    cnt, _ = _dsir_arrow(flagged, None, text_col, n_buckets)
    return cnt


def dsir_score_from_counts(
    docs: DataFrame,
    counts: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    alpha: float = 1.0,
) -> DataFrame:
    """Score documents against PRECOMPUTED bucket counts (e.g. the
    state a streaming ``run_dsir_state_update`` sink maintains) — the
    serving half of DSIR. Output is bit-identical to
    ``dsir_log_weights`` when ``counts`` equals that pass's own counts
    (same llr table, same kernel, same Spark-side rounding)."""
    from ..session import repartition_for_compute

    llr = _dsir_llr(counts.collect(), n_buckets, alpha)
    flagged = repartition_for_compute(docs).select(
        F.col(id_col), F.lit(False).alias("__is_target"), F.col(text_col)
    )
    _, scored = _dsir_arrow(flagged, id_col, text_col, n_buckets)
    return _dsir_finalize(scored(llr), id_col)


def _dsir_feats_py(text: str | None) -> list[str]:
    """Python twin of the expression arm's feature builder: whitespace
    tokens of the lowercased text (ASCII regex classes — Java ``\\s``
    semantics, the minhash kernel recipe) plus adjacent bigrams.

    Locale assumption (round-8 review): Python ``str.lower()`` is
    locale-independent, but Spark's ``lower()`` delegates non-ASCII
    code points to JDK ``String.toLowerCase()`` under the JVM DEFAULT
    locale — a tr/az default locale maps 'I' → 'ı' (dotless) while
    Python yields 'i', silently breaking the arms' bit-equality. Run
    the JVM under a ROOT/en locale (``-Duser.language=en`` or
    ``user.country``/``LANG`` at cluster level); the arm-parity
    property test includes 'İ' and 'I' so a locale-sensitive
    environment fails loudly there rather than corrupting weights."""
    import re as _re

    if text is None:
        return []
    stripped = _re.sub(r"^\s+|\s+$", "", text.lower(), flags=_re.ASCII)
    if not stripped:
        return []
    toks = _re.split(r"\s+", stripped, flags=_re.ASCII)
    return toks + [
        toks[i] + "_" + toks[i + 1] for i in range(len(toks) - 1)
    ]


def _dsir_arrow(flagged: DataFrame, id_col, text_col, n_buckets):
    """Arrow-kernel arm: per-batch bucket-count partials (pass 1) and
    a per-doc llr-sum scorer factory (pass 2)."""
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    def _bucket_fn():
        import hashlib

        cache: dict[str, int] = {}

        def b(s: str) -> int:
            v = cache.get(s)
            if v is None:
                v = (
                    int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)
                    % n_buckets
                )
                cache[s] = v
            return v

        return b

    def _partials(batches):
        for pdf in batches:
            # cache is PER ARROW BATCH, not per partition: bigrams are
            # near-unique, so a partition-lifetime dict would grow with
            # text volume (GBs at scale) for little extra hit rate
            bucket = _bucket_fn()
            cr = [0] * n_buckets
            ct = [0] * n_buckets
            for text, is_t in zip(pdf[text_col], pdf["__is_target"]):
                for f in _dsir_feats_py(text):
                    bk = bucket(f)
                    cr[bk] += 1
                    if is_t:
                        ct[bk] += 1
            nz = [i for i in range(n_buckets) if cr[i]]
            yield pd.DataFrame(
                {"__b": nz, "cr": [cr[i] for i in nz], "ct": [ct[i] for i in nz]}
            )

    cnt = (
        flagged.mapInPandas(
            _partials, "__b long, cr long, ct long"
        )
        .groupBy("__b")
        .agg(F.sum("cr").alias("cr"), F.sum("ct").alias("ct"))
    )

    if id_col is None:  # counts-only caller (dsir_bucket_counts)
        return cnt, None
    id_field = flagged.schema[id_col]

    def scored(llr: list[float]) -> DataFrame:
        out_schema = StructType(
            [
                StructField(id_col, id_field.dataType, id_field.nullable),
                StructField("n_feats", LongType(), False),
                StructField("__logw", DoubleType(), False),
            ]
        )

        def _score(batches):
            for pdf in batches:
                bucket = _bucket_fn()  # per-batch: see _partials
                n_out, w_out = [], []
                for text in pdf[text_col]:
                    feats = _dsir_feats_py(text)
                    acc = 0.0
                    for f in feats:  # feature order == the expr fold
                        acc += llr[bucket(f)]
                    n_out.append(len(feats))
                    w_out.append(acc)
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "n_feats": n_out,
                        "__logw": w_out,
                    }
                )

        return flagged.mapInPandas(_score, out_schema)

    return cnt, scored


def _dsir_expr(flagged: DataFrame, id_col, text_col, n_buckets):
    """Expression arm: pure Catalyst HOFs, the algebra the SQL oracle
    replays. tokens() is let-bound so ProjectCollapse cannot inline
    the regexp split into every element_at reference inside the bigram
    lambda (measured 3x on the count pass)."""
    from ..functions.text import tokens
    from .dedup import _let

    toks = F.coalesce(
        tokens(F.lower(F.col(text_col))), F.array().cast("array<string>")
    )

    def _feats_of(l: Column) -> Column:
        big = F.when(
            F.size(l) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(l) - 2),
                lambda i: F.concat_ws(
                    "_", F.element_at(l, i + 1), F.element_at(l, i + 2)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.concat(l, big)

    base = flagged.select(
        id_col,
        "__is_target",
        _let(toks, _feats_of).alias("__feats"),
    )

    def _bucket(x: Column) -> Column:
        # the module's stable bucket primitive — same recipe as the
        # oracle's _DSIR_BKT macro and the Arrow kernel's hashlib twin
        return hash_bucket(x, n_buckets)

    ex = base.select(
        "__is_target", F.explode("__feats").alias("__x")
    ).select("__is_target", _bucket(F.col("__x")).alias("__b"))
    cnt = ex.groupBy("__b").agg(
        F.count(F.lit(1)).alias("cr"),
        F.count_if(F.col("__is_target")).alias("ct"),
    )

    def scored(llr: list[float]) -> DataFrame:
        arr = F.array(*[F.lit(w) for w in llr])
        logw = F.aggregate(
            F.transform(
                F.col("__feats"),
                lambda x: F.element_at(arr, (_bucket(x) + 1).cast("int")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return base.select(
            id_col,
            F.size("__feats").cast("long").alias("n_feats"),
            logw.alias("__logw"),
        )

    return cnt, scored
