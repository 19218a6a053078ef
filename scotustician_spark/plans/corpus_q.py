"""Corpus-assembly + dedup-resolution queries (beyond-reference
training-data operators), each with a DuckDB oracle.

All bucketing is md5-derived (see ``operators/corpus.py``) so the
oracle reproduces every assignment bit-for-bit; the connected-
components oracle is a recursive CTE over the same LSH pair SQL the
``minhash_lsh_pairs`` gate uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import components as CC
from ..operators import corpus as CP
from ..operators import dedup as DD
from ..session import local_relation
from .registry import register
from .vectors_text import _SHINGLES, _TOKS_G, _minhash_oracle, _t

# SQL twin of corpus.hash_bucket(id, n, hex_off)
def _bucket_sql(n: int, hex_off: int = 1, id_expr: str = "doc_id") -> str:
    return (
        f"CAST(concat('0x', substring(md5(CAST({id_expr} AS VARCHAR)), "
        f"{hex_off}, 8)) AS BIGINT) % {n}"
    )


@register(
    "dedup_components",
    f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle()}),
    edges AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach AS (
        SELECT doc_id AS u, doc_id AS comp FROM documents
        UNION
        SELECT e.v AS u, r.comp AS comp
        FROM reach r JOIN edges e ON e.u = r.u),
    comps AS (SELECT u AS doc_id, min(comp) AS component_id
              FROM reach GROUP BY u)
    SELECT doc_id, component_id,
           CAST(count(*) OVER (PARTITION BY component_id) AS BIGINT)
               AS component_size,
           doc_id = component_id AS is_keeper
    FROM comps
    """,
    doc="Duplicate-cluster resolution: MinHash-LSH candidate pairs → "
    "connected components (hash-min + pointer-doubling label "
    "propagation, O(log diameter) "
    "join+groupBy rounds) → canonical keeper per cluster. The oracle "
    "walks the same pair graph with a recursive CTE.",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    pairs = DD.minhash_lsh_candidates(docs, "doc_id", "text", n=3, num_hashes=16, band_size=4)
    return CC.dedup_resolution(pairs, docs.select("doc_id"))


@register(
    "dataset_splits",
    f"""
    WITH s AS (
        SELECT lang, n_chars,
               CASE WHEN {_bucket_sql(100)} < 80 THEN 'train'
                    WHEN {_bucket_sql(100)} < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents)
    SELECT split, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM s GROUP BY split, lang
    """,
    doc="Deterministic 80/10/10 train/val/test assignment by md5 "
    "bucket of doc_id — auditable, re-run-stable splits (no RNG, no "
    "state); a pure map + one aggregation.",
)
def dataset_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = CP.assign_splits(_t(spark, sf_dir, "documents"))
    return d.groupBy("split", "lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


_RATES = {"en": 300, "de": 700}


@register(
    "stratified_sample",
    f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_bucket_sql(1000, hex_off=17)} <
          CASE lang WHEN 'en' THEN 300 WHEN 'de' THEN 700 ELSE 1000 END
    """,
    doc="Deterministic stratified downsampling (keep 30% of en, 70% of "
    "de, all else) via per-mille md5 buckets — identical survivors at "
    "any partitioning, unlike seeded sampleBy. Row-level oracle checks "
    "exact membership.",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = CP.stratified_sample(
        _t(spark, sf_dir, "documents"), "lang", _RATES, id_col="doc_id"
    )
    return out.select("doc_id", "lang")


@register(
    "pack_sequences",
    f"""
    WITH s AS (
        SELECT doc_id, n_chars, {_bucket_sql(16, hex_off=9)} AS shard
        FROM documents),
    c AS (
        SELECT shard, n_chars,
               CAST(coalesce(sum(n_chars) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS bef
        FROM s)
    SELECT shard, bef // 4000 AS seq_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM c GROUP BY shard, seq_id
    """,
    doc="Concat-and-chunk sequence packing: hash-shard the corpus, "
    "running-sum the per-doc cost within each shard, cut a sequence "
    "every 4000 units. Per-shard windows — no global sort at any "
    "scale; parallelism is the shard count.",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    packed = CP.pack_by_budget(
        _t(spark, sf_dir, "documents"), "n_chars", budget=4000, n_shards=16
    )
    return packed.groupBy("shard", "seq_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "packing_efficiency",
    f"""
    WITH s AS (
        SELECT doc_id, n_chars, {_bucket_sql(16, hex_off=9)} AS shard
        FROM documents),
    c AS (
        SELECT shard, n_chars,
               CAST(coalesce(sum(n_chars) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS bef
        FROM s),
    q AS (
        SELECT shard, bef // 4000 AS seq_id,
               CAST(sum(n_chars) AS BIGINT) AS seq_chars
        FROM c GROUP BY 1, 2)
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_seqs,
           round(CAST(sum(least(seq_chars, 4000)) AS BIGINT)
                 / (count(*) * 4000.0), 6) AS avg_fill,
           CAST(sum(greatest(seq_chars - 4000, 0)) AS BIGINT)
               AS overflow_chars
    FROM q GROUP BY shard
    """,
    doc="Training-batch efficiency of the pack_sequences layout: per "
    "shard, how full the packed sequences actually are (avg_fill = "
    "in-budget chars / capacity, computed as exact integer sums with "
    "ONE final division — both engines divide the same two integers, "
    "so the double is bit-identical) and how many chars spill past "
    "the budget boundary (the doc that crosses it). The measurement "
    "that justifies a budget/shard-count choice before an expensive "
    "export; same per-shard windows as the packer — no global sort.",
)
def packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    packed = CP.pack_by_budget(
        _t(spark, sf_dir, "documents"), "n_chars", budget=4000, n_shards=16
    )
    per_seq = packed.groupBy("shard", "seq_id").agg(
        F.sum("n_chars").cast("long").alias("seq_chars")
    )
    cap = F.lit(4000)
    return per_seq.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_seqs"),
        F.round(
            F.sum(F.least(F.col("seq_chars"), cap)).cast("long")
            / (F.count("*") * 4000.0),
            6,
        ).alias("avg_fill"),
        F.sum(F.greatest(F.col("seq_chars") - cap, F.lit(0)))
        .cast("long")
        .alias("overflow_chars"),
    )


@register(
    "epoch_shuffle",
    """
    SELECT doc_id,
           CAST(row_number() OVER (
               ORDER BY md5(concat('ep1:', CAST(doc_id AS VARCHAR))), doc_id
           ) - 1 AS BIGINT) AS epoch_pos
    FROM documents
    """,
    doc="Reproducible training-order export: every epoch's global "
    "document order is md5('ep1:' || doc_id) — re-run-stable, "
    "resumable from any position, no RNG state to persist, and a new "
    "epoch is just a new seed string. The contiguous 0-based position "
    "comes from operators/corpus.py::stable_global_index "
    "(range-repartition + per-partition numbering + broadcast "
    "offsets), never a single-partition global window; the oracle IS "
    "that naive window — identical indexes, incomparable scaling.",
)
def epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.concat(F.lit("ep1:"), F.col("doc_id").cast("string"))).alias(
            "__k"
        ),
    )
    out = CP.stable_global_index(d, ["__k", "doc_id"], name="epoch_pos")
    return out.select("doc_id", "epoch_pos")


_FP_SQL = (
    "md5(regexp_replace(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), "
    "'\\s+', ' ', 'g'))"
)
_TOKS_SQL = (
    "regexp_split_to_array("
    "regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+')"
)


@register(
    "corpus_clean_decisions",
    f"""
    WITH RECURSIVE
    q AS (
        SELECT doc_id, text,
               coalesce(len({_TOKS_SQL}) >= 10, FALSE) AS qok
        FROM documents),
    ek AS (
        SELECT doc_id, text,
               min(doc_id) OVER (PARTITION BY {_FP_SQL}) AS keeper
        FROM q WHERE qok),
    s1 AS (SELECT doc_id, text FROM ek WHERE keeper = doc_id),
    pairs AS ({_minhash_oracle(src="s1")}),
    edges AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach AS (
        SELECT doc_id AS u, doc_id AS comp FROM s1
        UNION
        SELECT e.v AS u, r.comp AS comp
        FROM reach r JOIN edges e ON e.u = r.u),
    comps AS (SELECT u AS doc_id, min(comp) AS component_id
              FROM reach GROUP BY u)
    SELECT d.doc_id,
           CASE WHEN NOT q.qok THEN 'quality'
                WHEN ek.keeper <> d.doc_id THEN 'exact_dup'
                WHEN c.component_id <> d.doc_id THEN 'near_dup'
                ELSE 'kept' END AS decision
    FROM documents d
    LEFT JOIN q USING (doc_id)
    LEFT JOIN ek USING (doc_id)
    LEFT JOIN comps c USING (doc_id)
    """,
    doc="Flagship end-to-end training-corpus cleaning: quality gate "
    "(≥10 whitespace tokens) → exact dedup (normalized-fingerprint "
    "min-id keeper) → near-dup resolution (MinHash-LSH pairs over the "
    "exact survivors → connected components → min-id keeper). One "
    "decision per document with the drop reason; every stage is the "
    "already-gated operator, composed. The oracle replays the whole "
    "cascade in SQL, recursive CTE included.",
)
def corpus_clean_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from ..functions.text import fingerprint, tokens

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    q = docs.withColumn(
        "qok",
        F.coalesce(F.size(tokens("text")) >= 10, F.lit(False)),
    )
    ek = (
        q.filter("qok")
        .withColumn("keeper", F.min("doc_id").over(W.partitionBy(fingerprint("text"))))
    )
    s1 = ek.filter(F.col("keeper") == F.col("doc_id")).select("doc_id", "text")
    pairs = DD.minhash_lsh_candidates(s1, "doc_id", "text", n=3, num_hashes=16, band_size=4)
    comps = CC.connected_components(pairs, s1.select("doc_id"))
    return (
        q.select("doc_id", "qok")
        .join(ek.select("doc_id", "keeper"), "doc_id", "left")
        .join(comps, "doc_id", "left")
        .select(
            "doc_id",
            F.when(~F.col("qok"), "quality")
            .when(F.col("keeper") != F.col("doc_id"), "exact_dup")
            .when(F.col("component_id") != F.col("doc_id"), "near_dup")
            .otherwise("kept")
            .alias("decision"),
        )
    )


@register(
    "global_row_index",
    """
    SELECT o_orderkey, o_orderdate, o_totalprice,
           CAST(row_number() OVER (ORDER BY o_orderdate, o_orderkey) - 1
                AS BIGINT) AS global_idx
    FROM orders
    """,
    doc="Globally-ordered row index WITHOUT the single-partition window "
    "trap: range-repartition on the order key, per-partition row_number, "
    "per-partition counts cumulated into broadcast offsets. The oracle is "
    "the naive global window — identical indexes, incomparable scaling.",
    bench=True,
)
def global_row_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    return CP.stable_global_index(o, ["o_orderdate", "o_orderkey"])


_MIX_W = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
_MIX_W_SQL = "CASE source " + " ".join(
    f"WHEN '{s}' THEN {w}" for s, w in sorted(_MIX_W.items())
) + " END"


@register(
    "dataset_mix",
    f"""
    WITH pool AS (SELECT doc_id, source FROM documents
                  WHERE source IN ('src0', 'src1', 'src2')),
    counts AS (SELECT source, count(*) AS cnt FROM pool GROUP BY source),
    cap AS (SELECT min(cnt / ({_MIX_W_SQL})) AS cap FROM counts),
    rates AS (SELECT source,
                     CAST(least(1000, floor(
                         1000.0 * ({_MIX_W_SQL}) * cap.cap / cnt)) AS INTEGER)
                         AS rate
              FROM counts CROSS JOIN cap)
    SELECT p.doc_id, p.source
    FROM pool p JOIN rates r ON p.source = r.source
    WHERE {_bucket_sql(1000, hex_off=25, id_expr="p.doc_id")} < r.rate
    """,
    doc="Training-corpus mixture assembly (Pile/LLaMA-style fixed "
    "sampling weights per source): the largest mix every source can "
    "supply (N = min count_s/w_s) sets deterministic per-mille keep "
    "rates — the binding source keeps 100%. Two tiny broadcast "
    "relations (per-source counts, global cap) steer the row-level "
    "md5-bucket filter; the corpus itself never shuffles. Row-level "
    "oracle checks exact survivor membership.",
    bench=True,
)
def dataset_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = CP.dataset_mix(
        _t(spark, sf_dir, "documents"), "source", _MIX_W, id_col="doc_id"
    )
    return out.select("doc_id", "source")


# Shingle relation keyed by SOURCE (not doc) for the dataset-overlap
# query; same tokenizer/shingle contract as vectors_text._SHINGLES
_SRC_SHINGLES = """
    SELECT source, unnest(CASE
                WHEN l IS NULL OR len(l) = 0 OR (len(l) = 1 AND l[1] = '')
                    THEN CAST([] AS VARCHAR[])
                WHEN len(l) >= 3
                    THEN list_transform(range(1, len(l)-1),
                                        i -> array_to_string(l[i:i+2], ' '))
                ELSE [array_to_string(l, ' ')] END) AS shingle
    FROM (SELECT source, regexp_split_to_array(
              regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'),
              '\\s+') AS l
          FROM documents)
"""


@register(
    "source_overlap_jaccard",
    f"""
    WITH sh AS (SELECT DISTINCT source, shingle FROM ({_SRC_SHINGLES})),
    sizes AS (SELECT source, count(*) AS n_sh FROM sh GROUP BY source),
    inter AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(count(*) AS BIGINT) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
        GROUP BY 1, 2)
    SELECT i.source_a, i.source_b, i.n_inter,
           CAST(sa.n_sh AS BIGINT) AS n_a,
           CAST(sb.n_sh AS BIGINT) AS n_b,
           round(i.n_inter / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE), 6)
               AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.source_a
    JOIN sizes sb ON sb.source = i.source_b
    """,
    doc="Dataset-level overlap: exact pairwise Jaccard between corpus "
    "SOURCES over their distinct 3-gram shingle sets "
    "(operators/corpus.py::source_overlap) — the mixing/decontamination "
    "gate ('how much of source B is already in A?'). Shingling is "
    "in-row; posting lists are bounded by the source count, so the "
    "pair expansion is quadratic in #sources, never in documents; the "
    "corpus text shuffles once as (source, shingle) postings. Kept as "
    "the value oracle / sub-threshold arm; the REGISTERED production "
    "surface is source_overlap_auto (bench runs that).",
)
def source_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.source_overlap(
        _t(spark, sf_dir, "documents"), group_col="source", text_col="text", n=3
    )


def _source_sketch_oracle(num_hashes: int = 128) -> str:
    """Replays source_overlap_sketch: same 48-bit md5 base hash and
    universal-hash family as _minhash_oracle, min taken per SOURCE
    (min over a union = min of per-set minima), then pairwise
    signature match counts. n_match / num_hashes is exact in binary
    for power-of-two num_hashes — no rounding needed."""
    from ..operators.dedup import MINHASH_P, minhash_coeffs

    coef_rows = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(minhash_coeffs(num_hashes))
    )
    return f"""
    WITH posts AS (SELECT DISTINCT source, shingle FROM ({_SRC_SHINGLES})
                   WHERE shingle IS NOT NULL AND shingle <> ''),
    hashed AS (SELECT source,
                      CAST(concat('0x', substring(md5(shingle), 1, 12)) AS BIGINT)
                          % {MINHASH_P} AS H
               FROM posts),
    coef(pos, ca, cb) AS (SELECT * FROM (VALUES {coef_rows})),
    sigs AS (SELECT source, pos, min((ca * H + cb) % {MINHASH_P}) AS v
             FROM hashed CROSS JOIN coef GROUP BY 1, 2)
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(sum(CASE WHEN a.v = b.v THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
           CAST(sum(CASE WHEN a.v = b.v THEN 1 ELSE 0 END) AS DOUBLE)
               / {num_hashes} AS jaccard_est
    FROM sigs a JOIN sigs b ON a.pos = b.pos AND a.source < b.source
    GROUP BY 1, 2
    """


@register(
    "source_overlap_minhash",
    _source_sketch_oracle(),
    doc="At-scale arm of source_overlap_jaccard (VERDICT r6 #3): "
    "pairwise source-Jaccard ESTIMATE from per-source MinHash(128) "
    "signatures. Per-doc signatures are in-row (one md5 per distinct "
    "shingle); the per-source signature is their element-wise min "
    "(min over a union = min of per-set minima), so only 128 rows per "
    "document partial-aggregate through the one shuffle — the corpus "
    "text never moves, vs the exact path's full (source, shingle) "
    "postings relation. choose_overlap_strategy dispatches exact vs "
    "sketch on the measured corpus plan size "
    "(operators/corpus.py::source_overlap_auto).",
    bench=True,
)
def source_overlap_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.source_overlap_sketch(
        _t(spark, sf_dir, "documents"),
        group_col="source",
        text_col="text",
        n=3,
        num_hashes=128,
    )


@register(
    "source_overlap_auto",
    f"""
    WITH sh AS (SELECT DISTINCT source, shingle FROM ({_SRC_SHINGLES})),
    sizes AS (SELECT source, count(*) AS n_sh FROM sh GROUP BY source),
    inter AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(count(*) AS BIGINT) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
        GROUP BY 1, 2)
    SELECT i.source_a, i.source_b,
           round(i.n_inter / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE), 6)
               AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.source_a
    JOIN sizes sb ON sb.source = i.source_b
    """,
    doc="THE registered source-overlap surface (VERDICT r7 #3): "
    "operators/corpus.py::source_overlap_auto dispatches on the "
    "Catalyst plan-size estimate of the corpus input — the exact "
    "postings Jaccard below OVERLAP_EXACT_THRESHOLD_BYTES (the "
    "measured x10 crossover where exact hits 4.5x the oracle engine "
    "while the sketch holds 1.0x), the per-source MinHash(128) "
    "estimate above, where only 128 signature rows per doc shuffle. "
    "The oracle is the exact arm: every correctness tier (sf0.001 / "
    "sf0.01 / sf0.1 corpora, all <2 MiB) sits below the threshold — "
    "test_source_overlap_auto_oracle_arm pins that assumption so "
    "testdata growth cannot silently flip the compared arm.",
    bench=True,
)
def source_overlap_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.source_overlap_auto(
        _t(spark, sf_dir, "documents"), group_col="source", text_col="text", n=3
    )


# Case-PRESERVING tokens for chunking (chunk text must round-trip the
# original casing; same edge-strip/empty-guard contract as _TOKS)
_RAW_TOKS = (
    "regexp_split_to_array("
    "regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')"
)


@register(
    "doc_stride_chunks",
    f"""
    WITH base AS (
        SELECT doc_id,
               CASE WHEN text IS NULL
                         OR length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0
                    THEN CAST([] AS VARCHAR[])
                    ELSE {_RAW_TOKS} END AS l
        FROM documents),
    nc AS (SELECT doc_id, l,
                  CASE WHEN len(l) = 0 THEN 0
                       WHEN len(l) <= 64 THEN 1
                       ELSE LEAST(
                           CAST(ceil((len(l) - 64) / 32.0) AS INT) + 1,
                           CAST(floor((len(l) - 1) / 32.0) AS INT) + 1)
                       END AS n
           FROM base),
    ch AS (SELECT doc_id,
                  CAST(unnest(range(0, n)) AS INT) AS chunk_idx,
                  unnest(list_transform(range(0, n),
                         i -> l[i*32+1 : i*32+64])) AS ctoks
           FROM nc WHERE n > 0)
    SELECT doc_id, chunk_idx,
           CAST(len(ctoks) AS INT) AS n_chunk_tokens,
           array_to_string(ctoks, ' ') AS chunk_text
    FROM ch
    """,
    doc="Overlapping stride chunking (64-token windows every 32 tokens, "
    "operators/corpus.py::stride_chunks): the RAG-indexing / context-"
    "packing chunker whose overlap preserves cross-boundary context. "
    "Entirely in-row (sequence → slice → explode): a pure map stage — "
    "no shuffle at any corpus size.",
)
def doc_stride_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return CP.stride_chunks(
        _t(spark, sf_dir, "documents"), "doc_id", "text", size=64, stride=32
    )


@register(
    "domain_profile",
    """
    WITH u AS (SELECT doc_id, source || '.example.com' AS domain,
                      lang, n_chars, 'r' || CAST(doc_id % 7 AS VARCHAR) AS ref
               FROM documents)
    SELECT domain,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(DISTINCT ref) AS BIGINT) AS n_refs,
           round(avg(n_chars), 6) AS avg_chars,
           domain IN ('src0.example.com', 'src3.example.com') AS is_blocked
    FROM u GROUP BY domain
    """,
    doc="Web-corpus domain curation: documents carry a derived URL "
    "(https://<source>.example.com/<lang>/doc-<id>?ref=rN — synthetic, "
    "same derivation on both engines, the pii_redaction precedent); "
    "Spark extracts HOST/QUERY with the JVM parse_url expression and "
    "rolls up per-domain volume, language spread, referrer diversity "
    "and a blocklist verdict, while the oracle derives the components "
    "independently with string ops — parity proves the parse. The "
    "per-domain rollup + broadcast blocklist is the standard "
    "domain-filtering stage of a crawl pipeline; one groupBy keyed on "
    "domain at any scale.",
)
def domain_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.col("doc_id").cast("string"),
        F.lit("?ref=r"),
        (F.col("doc_id") % 7).cast("string"),
    )
    u = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.parse_url(url, F.lit("HOST")).alias("domain"),
        F.parse_url(url, F.lit("QUERY"), F.lit("ref")).alias("ref"),
    )
    blocked = F.col("domain").isin("src0.example.com", "src3.example.com")
    return u.groupBy("domain").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("ref").alias("n_refs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.first(blocked).alias("is_blocked"),
    )


@register(
    "incremental_components_delta",
    f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle()}),
    edges AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach AS (
        SELECT doc_id AS u, doc_id AS comp FROM documents
        UNION
        SELECT e.v AS u, r.comp AS comp
        FROM reach r JOIN edges e ON e.u = r.u),
    comps AS (SELECT u AS doc_id, min(comp) AS component_id
              FROM reach GROUP BY u)
    SELECT doc_id, component_id FROM comps
    """,
    doc="Incremental connected components "
    "(operators/components.py::incremental_components): the LSH pair "
    "graph is split into a base and a delta batch; the base labeling "
    "CONTRACTS to one (vertex → label) edge per node and propagation "
    "reruns on contraction + delta only — the expensive base PAIR "
    "relation never exists again once labeled. Exact by the "
    "contraction argument, so the oracle is the plain full-graph "
    "recursive CTE. The standing-dedup-graph maintenance step for a "
    "streaming corpus.",
)
def incremental_components_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    pairs = DD.minhash_lsh_candidates(
        docs, "doc_id", "text", n=3, num_hashes=16, band_size=4
    )
    is_delta = (F.col("id_a") + F.col("id_b")) % 4 == 0
    base, delta = pairs.filter(~is_delta), pairs.filter(is_delta)
    state = CC.connected_components(base, docs.select("doc_id"))
    return CC.incremental_components(state, delta)


def _chunk_embed_pool_oracle(dim: int = 8) -> str:
    from .registry import QUERY_REGISTRY

    raw = ", ".join(
        f"CAST(ascii(substring(md5(CAST({j} AS VARCHAR) || '|' || chunk_text), "
        f"1, 1)) AS DOUBLE) AS r{j}"
        for j in range(dim)
    )
    nrm = "sqrt(" + " + ".join(f"r{j} * r{j}" for j in range(dim)) + ")"
    e_cols = ", ".join(f"r{j} / nrm AS e{j}" for j in range(dim))
    m_cols = ", ".join(f"sum(e{j} * w) / sum(w) AS m{j}" for j in range(dim))
    fn = "sqrt(" + " + ".join(f"m{j} * m{j}" for j in range(dim)) + ")"
    out = ", ".join(f"round(m{j} / fn, 6) AS e{j}" for j in range(dim))
    return f"""
    WITH ch AS ({QUERY_REGISTRY["doc_stride_chunks"].oracle}),
    raw AS (SELECT doc_id, CAST(n_chunk_tokens AS DOUBLE) AS w, {raw} FROM ch),
    n AS (SELECT *, {nrm} AS nrm FROM raw),
    e AS (SELECT doc_id, w, {e_cols} FROM n),
    m AS (SELECT doc_id, {m_cols} FROM e GROUP BY doc_id),
    f AS (SELECT *, {fn} AS fn FROM m)
    SELECT doc_id, {out} FROM f
    """


@register(
    "chunk_embed_pool",
    _chunk_embed_pool_oracle(),
    bench=True,
    doc="End-to-end RAG indexing pipeline COMPOSED from verified "
    "stages: overlapping stride chunking (doc_stride_chunks) → "
    "distributed embedding inference per chunk (the embed_documents "
    "mapInPandas path, deterministic hash embedder) → token-weighted "
    "mean pooling per document, L2-normalized (the A1 aggregate "
    "applied to chunk embeddings). Every stage is a map or a "
    "doc-keyed aggregation — the whole document→vector pipeline "
    "shuffles once, on doc_id. The oracle composes the registered "
    "chunk oracle with the hash-embedder SQL and replays the pooling.",
)
def chunk_embed_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ml.embedding import embed_text

    dim = 8
    chunks = CP.stride_chunks(
        _t(spark, sf_dir, "documents"), "doc_id", "text", size=64, stride=32
    )
    # hash_sql: the Catalyst arm of the hash embedder (bit-identical
    # values, no Python boundary) — the whole chunk→embed→pool pipeline
    # is then one codegen'd map + one doc-keyed aggregation.
    emb = embed_text(
        chunks.select(
            "doc_id",
            F.col("n_chunk_tokens").cast("double").alias("w"),
            F.col("chunk_text").alias("text"),
        ),
        "text",
        dim=dim,
        mode="hash_sql",
    )
    m = emb.groupBy("doc_id").agg(
        *[
            (
                F.sum(F.col("embedding")[j] * F.col("w")) / F.sum("w")
            ).alias(f"m{j}")
            for j in range(dim)
        ]
    )
    fn = F.sqrt(sum(F.col(f"m{j}") * F.col(f"m{j}") for j in range(dim)))
    return m.select(
        "doc_id",
        *[F.round(F.col(f"m{j}") / fn, 6).alias(f"e{j}") for j in range(dim)],
    )


@register(
    "dataset_mix_temperature",
    f"""
    WITH counts AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
    mn AS (SELECT min(cnt) AS mn FROM counts),
    rates AS (SELECT lang,
                     CAST(least(1000, floor(
                         1000.0 * sqrt(mn.mn / CAST(cnt AS DOUBLE)))) AS INTEGER)
                         AS rate
              FROM counts CROSS JOIN mn)
    SELECT d.doc_id, d.lang
    FROM documents d JOIN rates r USING (lang)
    WHERE {_bucket_sql(1000, id_expr="'tmix:' || d.doc_id")} < r.rate
    """,
    doc="Temperature-weighted source mixing "
    "(operators/corpus.py::temperature_mix, α = 0.5): sampling rates "
    "derive from source sizes (p_s ∝ count_s^(α−1), smallest source "
    "keeps 100%) — the multilingual-rebalance step where dataset_mix "
    "takes fixed external weights. α = 0.5 makes the exponent a "
    "square root, which IEEE rounds exactly, so per-mille rates and "
    "the md5-bucket survivor set are bit-identical across engines. "
    "Broadcast counts + min steer the row filter; zero corpus "
    "shuffles.",
)
def dataset_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lang, not source: the synthetic sources are equal-sized (nothing
    # to rebalance) while languages are skewed (en dominates) — the
    # rebalance path actually downsamples here
    out = CP.temperature_mix(
        _t(spark, sf_dir, "documents"), "lang", alpha=0.5, id_col="doc_id"
    )
    return out.select("doc_id", "lang")


def _chunk_lang_oracle() -> str:
    from ..functions import text as TX
    from .registry import QUERY_REGISTRY
    from .vectors_text import _SW

    ctoks = (
        "regexp_split_to_array("
        "regexp_replace(lower(chunk_text), '^\\s+|\\s+$', '', 'g'), '\\s+')"
    )
    cnt = {
        c: f"len(list_filter({ctoks}, x -> list_contains({_SW[c]}, x)))"
        for c in sorted(TX.STOPWORDS)
    }
    sels = ", ".join(f"{v} AS c_{c}" for c, v in cnt.items())
    mx = "greatest(" + ", ".join(f"c_{c}" for c in sorted(TX.STOPWORDS)) + ")"
    case = " ".join(f"WHEN c_{c} = mx THEN '{c}'" for c in sorted(TX.STOPWORDS))
    return f"""
    WITH ch AS ({QUERY_REGISTRY["doc_stride_chunks"].oracle}),
    counts AS (SELECT doc_id, chunk_idx, {sels} FROM ch),
    m0 AS (SELECT *, {mx} AS mx FROM counts),
    cl AS (SELECT doc_id,
                  CASE WHEN mx = 0 THEN 'und' {case} END AS lp
           FROM m0),
    cnts AS (SELECT doc_id, lp, CAST(count(*) AS BIGINT) AS c
             FROM cl GROUP BY 1, 2),
    tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chunks,
                   CAST(count(*) AS BIGINT) AS n_langs
            FROM cnts GROUP BY 1),
    maj AS (SELECT doc_id, lp, c FROM (
                SELECT *, row_number() OVER (PARTITION BY doc_id
                                             ORDER BY c DESC, lp DESC) AS rn
                FROM cnts) WHERE rn = 1)
    SELECT t.doc_id, t.n_chunks, t.n_langs, m.lp AS major_lang,
           round(m.c / CAST(t.n_chunks AS DOUBLE), 6) AS major_frac,
           t.n_langs > 1 AS is_mixed
    FROM tot t JOIN maj m USING (doc_id)
    """


@register(
    "chunk_lang_consistency",
    _chunk_lang_oracle(),
    doc="Mixed-language detection by chunk-level language ID: stride "
    "chunks (doc_stride_chunks) each vote a language (the doc_langid "
    "stopword classifier applied per 64-token window), then per "
    "document the vote distribution yields the majority language, its "
    "share, and the is_mixed flag — the segmentation-aware upgrade of "
    "whole-document langid that catches code-switched / concatenated "
    "documents a single vote misses. Chunking and voting are in-row; "
    "the rollup is two doc-keyed aggregations. Majority tie-break "
    "(count desc, lang desc) is the same lexicographic struct-max on "
    "both engines.",
bench=True,
)
def chunk_lang_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as TX

    chunks = CP.stride_chunks(
        _t(spark, sf_dir, "documents"), "doc_id", "text", size=64, stride=32
    )
    cl = chunks.select("doc_id", TX.lang_id("chunk_text").alias("lp"))
    cnts = cl.groupBy("doc_id", "lp").agg(F.count("*").alias("c"))
    tot = cnts.groupBy("doc_id").agg(
        F.sum("c").alias("n_chunks"), F.count("*").alias("n_langs")
    )
    maj = cnts.groupBy("doc_id").agg(F.max(F.struct("c", "lp")).alias("m"))
    return tot.join(maj, "doc_id").select(
        "doc_id",
        "n_chunks",
        "n_langs",
        F.col("m.lp").alias("major_lang"),
        F.round(F.col("m.c") / F.col("n_chunks").cast("double"), 6).alias(
            "major_frac"
        ),
        (F.col("n_langs") > 1).alias("is_mixed"),
    )


@register(
    "source_length_ks",
    """
    WITH pool AS (
        SELECT source, n_chars AS v FROM documents
        WHERE source IN ('src0', 'src1')),
    g AS (SELECT v,
                 CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                 CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS cb
          FROM pool GROUP BY v),
    tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                   CAST(sum(cb) AS BIGINT) AS nb FROM g),
    cum AS (SELECT v,
                   sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
                   sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb
            FROM g),
    d AS (SELECT c.v, abs(c.cuma * t.nb - c.cumb * t.na) AS num, t.na, t.nb
          FROM cum c CROSS JOIN tot t)
    SELECT na AS n_a, nb AS n_b,
           CAST(v AS BIGINT) AS at_value,
           round(num / CAST(na * nb AS DOUBLE), 6) AS ks_d
    FROM (SELECT *, row_number() OVER (ORDER BY num DESC, v) AS rn
          FROM d WHERE na > 0 AND nb > 0)
    WHERE rn = 1
    """,
    doc="Two-sample Kolmogorov–Smirnov distance between two sources' "
    "document-length distributions — the distribution-shift audit "
    "(did this source's length profile drift from that one?). The ECDF "
    "difference is EXACT INTEGER arithmetic: |cumA·nB − cumB·nA| over "
    "the value-grouped counts, divided once at the end — bit-identical "
    "on any engine, no float accumulation. The windows run on the "
    "distinct-value relation (bin first at 100 TB); the raw table pays "
    "one map-combined groupBy.",
)
def source_length_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = _t(spark, sf_dir, "documents")
    pool = d.filter(F.col("source").isin("src0", "src1")).select(
        "source", F.col("n_chars").alias("v")
    )
    g = pool.groupBy("v").agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0))
        .cast("bigint")
        .alias("ca"),
        F.sum(F.when(F.col("source") == "src1", 1).otherwise(0))
        .cast("bigint")
        .alias("cb"),
    )
    tot = g.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
    )
    wc = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = g.select(
        "v",
        F.sum("ca").over(wc).alias("cuma"),
        F.sum("cb").over(wc).alias("cumb"),
    )
    dd = (
        cum.crossJoin(F.broadcast(tot))
        # a missing side (na or nb = 0) makes D undefined — emit no
        # comparison instead of dividing by zero under ANSI
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .withColumn(
            "num",
            F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na")),
        )
    )
    wr = W.orderBy(F.desc("num"), F.asc("v"))
    return (
        dd.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            F.col("v").cast("bigint").alias("at_value"),
            F.round(
                F.col("num") / (F.col("na") * F.col("nb")).cast("double"), 6
            ).alias("ks_d"),
        )
    )


_PREFIX_JACCARD_ORACLE = f"""
    WITH sh AS ({_SHINGLES}),
    toks AS (SELECT doc_id, list_distinct(list(shingle)) AS ts
             FROM sh GROUP BY doc_id),
    un AS (SELECT doc_id, unnest(ts) AS t FROM toks WHERE len(ts) > 0),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        FROM un a JOIN un b ON a.t = b.t AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    la AS (SELECT doc_id AS id_a, len(ts) AS na FROM toks),
    lb AS (SELECT doc_id AS id_b, len(ts) AS nb FROM toks)
    SELECT i.id_a, i.id_b,
           round(CAST(i.i AS DOUBLE) / (la.na + lb.nb - i.i), 6) AS jaccard
    FROM inter i JOIN la USING (id_a) JOIN lb USING (id_b)
    WHERE round(CAST(i.i AS DOUBLE) / (la.na + lb.nb - i.i), 6) >= 0.5
    """


@register(
    "prefix_jaccard_pairs",
    _PREFIX_JACCARD_ORACLE,
    doc="Shingle-set Jaccard self-join >= 0.5 via PREFIX FILTERING "
    "(AllPairs/PPJoin, operators/dedup.py::prefix_filtered_jaccard_"
    "pairs): rare-first shingle order, only the first "
    "len-ceil(t*len)+1 shingles indexed — any qualifying pair must "
    "collide in that prefix (a theorem, not a heuristic), so "
    "candidate generation runs on rare-shingle postings and frequent "
    "shingles never join. The oracle is the BRUTE-FORCE all-pairs "
    "formulation: equality is exactly the prefix-filter losslessness "
    "guarantee.",
)
def prefix_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return DD.prefix_filtered_jaccard_pairs(docs, "doc_id", "text", 0.5)


_QN_FRACTIONS = [(c - 0.5) / 100.0 for c in range(1, 101)]


@register(
    "quantile_normalize_sources",
    f"""
    WITH ranked AS (
        SELECT source, n_chars,
               ntile(100) OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS centile
        FROM documents),
    pooled AS (
        SELECT quantile_cont(n_chars,
                   [{", ".join(repr(f) for f in _QN_FRACTIONS)}]) AS qs
        FROM documents),
    g AS (SELECT source, centile,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 round(avg(n_chars), 6) AS avg_raw
          FROM ranked GROUP BY source, centile)
    SELECT g.source, g.centile, g.n_docs, g.avg_raw,
           round(qs[g.centile], 6) AS normalized
    FROM g CROSS JOIN pooled
    """,
    doc="Quantile normalization of document length across sources (the "
    "microarray/batch-effect leveler applied to corpus mixing): each "
    "source's docs are equi-depth-bucketed into centiles (ntile over a "
    "SOURCE-KEYED window, deterministic via the doc_id tiebreak), and "
    "every centile maps onto the POOLED distribution's exact "
    "interpolated percentile at the bucket midpoint — after mapping, "
    "every source has the same length distribution, so length-based "
    "quality filters can share one threshold across heterogeneous "
    "sources. The pooled reference is ONE global aggregate (a "
    "100-element array riding a broadcast); output is (source x "
    "centile) — metadata-sized. Spark `percentile` and DuckDB "
    "`quantile_cont` share the linear-interpolation definition "
    "(percentiles_by_group precedent).",
)
def quantile_normalize_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = _t(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = docs.select("source", "n_chars", F.ntile(100).over(w).alias("centile"))
    pooled = docs.agg(
        F.percentile(
            "n_chars", F.array(*[F.lit(f) for f in _QN_FRACTIONS])
        ).alias("qs")
    )
    g = ranked.groupBy("source", "centile").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_raw"),
    )
    return g.crossJoin(F.broadcast(pooled)).select(
        "source",
        "centile",
        "n_docs",
        "avg_raw",
        F.round(F.element_at("qs", F.col("centile")), 6).alias("normalized"),
    )


@register(
    "source_length_emd",
    """
    WITH pool AS (
        SELECT source, n_chars AS v FROM documents
        WHERE source IN ('src0', 'src1')),
    g AS (SELECT v,
                 CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                 CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS cb
          FROM pool GROUP BY v),
    tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                   CAST(sum(cb) AS BIGINT) AS nb FROM g),
    cum AS (SELECT v,
                   sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
                   sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb,
                   lead(v) OVER (ORDER BY v) AS nxt
            FROM g),
    seg AS (SELECT abs(cuma * t.nb - cumb * t.na) * (nxt - v) AS piece,
                   t.na, t.nb
            FROM cum CROSS JOIN tot t WHERE nxt IS NOT NULL)
    SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
           round(sum(piece) / CAST(max(na) * max(nb) AS DOUBLE), 6) AS emd
    FROM seg
    """,
    doc="1-D earth-mover (Wasserstein-1) distance between two sources' "
    "document-length distributions — the MAGNITUDE companion to "
    "source_length_ks (KS reports the worst ECDF gap; EMD integrates "
    "ALL of it, so a long mild drift scores high even when no single "
    "point does). Closed form in 1-D: integral of |F_A - F_B| = "
    "sum over consecutive support values of |gap| x run length. The "
    "accumulation is EXACT INTEGER arithmetic (|cumA*nB - cumB*nA| x "
    "integer gap, summed as BIGINT, divided once at the end) — "
    "bit-identical on any engine at any aggregation order. Windows "
    "run on the distinct-value relation only.",
)
def source_length_emd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = _t(spark, sf_dir, "documents")
    pool = d.filter(F.col("source").isin("src0", "src1")).select(
        "source", F.col("n_chars").alias("v")
    )
    g = pool.groupBy("v").agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0))
        .cast("bigint")
        .alias("ca"),
        F.sum(F.when(F.col("source") == "src1", 1).otherwise(0))
        .cast("bigint")
        .alias("cb"),
    )
    tot = g.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
    )
    w = W.orderBy("v")
    cum = g.select(
        "v",
        F.sum("ca").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("cuma"),
        F.sum("cb").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("cumb"),
        F.lead("v").over(w).alias("nxt"),
    )
    seg = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("nxt").isNotNull())
        .select(
            (
                F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na"))
                * (F.col("nxt") - F.col("v"))
            ).alias("piece"),
            "na",
            "nb",
        )
    )
    return seg.agg(
        F.max("na").cast("bigint").alias("n_a"),
        F.max("nb").cast("bigint").alias("n_b"),
        F.round(
            F.sum("piece") / (F.max("na") * F.max("nb")).cast("double"), 6
        ).alias("emd"),
    )


@register(
    "zipf_slope",
    f"""
    WITH toks AS (SELECT unnest({_TOKS_G}) AS t FROM documents),
    cnt AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY t),
    top AS (SELECT c, row_number() OVER (ORDER BY c DESC, t) AS i
            FROM (SELECT * FROM cnt ORDER BY c DESC, t LIMIT 1000)),
    xy AS (SELECT ln(CAST(i AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
           FROM top),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
                 sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
          FROM xy)
    SELECT n AS n_ranks,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
           round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM s
    """,
    doc="Zipf's-law fit over the corpus vocabulary: OLS slope of "
    "log(frequency) on log(rank) for the top-1000 tokens — natural "
    "text sits near -1; heavy template/boilerplate corpora flatten, "
    "spam/generated text steepens, so the slope is a one-number "
    "corpus-health screen next to doc_token_entropy. Token counts are "
    "map-side-combined; selection is TakeOrderedAndProject on exact "
    "integer counts (token tiebreak); the regression runs over 1000 "
    "aggregated log-points (double sums there round at 1e-13, six "
    "decimals is far coarser — the repo's sums-of-continuous-doubles "
    "rounding policy).",
)
def zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from ..functions import text as TX

    d = _t(spark, sf_dir, "documents")
    toks = F.coalesce(
        TX.tokens(F.lower(F.col("text"))), F.array().cast("array<string>")
    )
    cnt = (
        d.select(F.explode(toks).alias("t"))
        .groupBy("t")
        .agg(F.count("*").cast("long").alias("c"))
    )
    top = (
        cnt.orderBy(F.desc("c"), F.asc("t"))
        .limit(1000)
        .withColumn("i", F.row_number().over(W.orderBy(F.desc("c"), F.asc("t"))))
    )
    xy = top.select(
        F.log(F.col("i").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    s = xy.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        F.col("n").alias("n_ranks"),
        F.round(num / den, 6).alias("zipf_slope"),
        F.round(num * num / (den * deny), 6).alias("r2"),
    )


_QC_B = 64          # hashed weight buckets
_QC_GAIN = 4.0      # logistic gain on the mean feature weight
# pseudo-trained weight for bucket b: exact integer mixing, then one
# double division — bit-identical in any engine
_QC_W_SQL = (
    "((CAST(concat('0x', substring(md5(x), 1, 8)) AS BIGINT) % {b})"
    " * 2654435761 % 1000003) / 1000003.0 - 0.5"
).format(b=_QC_B)


@register(
    "quality_classifier_filter",
    f"""
    WITH base AS (SELECT doc_id, {_TOKS_G} AS l FROM documents),
    f AS (SELECT doc_id,
            l || CASE WHEN len(l) >= 2
                 THEN list_transform(range(1, len(l)),
                                     i -> l[i] || '_' || l[i+1])
                 ELSE CAST([] AS VARCHAR[]) END AS feats
          FROM base),
    w AS (SELECT doc_id, CAST(len(feats) AS BIGINT) AS n_feats,
            list_sum(list_transform(feats, x -> {_QC_W_SQL})) AS s
          FROM f),
    sc AS (SELECT doc_id, n_feats,
            CASE WHEN n_feats = 0 THEN NULL
                 ELSE round(1.0 / (1.0 + exp(-{_QC_GAIN}
                      * (s / n_feats))), 6) END AS quality_score
           FROM w)
    SELECT doc_id, n_feats, quality_score,
           CASE WHEN quality_score IS NULL THEN 0
                WHEN quality_score >= 0.5 THEN 1 ELSE 0 END AS keep
    FROM sc
    """,
    doc="Model-based quality filtering — the fastText-classifier stage "
    "of CCNet/LLaMA-style corpus pipelines, restated with the hashing "
    "trick (Weinberger et al. 2009): unigram + bigram features hash "
    f"into {_QC_B} md5-derived weight buckets, the document score is a "
    "logistic over the mean bucket weight, and keep is the 0.5 "
    "threshold on the ROUNDED score (both engines threshold identical "
    "bits). Weights here are deterministic pseudo-trained values "
    "(exact integer mixing) so the oracle replays the model; swapping "
    "in real trained weights changes one broadcast map, not the plan. "
    "Plan shape: EVERYTHING is in-row (feature expansion, hashing, "
    "weight lookup, fold) — ZERO exchanges and zero Python in the "
    "plan, pure JVM higher-order-function evaluation over the "
    "documents scan; at 100 TB this is one map pass, the same cost "
    "as reading the corpus.",
    bench=True,
)
def quality_classifier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as TX
    from ..session import repartition_for_compute

    docs = _t(spark, sf_dir, "documents")
    toks = F.coalesce(
        TX.tokens(F.lower(F.col("text"))), F.array().cast("array<string>")
    )
    # widen before the per-feature md5 fold: a single-file scan is ONE
    # partition, which ran the whole tokenize+hash pass serially
    # (r10: 1.57 s on one core while DuckDB used 32 — the plan was
    # already zero-exchange in-row, the missing piece was parallelism;
    # at 100 TB the scan has many splits and this is a no-op)
    base = repartition_for_compute(docs.select("doc_id", "text")).select(
        "doc_id", toks.alias("l")
    )
    bigrams = F.when(
        F.size("l") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("l") - 2),
            lambda i: F.concat_ws(
                "_",
                F.element_at(F.col("l"), i + 1),
                F.element_at(F.col("l"), i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(F.col("l"), bigrams)

    def _w(x):
        b = F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long") % _QC_B
        return (b * F.lit(2654435761) % F.lit(1000003)) / F.lit(
            1000003.0
        ) - F.lit(0.5)

    s = F.aggregate(
        F.transform(feats, _w), F.lit(0.0), lambda acc, v: acc + v
    )
    n = F.size(feats).cast("long")
    score = F.when(n == 0, F.lit(None).cast("double")).otherwise(
        F.round(
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(F.lit(-_QC_GAIN) * (s / n))),
            6,
        )
    )
    return base.select(
        "doc_id",
        n.alias("n_feats"),
        score.alias("quality_score"),
    ).withColumn(
        "keep",
        F.when(F.col("quality_score").isNull(), F.lit(0))
        .when(F.col("quality_score") >= 0.5, F.lit(1))
        .otherwise(F.lit(0))
        .cast("int"),
    )


_LB_STRIP = "regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g')"
_LB_BUCKET = (
    "CASE WHEN n_tok < 2 THEN 0 WHEN n_tok < 4 THEN 1"
    " WHEN n_tok < 8 THEN 2 WHEN n_tok < 16 THEN 3"
    " WHEN n_tok < 32 THEN 4 WHEN n_tok < 64 THEN 5 ELSE 6 END"
)


@register(
    "length_bucket_batches",
    f"""
    WITH t AS (
        SELECT doc_id,
               len(regexp_split_to_array({_LB_STRIP}, '\\s+')) AS n_tok
        FROM documents
        WHERE text IS NOT NULL AND length({_LB_STRIP}) > 0),
    b AS (SELECT doc_id, n_tok, {_LB_BUCKET} AS bucket FROM t),
    i AS (SELECT bucket, n_tok,
                 row_number() OVER (PARTITION BY bucket
                                    ORDER BY n_tok, doc_id) - 1 AS idx
          FROM b)
    SELECT CAST(bucket AS INTEGER) AS bucket,
           CAST(floor(idx / 16) AS BIGINT) AS batch_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(n_tok) AS BIGINT) AS max_tok,
           CAST(sum(n_tok) AS BIGINT) AS sum_tok,
           CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT) AS pad_waste
    FROM i GROUP BY 1, 2
    """,
    doc="Length-bucketed inference/training batching — the padding-"
    "minimizing counterpart to pack_sequences: docs fall into power-"
    "of-two token-length buckets (integer CASE thresholds, no float "
    "log2 parity risk), are ordered by length inside each bucket, and "
    "cut into fixed batches of 16; per batch reports the padding "
    "waste (n*max - sum) a pad-to-batch-max loader would pay. The "
    "within-bucket ordinal reuses stable_global_index over (bucket, "
    "n_tok, doc_id) — range-shuffle once, per-partition numbering, "
    "broadcast offsets — minus each bucket's broadcast min; NO per-"
    "bucket global window anywhere (the oracle's PARTITION BY bucket "
    "window is 7 single-partition sorts — correct as spec, unusable "
    "at scale). Batch stats partial-aggregate map-side.",
)
def length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    d = _t(spark, sf_dir, "documents")
    t = (
        d.select("doc_id", F.size(tokens(F.col("text"))).alias("n_tok"))
        .filter(F.col("n_tok") > 0)
    )
    bucket = (
        F.when(F.col("n_tok") < 2, 0)
        .when(F.col("n_tok") < 4, 1)
        .when(F.col("n_tok") < 8, 2)
        .when(F.col("n_tok") < 16, 3)
        .when(F.col("n_tok") < 32, 4)
        .when(F.col("n_tok") < 64, 5)
        .otherwise(6)
    )
    b = t.withColumn("bucket", bucket)
    idx = CP.stable_global_index(b, ["bucket", "n_tok", "doc_id"], name="gidx")
    offs = idx.groupBy("bucket").agg(F.min("gidx").alias("off"))
    j = idx.join(F.broadcast(offs), "bucket")
    return (
        j.groupBy(
            F.col("bucket").cast("int").alias("bucket"),
            F.floor((F.col("gidx") - F.col("off")) / 16).cast("long").alias("batch_id"),
        )
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.max("n_tok").cast("long").alias("max_tok"),
            F.sum("n_tok").cast("long").alias("sum_tok"),
        )
        .withColumn(
            "pad_waste",
            (F.col("n_docs") * F.col("max_tok") - F.col("sum_tok")).cast("long"),
        )
    )


# Corpus-prefix decile: floor(doc_id * 10 / n_docs) — doc_ids are the
# ingest order, so deciles are "the first 10% of the corpus", etc.
# Exact for ids < 2^49 (the product stays inside double precision).
_DECILE = (
    "CAST(floor(doc_id * 10.0 / (SELECT count(*) FROM documents))"
    " AS INTEGER)"
)


@register(
    "vocab_growth",
    f"""
    WITH d AS (SELECT {_DECILE} AS bucket, {_TOKS_G} AS l FROM documents),
    tok AS (SELECT bucket, unnest(l) AS token FROM d),
    fb AS (SELECT token, min(bucket) AS first_bucket FROM tok GROUP BY token),
    newt AS (SELECT first_bucket AS bucket,
                    CAST(count(*) AS BIGINT) AS new_types
             FROM fb GROUP BY first_bucket),
    tot AS (SELECT bucket, CAST(sum(len(l)) AS BIGINT) AS bucket_tokens
            FROM d GROUP BY bucket),
    m AS (SELECT t.bucket, t.bucket_tokens,
                 coalesce(n.new_types, 0) AS new_types
          FROM tot t LEFT JOIN newt n ON n.bucket = t.bucket),
    c AS (SELECT bucket, bucket_tokens, new_types,
                 CAST(sum(bucket_tokens) OVER (ORDER BY bucket) AS BIGINT)
                     AS cum_tokens,
                 CAST(sum(new_types) OVER (ORDER BY bucket) AS BIGINT)
                     AS cum_types
          FROM m)
    SELECT bucket, bucket_tokens, new_types, cum_tokens, cum_types,
           CASE WHEN cum_tokens > 1 AND cum_types > 0
                THEN round(ln(cum_types) / ln(cum_tokens), 6) END
               AS heaps_beta
    FROM c
    """,
    doc="Vocabulary-growth (Heaps'-law) curve over corpus-prefix "
    "deciles: new word TYPES first seen per decile, cumulative "
    "vocabulary vs cumulative token volume, and the empirical Heaps "
    "exponent log V / log N — the curve that says whether a corpus is "
    "still contributing new vocabulary or has saturated (the "
    "collect-more-data signal). First occurrence is min(bucket) per "
    "token — one map-side-combined shuffle on token, never a "
    "prefix-by-prefix rescan; the decile comes from a broadcast 1-row "
    "corpus count; the cumulative window runs over the 10-row decile "
    "relation (metadata-sized carry-in, the documented pattern).",
    bench=True,
)
def vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as TX
    from ..session import repartition_for_compute
    from pyspark.sql.window import Window as W

    docs = _t(spark, sf_dir, "documents")
    n = docs.agg(F.count("*").alias("n_docs"))
    toks = F.coalesce(
        TX.tokens(F.lower(F.col("text"))), F.array().cast("array<string>")
    )
    d = (
        repartition_for_compute(docs.select("doc_id", "text"))
        .crossJoin(F.broadcast(n))
        .select(
            F.floor(F.col("doc_id") * 10.0 / F.col("n_docs"))
            .cast("int")
            .alias("bucket"),
            toks.alias("l"),
        )
    )
    # ONE linear chain (round-9 plan audit: the former fb/tot split
    # consumed d twice — corpus scanned+tokenized twice, 7 exchanges).
    # (bucket, token) occurrence counts aggregate once (the map-side
    # combine: the occurrence stream shrinks to ≤ vocab × 10 rows
    # before anything else moves); first occurrence is a min window
    # over the token partition of THAT bounded relation; the bucket
    # rollup then reads each token's first-bucket row (exactly one
    # row per token has bucket == first_bucket) — no join, no second
    # scan. Exchanges: input widening (small-file only, no-op at
    # scale) + (bucket,token) agg + token window + 10-row rollup +
    # 10-row cumulative window. The token-window exchange is the
    # load-bearing one: first-occurrence is inherently a global
    # per-token question.
    # explode_outer + count(token): a bucket whose documents are all
    # token-less still emits a (bucket, NULL, cnt=0) row, so it
    # appears with bucket_tokens=0 exactly like the oracle's LEFT
    # JOIN shape; the NULL-token rows never count as new types.
    occ = (
        d.select("bucket", F.explode_outer("l").alias("token"))
        .groupBy("bucket", "token")
        .agg(F.count("token").alias("cnt"))
    )
    f = occ.withColumn(
        "first_bucket", F.min("bucket").over(W.partitionBy("token"))
    )
    m = f.groupBy("bucket").agg(
        F.sum("cnt").cast("long").alias("bucket_tokens"),
        F.sum(
            F.when(
                F.col("token").isNotNull()
                & (F.col("bucket") == F.col("first_bucket")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("new_types"),
    )
    w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    c = m.select(
        "bucket",
        "bucket_tokens",
        "new_types",
        F.sum("bucket_tokens").over(w).cast("long").alias("cum_tokens"),
        F.sum("new_types").over(w).cast("long").alias("cum_types"),
    )
    return c.select(
        "bucket",
        "bucket_tokens",
        "new_types",
        "cum_tokens",
        "cum_types",
        F.when(
            (F.col("cum_tokens") > 1) & (F.col("cum_types") > 0),
            F.round(F.log("cum_types") / F.log("cum_tokens"), 6),
        ).alias("heaps_beta"),
    )


@register(
    "ngram_novelty",
    f"""
    WITH sh AS (SELECT doc_id, shingle FROM ({_SHINGLES})),
    b AS (SELECT s.shingle, {_DECILE} AS bucket
          FROM sh s JOIN documents USING (doc_id)),
    occ AS (SELECT shingle, bucket, count(*) AS cnt FROM b GROUP BY 1, 2),
    f AS (SELECT shingle, bucket, cnt,
                 min(bucket) OVER (PARTITION BY shingle) AS first_bucket
          FROM occ)
    SELECT bucket,
           CAST(sum(cnt) AS BIGINT) AS total_ngrams,
           CAST(sum(CASE WHEN bucket = first_bucket THEN cnt ELSE 0 END)
                AS BIGINT) AS new_ngrams,
           round(sum(CASE WHEN bucket = first_bucket THEN cnt ELSE 0 END)
                 / CAST(sum(cnt) AS DOUBLE), 6) AS novelty
    FROM f GROUP BY bucket
    """,
    doc="N-gram novelty per corpus-prefix decile: the share of 3-gram "
    "shingle OCCURRENCES whose shingle first appears in that decile — "
    "near 1 early, decaying as the corpus saturates; a flat-high tail "
    "means genuinely novel incoming text, a collapsed tail means "
    "you're re-crawling what you have (data-curation dashboard "
    "staple). Occurrences pre-aggregate to (shingle, decile) "
    "map-side; first-exposure is a window over the shingle partition "
    "of that REDUCED relation (no second corpus shuffle); final "
    "rollup is 10 rows.",
)
def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import word_shingles
    from ..session import repartition_for_compute
    from pyspark.sql.window import Window as W

    docs = _t(spark, sf_dir, "documents")
    n = docs.agg(F.count("*").alias("n_docs"))
    occ = (
        repartition_for_compute(docs.select("doc_id", "text"))
        .crossJoin(F.broadcast(n))
        .select(
            F.floor(F.col("doc_id") * 10.0 / F.col("n_docs"))
            .cast("int")
            .alias("bucket"),
            F.explode(word_shingles("text", 3)).alias("shingle"),
        )
        .groupBy("shingle", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    f = occ.withColumn(
        "first_bucket", F.min("bucket").over(W.partitionBy("shingle"))
    )
    new_cnt = F.sum(
        F.when(F.col("bucket") == F.col("first_bucket"), F.col("cnt")).otherwise(
            F.lit(0)
        )
    )
    return f.groupBy("bucket").agg(
        F.sum("cnt").cast("long").alias("total_ngrams"),
        new_cnt.cast("long").alias("new_ngrams"),
        F.round(new_cnt / F.sum("cnt").cast("double"), 6).alias("novelty"),
    )


@register(
    "dedup_savings",
    """
    WITH g AS (SELECT source,
                      coalesce(md5(text), 'null-' || doc_id) AS fp,
                      CAST(count(*) AS BIGINT) AS cnt,
                      CAST(max(coalesce(length(text), 0)) AS BIGINT)
                          AS doc_chars
               FROM documents GROUP BY 1, 2)
    SELECT source,
           CAST(sum(cnt) AS BIGINT) AS n_docs,
           CAST(sum(cnt - 1) AS BIGINT) AS n_dup_docs,
           CAST(sum((cnt - 1) * doc_chars) AS BIGINT) AS dup_chars,
           round(sum((cnt - 1) * doc_chars)
                 / CAST(nullif(sum(cnt * doc_chars), 0) AS DOUBLE), 6)
               AS pct_chars_saved
    FROM g GROUP BY source ORDER BY source
    """,
    doc="Exact-dedup savings forecast per source: documents, duplicate "
    "documents, duplicate characters, and the fraction of stored "
    "bytes a keep-one exact dedup reclaims — the capacity-planning "
    "number quoted before running the dedup itself. One "
    "map-side-combined shuffle on (source, fingerprint) then a "
    "per-source rollup; NULL-text docs get a per-doc fingerprint so "
    "they never count as duplicates of each other.",
)
def dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    g = docs.groupBy(
        "source",
        F.coalesce(
            F.md5("text"), F.concat(F.lit("null-"), F.col("doc_id"))
        ).alias("fp"),
    ).agg(
        F.count("*").cast("long").alias("cnt"),
        F.max(F.coalesce(F.length("text"), F.lit(0)))
        .cast("long")
        .alias("doc_chars"),
    )
    dup_chars = F.sum((F.col("cnt") - 1) * F.col("doc_chars"))
    return (
        g.groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_docs"),
            F.sum(F.col("cnt") - 1).cast("long").alias("n_dup_docs"),
            dup_chars.cast("long").alias("dup_chars"),
            F.round(
                dup_chars
                / F.nullif(
                    F.sum(F.col("cnt") * F.col("doc_chars")), F.lit(0)
                ).cast("double"),
                6,
            ).alias("pct_chars_saved"),
        )
        .orderBy("source")
    )


def _split_case(id_expr: str) -> str:
    return (
        f"CASE WHEN {_bucket_sql(100, id_expr=id_expr)} < 80 THEN 'train' "
        f"WHEN {_bucket_sql(100, id_expr=id_expr)} < 90 THEN 'val' "
        f"ELSE 'test' END"
    )


@register(
    "split_leakage",
    f"""
    WITH pairs AS ({_minhash_oracle()}),
    x AS (SELECT id_a, id_b,
                 {_split_case('id_a')} AS split_a,
                 {_split_case('id_b')} AS split_b
          FROM pairs),
    n AS (SELECT least(split_a, split_b) AS split_lo,
                 greatest(split_a, split_b) AS split_hi, id_a, id_b
          FROM x WHERE split_a <> split_b),
    p AS (SELECT split_lo, split_hi, CAST(count(*) AS BIGINT) AS n_pairs
          FROM n GROUP BY 1, 2),
    d AS (SELECT split_lo, split_hi,
                 CAST(count(DISTINCT dd) AS BIGINT) AS n_docs
          FROM (SELECT split_lo, split_hi, unnest([id_a, id_b]) AS dd
                FROM n)
          GROUP BY 1, 2)
    SELECT p.split_lo, p.split_hi, p.n_pairs, d.n_docs
    FROM p JOIN d USING (split_lo, split_hi)
    """,
    doc="Train/val/test LEAKAGE audit: MinHash-LSH near-duplicate "
    "pairs whose endpoints land in different splits — the pairs that "
    "silently inflate eval scores (a near-copy of a test doc in "
    "train). Because splits are md5-of-id buckets, each endpoint's "
    "split derives IN-ROW from the pair's own ids: the audit costs "
    "exactly the LSH candidate generation (collision-bounded, never "
    "n²) plus a metadata-sized rollup — no join back to the corpus, "
    "no extra shuffle. Reports leaky pair count and distinct "
    "implicated docs per split boundary.",
)
def split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    pairs = DD.minhash_lsh_candidates(
        docs, "doc_id", "text", n=3, num_hashes=16, band_size=4
    )

    def split_of(c: str):
        b = CP.hash_bucket(c, 100)
        return (
            F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
        )

    x = pairs.select(
        "id_a", "id_b", split_of("id_a").alias("split_a"), split_of("id_b").alias("split_b")
    ).filter(F.col("split_a") != F.col("split_b"))
    n = x.select(
        F.least("split_a", "split_b").alias("split_lo"),
        F.greatest("split_a", "split_b").alias("split_hi"),
        "id_a",
        "id_b",
    )
    p = n.groupBy("split_lo", "split_hi").agg(
        F.count("*").cast("long").alias("n_pairs")
    )
    d = (
        n.select(
            "split_lo",
            "split_hi",
            F.explode(F.array("id_a", "id_b")).alias("dd"),
        )
        .groupBy("split_lo", "split_hi")
        .agg(F.countDistinct("dd").cast("long").alias("n_docs"))
    )
    return p.join(d, ["split_lo", "split_hi"])


@register(
    "dedup_cluster_purity",
    f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle()}),
    edges AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach AS (
        SELECT doc_id AS u, doc_id AS comp FROM documents
        UNION
        SELECT e.v AS u, r.comp AS comp
        FROM reach r JOIN edges e ON e.u = r.u),
    comps AS (SELECT u AS doc_id, min(comp) AS component_id
              FROM reach GROUP BY u),
    csize AS (SELECT component_id, CAST(count(*) AS BIGINT)
                  AS component_size
              FROM comps GROUP BY 1),
    posts AS (SELECT DISTINCT doc_id, shingle FROM ({_SHINGLES})),
    sizes AS (SELECT doc_id, count(*) AS sz FROM posts GROUP BY doc_id),
    inter AS (SELECT p.id_a, p.id_b, CAST(count(*) AS BIGINT) AS n_inter
              FROM pairs p
              JOIN posts a ON a.doc_id = p.id_a
              JOIN posts b ON b.doc_id = p.id_b AND b.shingle = a.shingle
              GROUP BY 1, 2),
    pj AS (SELECT coalesce(i.n_inter, 0) AS n_inter,
                  sa.sz + sb.sz - coalesce(i.n_inter, 0) AS uni,
                  c.component_id, cs.component_size
           FROM pairs p
           LEFT JOIN inter i USING (id_a, id_b)
           JOIN sizes sa ON sa.doc_id = p.id_a
           JOIN sizes sb ON sb.doc_id = p.id_b
           JOIN comps c ON c.doc_id = p.id_a
           JOIN csize cs USING (component_id))
    SELECT component_size,
           CAST(count(DISTINCT component_id) AS BIGINT) AS n_components,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(CAST(sum(n_inter) AS DOUBLE)
                 / CAST(sum(uni) AS DOUBLE), 6) AS micro_jaccard,
           round(min(n_inter / CAST(uni AS DOUBLE)), 6) AS min_jaccard
    FROM pj GROUP BY 1
    """,
    doc="Dedup OVER-MERGE audit: for every LSH component (the clusters "
    "a dedup would collapse), the true shingle-Jaccard quality of its "
    "member pairs, rolled up by component size — micro-averaged "
    "Jaccard (exact BIGINT intersection/union sums, one final "
    "division) and the worst pair. Large components with low "
    "min_jaccard are transitive-closure chains gluing unrelated "
    "documents — the failure mode that silently deletes good data at "
    "corpus scale, and the measurement behind a band/threshold "
    "re-tune. Exact verification is computed ONLY for candidate "
    "pairs (collision-bounded), components via hash-min propagation; "
    "the oracle replays both (recursive CTE + posting intersection).",
)
def dedup_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    cands = DD.minhash_lsh_candidates(
        docs, "doc_id", "text", n=3, num_hashes=16, band_size=4
    ).localCheckpoint(eager=False)  # pair edges: components + purity join
    comps = CC.dedup_resolution(cands, docs.select("doc_id"))
    posts = DD.shingle_postings(docs, "doc_id", "text", n=3)
    cand_docs = (
        cands.select(F.col("id_a").alias("doc_id"))
        .unionByName(cands.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    cposts = posts.join(F.broadcast(cand_docs), "doc_id")
    sizes = posts.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        F.broadcast(cands)
        .join(cposts.select(F.col("doc_id").alias("id_a"), "shingle"), "id_a")
        .join(
            cposts.select(F.col("doc_id").alias("id_b"), "shingle"),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    pj = (
        cands.join(inter, ["id_a", "id_b"], "left")
        .withColumn("n_inter", F.coalesce("n_inter", F.lit(0).cast("long")))
        .join(
            sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sza")),
            "id_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("szb")),
            "id_b",
        )
        .withColumn(
            "uni", (F.col("sza") + F.col("szb") - F.col("n_inter")).cast("long")
        )
        .join(
            comps.select(
                F.col("doc_id").alias("id_a"), "component_id", "component_size"
            ),
            "id_a",
        )
    )
    return pj.groupBy("component_size").agg(
        F.countDistinct("component_id").cast("long").alias("n_components"),
        F.count("*").cast("long").alias("n_pairs"),
        F.round(
            F.sum("n_inter").cast("double") / F.sum("uni").cast("double"), 6
        ).alias("micro_jaccard"),
        F.round(
            F.min(F.col("n_inter").cast("double") / F.col("uni").cast("double")),
            6,
        ).alias("min_jaccard"),
    )


# 8-token opening-prefix fingerprint: the shared-boilerplate key.
# (The full-text variant of the same matrix is the exact-dup key of
# dedup_exact_groups; this corpus has no cross-source exact dups, so
# the prefix key is the one with signal.)
_PFX_FP = (
    "md5(array_to_string((regexp_split_to_array("
    "regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'),"
    " '\\s+'))[1:8], ' '))"
)


@register(
    "source_boilerplate_matrix",
    f"""
    WITH d AS (SELECT DISTINCT source, {_PFX_FP} AS fp
               FROM documents
               WHERE text IS NOT NULL
                 AND length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) > 0),
    n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_fp
          FROM d GROUP BY source),
    x AS (SELECT a.source AS source_a, b.source AS source_b,
                 CAST(count(*) AS BIGINT) AS n_shared
          FROM d a JOIN d b ON a.fp = b.fp AND a.source < b.source
          GROUP BY 1, 2)
    SELECT x.source_a, x.source_b, x.n_shared,
           na.n_fp AS n_a, nb.n_fp AS n_b,
           round(x.n_shared
                 / CAST(least(na.n_fp, nb.n_fp) AS DOUBLE), 6)
               AS containment
    FROM x
    JOIN n na ON na.source = x.source_a
    JOIN n nb ON nb.source = x.source_b
    """,
    doc="Cross-source shared-BOILERPLATE matrix: for every source "
    "pair, how many distinct 8-token opening-prefix fingerprints "
    "they share, and the containment fraction (shared / smaller "
    "side) — 'these two crawls carry the same page templates', the "
    "matrix that flags re-crawls and mirror sites before mixing. "
    "Distinct (source, prefix-fp) postings self-join on fingerprint, "
    "so pair expansion is bounded by per-fingerprint source counts — "
    "quadratic in SOURCES sharing a prefix, never in documents (the "
    "posting-list shape of source_overlap_jaccard with O(1)-per-doc "
    "keys instead of per-shingle postings); swapping the prefix key "
    "for functions.text.fingerprint makes it the exact-duplicate "
    "matrix. Empty/blank docs carry no fingerprint and never pair.",
)
def source_boilerplate_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = tokens(F.lower(F.col("text")))
    d = (
        docs.select(
            "source",
            F.md5(F.array_join(F.slice(toks, 1, 8), " ")).alias("fp"),
        )
        .filter(F.size(toks) > 0)
        .distinct()
    )
    n = d.groupBy("source").agg(F.count("*").cast("long").alias("n_fp"))
    a = d.select(F.col("source").alias("source_a"), "fp")
    b = d.select(F.col("source").alias("source_b"), "fp")
    x = (
        a.join(b, "fp")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    return (
        x.join(F.broadcast(n.select(F.col("source").alias("source_a"),
                                    F.col("n_fp").alias("n_a"))), "source_a")
        .join(F.broadcast(n.select(F.col("source").alias("source_b"),
                                   F.col("n_fp").alias("n_b"))), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            F.round(
                F.col("n_shared").cast("double")
                / F.least("n_a", "n_b").cast("double"),
                6,
            ).alias("containment"),
        )
    )


_SWEEP_THRESHOLDS = (0.5, 0.7, 0.8, 0.9)


@register(
    "dedup_threshold_sweep",
    f"""
    WITH pairs AS ({_minhash_oracle()}),
    posts AS (SELECT DISTINCT doc_id, shingle FROM ({_SHINGLES})),
    sizes AS (SELECT doc_id, count(*) AS sz FROM posts GROUP BY doc_id),
    inter AS (SELECT p.id_a, p.id_b, CAST(count(*) AS BIGINT) AS n_inter
              FROM pairs p
              JOIN posts a ON a.doc_id = p.id_a
              JOIN posts b ON b.doc_id = p.id_b AND b.shingle = a.shingle
              GROUP BY 1, 2),
    pj AS (SELECT p.id_a, p.id_b, coalesce(i.n_inter, 0) AS n_inter,
                  sa.sz + sb.sz - coalesce(i.n_inter, 0) AS uni
           FROM pairs p
           LEFT JOIN inter i USING (id_a, id_b)
           JOIN sizes sa ON sa.doc_id = p.id_a
           JOIN sizes sb ON sb.doc_id = p.id_b),
    th AS (SELECT CAST(unnest([{", ".join(str(t) for t in _SWEEP_THRESHOLDS)}])
               AS DOUBLE) AS threshold),
    x AS (SELECT t.threshold, p.id_a, p.id_b
          FROM pj p JOIN th t ON p.n_inter >= t.threshold * p.uni),
    pc AS (SELECT threshold, CAST(count(*) AS BIGINT) AS n_pairs
           FROM x GROUP BY 1),
    dc AS (SELECT threshold, CAST(count(DISTINCT dd) AS BIGINT) AS n_docs
           FROM (SELECT threshold, unnest([id_a, id_b]) AS dd FROM x)
           GROUP BY 1),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS corpus FROM documents)
    SELECT t.threshold,
           coalesce(pc.n_pairs, 0) AS n_pairs,
           coalesce(dc.n_docs, 0) AS n_docs_involved,
           round(coalesce(dc.n_docs, 0)
                 / CAST(nullif(nd.corpus, 0) AS DOUBLE), 6) AS pct_corpus
    FROM th t
    LEFT JOIN pc ON pc.threshold = t.threshold
    LEFT JOIN dc ON dc.threshold = t.threshold
    CROSS JOIN nd
    """,
    doc="Dedup THRESHOLD sizing: at Jaccard cut-offs "
    f"{list(_SWEEP_THRESHOLDS)}, how many candidate pairs survive and "
    "how much of the corpus they touch — the table read before "
    "committing a similarity threshold (completes the calibration "
    "family: minhash_estimate_error = estimator bias, "
    "dedup_cluster_purity = over-merge, dedup_savings = exact-dup "
    "floor, this = the knob). True Jaccard is verified ONLY for LSH "
    "candidates; the threshold test is the integer-safe n_inter >= "
    "t*union (no division); every threshold row appears even when "
    "empty. One pair table feeds all thresholds via a broadcast "
    "4-row relation.",
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    cands = DD.minhash_lsh_candidates(
        docs, "doc_id", "text", n=3, num_hashes=16, band_size=4
    ).localCheckpoint(eager=False)
    posts = DD.shingle_postings(docs, "doc_id", "text", n=3)
    cand_docs = (
        cands.select(F.col("id_a").alias("doc_id"))
        .unionByName(cands.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    cposts = posts.join(F.broadcast(cand_docs), "doc_id")
    sizes = posts.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        F.broadcast(cands)
        .join(cposts.select(F.col("doc_id").alias("id_a"), "shingle"), "id_a")
        .join(
            cposts.select(F.col("doc_id").alias("id_b"), "shingle"),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    pj = (
        cands.join(inter, ["id_a", "id_b"], "left")
        .withColumn("n_inter", F.coalesce("n_inter", F.lit(0).cast("long")))
        .join(
            sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sza")),
            "id_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("szb")),
            "id_b",
        )
        .withColumn(
            "uni", (F.col("sza") + F.col("szb") - F.col("n_inter")).cast("long")
        )
    )
    th = local_relation(
        docs.sparkSession, [(t,) for t in _SWEEP_THRESHOLDS], "threshold double"
    )
    x = pj.crossJoin(F.broadcast(th)).filter(
        F.col("n_inter") >= F.col("threshold") * F.col("uni")
    )
    pc = x.groupBy("threshold").agg(F.count("*").cast("long").alias("n_pairs"))
    dc = (
        x.select("threshold", F.explode(F.array("id_a", "id_b")).alias("dd"))
        .groupBy("threshold")
        .agg(F.countDistinct("dd").cast("long").alias("n_docs"))
    )
    nd = docs.agg(F.count("*").cast("long").alias("corpus"))
    return (
        th.join(pc, "threshold", "left")
        .join(dc, "threshold", "left")
        .crossJoin(F.broadcast(nd))
        .select(
            "threshold",
            F.coalesce("n_pairs", F.lit(0).cast("long")).alias("n_pairs"),
            F.coalesce("n_docs", F.lit(0).cast("long")).alias("n_docs_involved"),
            F.round(
                F.coalesce("n_docs", F.lit(0).cast("long")).cast("double")
                / F.nullif(F.col("corpus"), F.lit(0)).cast("double"),
                6,
            ).alias("pct_corpus"),
        )
    )


@register(
    "source_cap_sample",
    f"""
    WITH ranked AS (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                                  ORDER BY {_bucket_sql(1000, hex_off=9)},
                                           doc_id) AS rn
        FROM documents)
    SELECT doc_id, source FROM ranked WHERE rn <= 10
    """,
    doc="Per-domain cap (Common-Crawl-style: bound any one source's "
    "share of the training mix): keep at most 10 docs per source, "
    "selected by deterministic (md5-bucket, id) order — a stable "
    "pseudo-random sample, identical on any engine/parallelism. "
    "operators/corpus.py::per_source_cap — the global_row_index "
    "two-phase trick per source: per-(source, bucket) counts (tiny, "
    "map-side combined) + running offsets over the COUNTS relation, "
    "broadcast back; whole buckets pass as an in-row filter and only "
    "the boundary bucket (~1/1000 of a source) pays a row_number — a "
    "10M-doc domain never serializes onto one reducer, unlike the "
    "naive PARTITION BY source window the oracle uses.",
    bench=True,
)
def source_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import per_source_cap

    d = _t(spark, sf_dir, "documents")
    return per_source_cap(d, "source", "doc_id", cap=10).select("doc_id", "source")


@register(
    "weighted_reservoir_sample",
    """
    WITH scored AS (
        SELECT lang, doc_id,
               round(ln((CAST(concat('0x',
                          substring(md5(CAST(doc_id AS VARCHAR)), 13, 8))
                          AS BIGINT) + 0.5) / 4294967296.0)
                     / n_chars, 9) AS sample_key
        FROM documents
        WHERE n_chars > 0)
    SELECT lang, doc_id, sample_key, CAST(rn AS BIGINT) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY lang
                                       ORDER BY sample_key DESC, doc_id) AS rn
          FROM scored)
    WHERE rn <= 5
    """,
    doc="Weighted sampling without replacement, 5 docs per language, "
    "probability proportional to n_chars — Efraimidis-Spirakis (2006) "
    "reservoir keys ln(u)/w with u drawn deterministically from each "
    "row's own md5 bits (no RNG state; engine-portable; 9dp-rounded "
    "keys so libm ulp noise can't flip ranks). "
    "operators/corpus.py::weighted_reservoir_sample — distributed "
    "top-k SELECTION: per-(group, md5-shard) bounded top-k arrays "
    "merge in a second aggregation, so no reducer ever buffers more "
    "than 1/64th of a group, unlike the PARTITION BY group window the "
    "oracle uses.",
    bench=True,
)
def weighted_reservoir_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import weighted_reservoir_sample

    d = _t(spark, sf_dir, "documents")
    return weighted_reservoir_sample(
        d, ["lang"], "n_chars", "doc_id", k=5
    ).select("lang", "doc_id", "sample_key", "rnk")


_DSIR_B = 256
_DSIR_TARGET = "source IN ('src1', 'src2', 'src3')"
_DSIR_BKT = (
    f"CAST(concat('0x', substring(md5(x), 1, 8)) AS BIGINT) % {_DSIR_B}"
)


@register(
    "dsir_importance_weights",
    f"""
    WITH base AS (
        SELECT doc_id, {_DSIR_TARGET} AS is_t, {_TOKS_G} AS l
        FROM documents),
    f AS (SELECT doc_id, is_t,
            l || CASE WHEN len(l) >= 2
                 THEN list_transform(range(1, len(l)),
                                     i -> l[i] || '_' || l[i+1])
                 ELSE CAST([] AS VARCHAR[]) END AS feats
          FROM base),
    e AS (SELECT doc_id, is_t, {_DSIR_BKT} AS b
          FROM f, unnest(feats) AS u(x)),
    cnt AS (SELECT b, count(*) AS cr,
                   count(*) FILTER (WHERE is_t) AS ct
            FROM e GROUP BY b),
    tot AS (SELECT sum(cr) AS r, sum(ct) AS t FROM cnt),
    llr AS (SELECT b, round(ln((ct + 1.0) / (t + {_DSIR_B}.0))
                          - ln((cr + 1.0) / (r + {_DSIR_B}.0)), 12) AS w
            FROM cnt, tot),
    dw AS (SELECT e.doc_id, round(sum(llr.w), 6) AS lw
           FROM e JOIN llr USING (b) GROUP BY e.doc_id),
    sc AS (SELECT f.doc_id, CAST(len(f.feats) AS BIGINT) AS n_feats,
                  COALESCE(dw.lw, 0.0) AS lw,
                  -ln(-ln((((CAST(concat('0x', substring(md5('dsir|' ||
                      CAST(f.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                      % 1000003) + 1) / 1000004.0))) AS g
           FROM f LEFT JOIN dw ON f.doc_id = dw.doc_id)
    SELECT doc_id, n_feats, lw AS log_weight,
           round(lw + g, 9) AS resample_key
    FROM sc
    ORDER BY resample_key DESC, doc_id
    LIMIT 100
    """,
    doc="DSIR data selection (Xie et al. 2023): score every raw doc "
    "by the log-likelihood ratio of two Laplace-smoothed hashed-"
    f"n-gram multinomials ({_DSIR_B} md5 buckets, unigram+bigram "
    "features) — target = the curated sources src1-3 — then Gumbel-"
    "top-k resample 100 docs ∝ weight without replacement (u from "
    "each row's own md5 bits, key = 6dp log-weight + Gumbel, 9dp-"
    "rounded before ranking so libm ulp noise can't flip the cut). "
    "operators/corpus.py::dsir_log_weights — scale shape: one "
    "bucket-keyed count aggregate (per-partition partials bound "
    f"shuffle rows at partitions × {_DSIR_B}), the {_DSIR_B} llr "
    "values collect to the driver (bounded read, centroid-probe "
    "class), and the score pass is a pure map over the documents "
    "scan — zero per-doc shuffle; selection is "
    "TakeOrderedAndProject. Serves the ARROW kernel arm (hashlib md5 "
    "+ per-batch feature cache, ~10x the CodegenFallback HOF "
    "expression arm, bit-equality pinned by test); the oracle "
    "replays the expression arm's algebra via explode+join+groupBy, "
    "so per-doc sums cross engines in different orders — absorbed "
    "by rounding llr to 12dp and the weight to 6dp BEFORE the 9dp "
    "key.",
    bench=True,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    w = CP.dsir_log_weights(
        d,
        F.col("source").isin("src1", "src2", "src3"),
        n_buckets=_DSIR_B,
    )
    return w.orderBy(F.col("resample_key").desc(), "doc_id").limit(100)
