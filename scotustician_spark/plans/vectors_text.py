"""Vector + text-analysis queries (SURVEY §2.5/2.7/2.8 plus the
beyond-reference training-data operators), each with a DuckDB oracle.

The Spark implementations live in ``functions/`` and ``operators/``;
this module binds them to the driver's synthetic tables and provides
the SQL twins. All hashing is md5-based precisely so the oracle can
reproduce signatures bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import text as TX
from ..functions import vector as V
from ..operators import dedup as DD
from ..operators import similarity as SIM
from .registry import register
from .tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Memoized per (session, path) — see plans/tables.py. NTZ left as-is
    # (these tables are text/vector; no timestamp surface).
    return load_table(spark, sf_dir, name, normalize_ntz=False)


# --- shared oracle SQL fragments ------------------------------------------

# regex edge-strip, not trim(): SQL trim removes only spaces, and the
# Spark tokens() contract is Python str.split() (all whitespace)
_TOKS = (
    "regexp_split_to_array("
    "regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+')"
)
# NB: unnest must wrap the WHOLE CASE — DuckDB's unnest-inside-a-CASE-
# branch silently drops every row that takes the other branch (verified
# empirically), which would lose all docs with < n tokens. Zero-token
# docs (NULL text, or blank text, where DuckDB splits '' to ['']) emit
# no shingles, matching Spark word_shingles' empty array.
_SHINGLES = f"""
    SELECT doc_id, unnest(CASE
                WHEN l IS NULL OR len(l) = 0 OR (len(l) = 1 AND l[1] = '')
                    THEN CAST([] AS VARCHAR[])
                WHEN len(l) >= 3
                    THEN list_transform(range(1, len(l)-1),
                                        i -> array_to_string(l[i:i+2], ' '))
                ELSE [array_to_string(l, ' ')] END) AS shingle
    FROM (SELECT doc_id, {_TOKS} AS l FROM documents)
"""
_SW = {
    code: "[" + ",".join(f"'{w}'" for w in TX.STOPWORDS[code]) + "]"
    for code in TX.STOPWORDS
}
_EMB_LONG = """
    SELECT vec_id, label,
           generate_subscripts(embedding, 1) - 1 AS pos,
           CAST(unnest(embedding) AS DOUBLE) AS v
    FROM embeddings
"""


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "doc_token_stats",
    f"""
    WITH base AS (SELECT doc_id, text, n_chars, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           CAST(len(toks)
                + length(regexp_replace(text, '[^\\.,;:!\\?''"\\(\\)]', '', 'g'))
                + greatest(0, CAST(floor((length(text) - len(toks)*5) / 4.0) AS BIGINT))
                AS BIGINT) AS bpe_tokens,
           CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
               / NULLIF(len(toks), 0) AS avg_word_len,
           CAST(length(text) AS INTEGER) AS text_len,
           n_chars
    FROM base
    """,
    doc="Token counting for training pipelines: whitespace tokens (the "
    "reference's word_count, helpers.py:153) + a BPE-ish estimate + "
    "average word length; all codegen expressions.",
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    return d.select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.bpe_ish_token_count("text").alias("bpe_tokens"),
        (
            F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w)).cast("double")
            / F.nullif(F.size(toks), F.lit(0))
        ).alias("avg_word_len"),
        F.length("text").alias("text_len"),
        "n_chars",
    )


@register(
    "doc_quality",
    f"""
    WITH base AS (
        SELECT doc_id, text,
               len({_TOKS}) AS n_tok,
               CAST(list_sum(list_transform({_TOKS}, t -> length(t))) AS DOUBLE)
                   / NULLIF(len({_TOKS}), 0) AS awl,
               CAST(len(list_filter({_TOKS}, x -> list_contains({_SW["en"]}, x))) AS DOUBLE)
                   / NULLIF(len({_TOKS}), 0) AS sw_ratio
        FROM documents)
    SELECT doc_id, n_tok AS n_tokens, awl AS avg_word_len, sw_ratio AS stopword_ratio,
           (CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END
            + CASE WHEN awl >= 2.0 AND awl <= 12.0 THEN 1.0 ELSE 0.0 END
            + CASE WHEN sw_ratio > 0.05 THEN 1.0 ELSE 0.0 END) / 3.0 AS quality
    FROM base
    """,
    doc="Document quality scoring (C4/Gopher-style length, word-length and "
    "stopword filters) — the corpus-filtering stage of a pretraining pipeline.",
)
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.avg_word_length("text").alias("avg_word_len"),
        TX.stopword_ratio("text", "en").alias("stopword_ratio"),
        TX.quality_score("text").alias("quality"),
    )


def _langid_oracle() -> str:
    cnt = {
        c: f"len(list_filter({_TOKS}, x -> list_contains({_SW[c]}, x)))"
        for c in sorted(TX.STOPWORDS)
    }
    mx = "greatest(" + ", ".join(f"c_{c}" for c in sorted(TX.STOPWORDS)) + ")"
    case = " ".join(f"WHEN c_{c} = mx THEN '{c}'" for c in sorted(TX.STOPWORDS))
    sels = ", ".join(f"{v} AS c_{c}" for c, v in cnt.items())
    return f"""
    WITH counts AS (SELECT doc_id, lang, {sels} FROM documents),
    m AS (SELECT *, {mx} AS mx FROM counts)
    SELECT doc_id, lang,
           CASE WHEN mx = 0 THEN 'und' {case} END AS lang_pred,
           CASE WHEN (CASE WHEN mx = 0 THEN 'und' {case} END) = lang
                THEN 1 ELSE 0 END AS is_correct
    FROM m
    """


@register(
    "doc_langid",
    _langid_oracle(),
    doc="Language identification via stopword votes (n-gram-heuristic "
    "family); compared against the table's labeled lang column.",
)
def doc_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    pred = TX.lang_id("text")
    return d.select(
        "doc_id",
        "lang",
        pred.alias("lang_pred"),
        F.when(pred == F.col("lang"), 1).otherwise(0).alias("is_correct"),
    )


@register(
    "dedup_exact_groups",
    """
    SELECT md5(regexp_replace(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+', ' ', 'g')) AS fp,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS keeper_id
    FROM documents
    GROUP BY 1
    """,
    doc="Exact dedup via normalized-text fingerprint groupBy "
    "(hash-partitioned single shuffle; the 100 TB exact-dedup baseline).",
    bench=True,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.exact_duplicates(_t(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "ngram_jaccard_pairs",
    f"""
    WITH posts AS (SELECT DISTINCT doc_id, shingle FROM ({_SHINGLES})),
    sizes AS (SELECT doc_id, count(*) AS sz FROM posts GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_inter
        FROM posts a JOIN posts b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT id_a, id_b, n_inter,
           CAST(sa.sz AS BIGINT) AS sz_a, CAST(sb.sz AS BIGINT) AS sz_b,
           n_inter * 1.0 / (sa.sz + sb.sz - n_inter) AS jaccard
    FROM inter
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE n_inter * 1.0 / (sa.sz + sb.sz - n_inter) >= 0.5
    """,
    doc="Exact word-3-gram Jaccard near-dup pairs ≥ 0.5 via shingle "
    "postings self-join — only docs sharing a shingle ever meet "
    "(no cartesian); document-frequency cap available for hot shingles.",
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.5
    )


def _minhash_oracle(num_hashes: int = 16, band_size: int = 4, src: str = "documents") -> str:
    from ..operators.dedup import MINHASH_P, minhash_coeffs

    shingles = _SHINGLES if src == "documents" else _SHINGLES.replace(
        "FROM documents", f"FROM {src}"
    )
    mins = ", ".join(
        f"min(({a} * H + {b}) % {MINHASH_P}) AS mh{i}"
        for i, (a, b) in enumerate(minhash_coeffs(num_hashes))
    )
    n_bands = num_hashes // band_size
    band_rows = ", ".join(
        "({bi}, md5({cat}))".format(
            bi=bi,
            cat=" || '|' || ".join(
                f"CAST(mh{bi * band_size + j} AS VARCHAR)" for j in range(band_size)
            ),
        )
        for bi in range(n_bands)
    )
    return f"""
    WITH posts AS (SELECT DISTINCT doc_id, shingle FROM ({shingles})),
    hashed AS (
        SELECT doc_id,
               CAST(concat('0x', substring(md5(shingle), 1, 12)) AS BIGINT)
                   % {MINHASH_P} AS H
        FROM posts),
    sigs AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
    bands AS (
        SELECT doc_id, b.band, b.band_sig
        FROM sigs, LATERAL (VALUES {band_rows}) AS b(band, band_sig))
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    """


@register(
    "minhash_lsh_pairs",
    _minhash_oracle(),
    doc="MinHash(16)+LSH(4 bands × 4 rows) candidate pairs: ONE md5 per "
    "shingle (48-bit base hash), k mins via a universal int64 hash "
    "family in a single groupBy — oracle-reproducible arithmetic. "
    "Candidates come from an equi-join on band signature — never a "
    "cartesian.",
    bench=True,
)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.minhash_lsh_candidates(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=3, num_hashes=16, band_size=4
    )


def _pagerank_oracle(damping: float = 0.85, n_iter: int = 8) -> str:
    """Fixed-iteration PageRank unrolled as chained CTEs over the LSH
    pair graph (the _minhash_oracle SQL nested as a derived table)."""
    parts = [
        f"WITH edges AS (SELECT * FROM ({_minhash_oracle()}) t)",
        "sym0 AS (SELECT id_a AS u, id_b AS v FROM edges"
        " UNION SELECT id_b, id_a FROM edges)",
        "deg AS (SELECT u, count(*) AS deg FROM sym0 GROUP BY u)",
        "sym AS (SELECT sym0.u, sym0.v, 1.0 / deg.deg AS share"
        " FROM sym0 JOIN deg ON deg.u = sym0.u)",
        "verts AS (SELECT doc_id AS v FROM documents)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)",
        "pr0 AS (SELECT v, 1.0 / nn.n AS r FROM verts CROSS JOIN nn)",
    ]
    prev = "pr0"
    for t in range(1, n_iter + 1):
        parts.append(
            f"c{t} AS (SELECT sym.v, sum({prev}.r * sym.share) AS c"
            f" FROM {prev} JOIN sym ON {prev}.v = sym.u GROUP BY sym.v)"
        )
        parts.append(
            f"pr{t} AS (SELECT verts.v,"
            f" (1 - {damping}) / nn.n + {damping} * coalesce(c{t}.c, 0) AS r"
            f" FROM verts CROSS JOIN nn LEFT JOIN c{t} ON c{t}.v = verts.v)"
        )
        prev = f"pr{t}"
    final = (
        f"SELECT {prev}.v AS doc_id,"
        f" CAST(coalesce(deg.deg, 0) AS BIGINT) AS degree,"
        f" round({prev}.r, 6) AS pagerank"
        f" FROM {prev} LEFT JOIN deg ON deg.u = {prev}.v"
    )
    return ",\n".join(parts) + "\n" + final


@register(
    "doc_pagerank",
    _pagerank_oracle(),
    doc="PageRank centrality over the MinHash-LSH similarity graph "
    "(operators/graph.py): pick the most CENTRAL document of a near-dup "
    "cluster as canonical, not just the min id. Fixed 8 iterations, "
    "each one equi-join + one groupBy keyed on vertex ids with "
    "localCheckpoint lineage cuts (the components.py loop shape); edge "
    "shares precomputed once so rounds move only (vertex, rank) rows. "
    "Oracle = the same recurrence unrolled as chained CTEs; dangling-"
    "mass leak + unweighted edges pinned identically on both sides.",
)
def doc_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank

    d = _t(spark, sf_dir, "documents")
    edges = DD.minhash_lsh_candidates(
        d, "doc_id", "text", n=3, num_hashes=16, band_size=4
    )
    pr = pagerank(edges, d.select("doc_id"), id_col="doc_id", n_iter=8)
    return pr.withColumn("pagerank", F.round("pagerank", 6))


def _incremental_dedup_oracle(num_hashes: int = 16, band_size: int = 4) -> str:
    """Bands CTE shared with _minhash_oracle; delta = doc_id % 5 = 0,
    base = the rest. The fp/band 'indexes' are just CTE filters here —
    in the Spark plan they are separate persisted relations."""
    from ..operators.dedup import MINHASH_P, minhash_coeffs

    mins = ", ".join(
        f"min(({a} * H + {b}) % {MINHASH_P}) AS mh{i}"
        for i, (a, b) in enumerate(minhash_coeffs(num_hashes))
    )
    n_bands = num_hashes // band_size
    band_rows = ", ".join(
        "({bi}, md5({cat}))".format(
            bi=bi,
            cat=" || '|' || ".join(
                f"CAST(mh{bi * band_size + j} AS VARCHAR)" for j in range(band_size)
            ),
        )
        for bi in range(n_bands)
    )
    norm = (
        "md5(regexp_replace(regexp_replace(lower(text), "
        "'^\\s+|\\s+$', '', 'g'), '\\s+', ' ', 'g'))"
    )
    return f"""
    WITH posts AS (SELECT DISTINCT doc_id, shingle FROM ({_SHINGLES})),
    hashed AS (
        SELECT doc_id,
               CAST(concat('0x', substring(md5(shingle), 1, 12)) AS BIGINT)
                   % {MINHASH_P} AS H
        FROM posts),
    sigs AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
    bands AS (
        SELECT doc_id, b.band, b.band_sig
        FROM sigs, LATERAL (VALUES {band_rows}) AS b(band, band_sig)),
    fp AS (SELECT doc_id, {norm} AS fp FROM documents),
    exact AS (
        SELECT doc_id,
               fp IN (SELECT DISTINCT fp FROM fp WHERE doc_id % 5 <> 0)
                   AS is_exact_dup
        FROM fp WHERE doc_id % 5 = 0),
    near AS (
        SELECT d.doc_id, CAST(count(DISTINCT b.doc_id) AS BIGINT) AS n
        FROM bands d JOIN bands b
          ON d.band = b.band AND d.band_sig = b.band_sig
         AND b.doc_id % 5 <> 0
        WHERE d.doc_id % 5 = 0
        GROUP BY d.doc_id)
    SELECT e.doc_id, e.is_exact_dup,
           coalesce(near.n, 0) AS n_near_candidates,
           CASE WHEN e.is_exact_dup THEN 'drop_exact'
                WHEN coalesce(near.n, 0) > 0 THEN 'review_near'
                ELSE 'keep' END AS decision
    FROM exact e LEFT JOIN near ON e.doc_id = near.doc_id
    """


@register(
    "incremental_dedup_delta",
    _incremental_dedup_oracle(),
    doc="Incremental dedup of a new batch (doc_id %% 5 = 0) against the "
    "already-indexed base corpus: exact-fingerprint probe + LSH-band probe, "
    "both equi-joins against PERSISTED index relations (tables.py::"
    "persisted_relation, keyed by dataset stamp + LSH params — built once, "
    "probed every call, the same serving discipline as the persisted ANN "
    "index) — the base text is never rescanned. Triage decision per delta "
    "document.",
    bench=True,
)
def incremental_dedup_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import fingerprint
    from .tables import persisted_relation

    d = _t(spark, sf_dir, "documents")
    delta = d.filter(F.col("doc_id") % 5 == 0)
    base = d.filter(F.col("doc_id") % 5 != 0)
    src = [f"{sf_dir}/documents.parquet"]
    base_fps = persisted_relation(
        spark,
        "dedup_base_fps",
        src,
        "mod5base",
        lambda: base.select(fingerprint("text").alias("fp")),
    )
    base_bands = persisted_relation(
        spark,
        "dedup_base_bands",
        src,
        f"mod5base_n3_h16_b4_fam{DD.MINHASH_FAMILY_VERSION}",
        lambda: DD.minhash_bands(
            base, "doc_id", "text", n=3, num_hashes=16, band_size=4
        ),
    )
    return DD.incremental_dedup(
        delta, base_fps, base_bands, "doc_id", "text", n=3, num_hashes=16, band_size=4
    )


def _simhash_oracle(bits: int = 16) -> str:
    odd = "('1','3','5','7','9','b','d','f')"
    votes = ", ".join(
        f"sum(CASE WHEN substring(h, {j + 1}, 1) IN {odd} THEN 1 ELSE -1 END) AS v{j}"
        for j in range(bits)
    )
    concat = " || ".join(f"CASE WHEN v{j} > 0 THEN '1' ELSE '0' END" for j in range(bits))
    # votes 33-64 come from a second, salt-suffixed md5 — mirrors
    # simhash_signature_expr/pandas exactly
    h_expr = "md5(tok)" if bits <= 32 else "md5(tok) || md5(tok || '#')"
    # WHERE drops blank docs (DuckDB splits '' to [''], one phantom
    # token); NULL text is dropped by the unnest itself. Matches the
    # Spark side's NULL-signature filter for zero-token documents.
    return f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
                  WHERE length(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g')) > 0),
    h AS (SELECT doc_id, {h_expr} AS h FROM toks),
    votes AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id)
    SELECT doc_id, {concat} AS simhash FROM votes
    """


@register(
    "simhash_signatures",
    _simhash_oracle(16),
    doc="16-bit SimHash signatures from md5-digit token votes; "
    "near-duplicates differ in few bits (hamming ≤ 2-3).",
    bench=True,
)
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.simhash_signatures(_t(spark, sf_dir, "documents"), "doc_id", "text", bits=16)


def _simhash_pairs_oracle(bits: int = 16, n_bands: int = 4, max_hamming: int = 2) -> str:
    width = bits // n_bands
    ham = " + ".join(
        f"CASE WHEN substring(sa, {j + 1}, 1) <> substring(sb, {j + 1}, 1) "
        f"THEN 1 ELSE 0 END"
        for j in range(bits)
    )
    band_list = ", ".join(str(b) for b in range(n_bands))
    return f"""
    WITH sigs AS ({_simhash_oracle(bits)}),
    bands AS (
        SELECT doc_id, simhash, b.b AS band,
               substring(simhash, b.b * {width} + 1, {width}) AS sub_sig
        FROM sigs, (SELECT unnest([{band_list}]) AS b) b),
    pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                        a.simhash AS sa, b.simhash AS sb
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.sub_sig = b.sub_sig AND a.doc_id < b.doc_id),
    h AS (SELECT id_a, id_b, sa, sb, CAST({ham} AS INTEGER) AS hamming FROM pairs)
    SELECT id_a, id_b, sa AS sig_a, sb AS sig_b, hamming
    FROM h WHERE hamming <= {max_hamming}
    """


@register(
    "simhash_near_pairs",
    _simhash_pairs_oracle(bits=64, n_bands=4, max_hamming=3),
    doc="Banded-SimHash near-dup pairs: 4 sub-signature bands generate "
    "candidates (pigeonhole guarantees recall for hamming < 4), exact "
    "hamming <= 3 filters — signatures/bands in-row, one shuffle on "
    "(band, sub_sig), signature rides through the bucket AS A LONG so "
    "hamming is one xor+popcount and the pair-distinct runs AFTER the "
    "hamming filter (near-dups are rare; candidates are not). "
    "64-bit signatures / 16-bit bands: 65k bucket values per band keep "
    "buckets sparse, so candidate volume tracks true collisions — the "
    "32-bit/8-bit parameterization bucketed ~2M candidate pairs on this "
    "corpus (256 values per band force dense buckets; pair expansion is "
    "quadratic in bucket size), measured 4x slower end-to-end. "
    "Signature width is the knob that buys bucket sparsity.",
    bench=True,
)
def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.simhash_near_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", bits=64, n_bands=4,
        max_hamming=3,
    )


# ---------------------------------------------------------------------------
# Vector operators
# ---------------------------------------------------------------------------


@register(
    "weighted_vec_avg",
    f"""
    WITH ex AS (
        SELECT label, CAST(vec_id % 7 + 1 AS DOUBLE) AS w, pos, v FROM ({_EMB_LONG}))
    SELECT label, CAST(pos AS INTEGER) AS dim,
           round(sum(v * w) / sum(w), 6) AS wavg
    FROM ex GROUP BY label, pos
    """,
    doc="THE reference's signature aggregate: SUM(vector*w)/SUM(w) "
    "elementwise per group (clustering/helpers.py:30, pgvector overloads) "
    "— posexplode + (group,dim)-keyed partial aggregation; long-format "
    "output for engine-independent comparison.",
    bench=True,
)
def weighted_vec_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").withColumn(
        "w", (F.col("vec_id") % 7 + 1).cast("double")
    )
    ex = e.select(
        "label", "w", F.posexplode(F.col("embedding")).alias("pos", "v")
    ).withColumn("v", F.col("v").cast("double"))
    return (
        ex.groupBy("label", "pos")
        .agg(F.round(F.sum(F.col("v") * F.col("w")) / F.sum("w"), 6).alias("wavg"))
        .select("label", F.col("pos").alias("dim"), "wavg")
    )


@register(
    "vector_norm_stats",
    f"""
    WITH norms AS (
        SELECT vec_id, label, sqrt(sum(v * v)) AS nrm
        FROM ({_EMB_LONG}) GROUP BY vec_id, label)
    SELECT label,
           round(avg(nrm), 6) AS avg_norm,
           round(min(nrm), 6) AS min_norm,
           round(max(nrm), 6) AS max_norm,
           CAST(count(*) AS BIGINT) AS n_vecs
    FROM norms GROUP BY label
    """,
    doc="L2-norm stats per label — vector math as Catalyst HOFs "
    "(functions/vector.py), float64 accumulation.",
)
def vector_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    return (
        e.select("label", V.l2_norm("embedding").alias("nrm"))
        .groupBy("label")
        .agg(
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
            F.count("*").alias("n_vecs"),
        )
    )


@register(
    "cosine_topk",
    f"""
    WITH ex AS (SELECT vec_id, pos, v FROM ({_EMB_LONG})),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM ex GROUP BY vec_id),
    dots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, sum(q.v * c.v) AS dot
        FROM ex q JOIN ex c ON q.pos = c.pos AND q.vec_id <> c.vec_id
        WHERE q.vec_id < 10
        GROUP BY 1, 2),
    scored AS (
        SELECT query_id, neighbor_id,
               round(d.dot / (nq.nrm * nc.nrm), 6) AS sim
        FROM dots d
        JOIN norms nq ON d.query_id = nq.vec_id
        JOIN norms nc ON d.neighbor_id = nc.vec_id)
    SELECT * FROM (
        SELECT query_id, neighbor_id, sim,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk
        FROM scored)
    WHERE rnk <= 5
    """,
    doc="W2 exact cosine top-k (clustering/helpers.py:185-226): brute-force "
    "baseline — broadcast query set, corpus scanned once, rank by rounded "
    "sim so ranking is engine-stable. Scale path: lsh_bucket_topk.",
    bench=True,
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10)
    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec"))
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(V.cosine_similarity("q_vec", "c_vec"), 6))
        .select("query_id", "neighbor_id", "sim")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return scored.withColumn("rnk", F.row_number().over(w).cast("bigint")).filter(
        F.col("rnk") <= 5
    )


@register(
    "embedding_near_dup",
    f"""
    WITH ex AS (SELECT vec_id, pos, v FROM ({_EMB_LONG})),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM ex GROUP BY vec_id),
    dots AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.v * b.v) AS dot
        FROM ex a JOIN ex b ON a.pos = b.pos AND a.vec_id < b.vec_id
        GROUP BY 1, 2)
    SELECT id_a, id_b, round(d.dot / (na.nrm * nb.nrm), 6) AS cos_sim
    FROM dots d
    JOIN norms na ON d.id_a = na.vec_id
    JOIN norms nb ON d.id_b = nb.vec_id
    WHERE round(d.dot / (na.nrm * nb.nrm), 6) >= 0.4
    """,
    doc="Embedding-cosine near-duplicate pairs, exact, via distributed "
    "block matrix multiply (applyInPandas + BLAS per block pair) — the "
    "dense scale path; the dimension-exploded longform remains as the "
    "sparse-friendly variant and the oracle formulation.",
    bench=True,
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SIM.pairwise_cosine_blocked(
        _t(spark, sf_dir, "embeddings"),
        "vec_id",
        "embedding",
        threshold=0.4,
        sim_round=6,
    )


@register(
    "tfidf_top_terms",
    f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS doc_freq
              FROM tf GROUP BY 1),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
        SELECT t.doc_id, t.term, t.tf, d.doc_freq,
               t.tf * ln((n.n_docs + 1.0) / (d.doc_freq + 1.0)) AS tfidf
        FROM tf t JOIN dfreq d USING (term) CROSS JOIN n),
    ranked AS (
        SELECT *, row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
        FROM scored)
    SELECT doc_id, term, tf, doc_freq, round(tfidf, 6) AS tfidf,
           CAST(rn AS INTEGER) AS term_rank
    FROM ranked WHERE rn <= 3
    """,
    doc="Beyond-reference TF-IDF document featurization: top-3 terms per "
    "document by smoothed tf·idf (operators/tfidf.py). Map-side-combined "
    "tf/df aggregations; the tf⋈df join shuffles on the well-spread term "
    "key (a 100 TB vocabulary cannot broadcast); scalar corpus size rides "
    "a broadcast; ties break on term for determinism.",
    bench=True,
)
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.tfidf import tfidf_top_terms

    out = tfidf_top_terms(_t(spark, sf_dir, "documents"), "doc_id", "text", k=3)
    return out.select(
        "doc_id",
        "term",
        "tf",
        "doc_freq",
        F.round("tfidf", 6).alias("tfidf"),
        F.col("rank").alias("term_rank"),
    )


_BM25_TERMS = ["spark", "query", "table"]

# guarded tokens: NULL/blank text -> empty list (DuckDB splits '' to [''])
_TOKS_G = (
    f"CASE WHEN text IS NULL OR length(regexp_replace(lower(text), "
    f"'^\\s+|\\s+$', '', 'g')) = 0 THEN CAST([] AS VARCHAR[]) "
    f"ELSE {_TOKS} END"
)


def _bm25_oracle(terms: list[str], k1: float = 1.2, b: float = 0.75) -> str:
    tfs = ", ".join(
        f"CAST(len(list_filter(l, x -> x = '{t}')) AS BIGINT) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    dfs = ", ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    score = " + ".join(
        f"ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * (tf_{i} * ({k1} + 1)) / (tf_{i} + {k1} * (1 - {b} + {b} * dl / avgdl))"
        for i in range(len(terms))
    )
    n_matches = " + ".join(f"tf_{i}" for i in range(len(terms)))
    return f"""
    WITH base AS (
        SELECT doc_id, CAST(len({_TOKS_G}) AS BIGINT) AS dl, {tfs}
        FROM (SELECT doc_id, {_TOKS_G} AS l, text FROM documents)),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               sum(dl) / count(*) AS avgdl, {dfs}
        FROM base)
    SELECT doc_id, dl, CAST({n_matches} AS BIGINT) AS n_matches,
           {score} AS bm25
    FROM base CROSS JOIN stats
    """


@register(
    "bm25_relevance",
    _bm25_oracle(_BM25_TERMS),
    doc="Okapi BM25 relevance of every document against a fixed query-term "
    "set: per-term tf as in-row filter counts (no explode anywhere), "
    "N/avgdl/df from ONE global aggregation broadcast back — "
    "scan → tiny-agg → broadcast → map at any corpus size. Integer-exact "
    "inputs make scores bit-identical across engines.",
    bench=True,
)
def bm25_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.tfidf import bm25_scores

    return bm25_scores(_t(spark, sf_dir, "documents"), _BM25_TERMS)


@register(
    "embedding_pooling",
    f"""
    WITH m AS (
        SELECT label, pos, max(v) AS mx, avg(v) AS mv
        FROM ({_EMB_LONG}) GROUP BY label, pos),
    n AS (SELECT label, sqrt(sum(mv * mv)) AS nrm FROM m GROUP BY label)
    SELECT m.label, CAST(m.pos AS INTEGER) AS dim,
           round(m.mx, 6) AS max_v,
           round(m.mv, 6) AS mean_v,
           round(m.mv / nullif(n.nrm, 0.0), 6) AS unit_mean_v
    FROM m JOIN n USING (label)
    """,
    doc="Per-group embedding pooling (functions/vector.py::"
    "pooled_vectors) — elementwise MAX, mean, and the L2-normalized "
    "mean (the centroid DIRECTION cosine retrieval compares against): "
    "the chunk→document / document→cluster rollup family next to the "
    "weighted mean (A1). One shuffle keyed (group, dim) with scalar "
    "accumulators; the normalizer is a tiny per-group reduction over "
    "already-aggregated means. Long-format output for "
    "engine-independent comparison.",
)
def embedding_pooling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "v")
    ).withColumn("v", F.col("v").cast("double"))
    m = ex.groupBy("label", "pos").agg(
        F.max("v").alias("mx"), F.avg("v").alias("mv")
    )
    n = m.groupBy("label").agg(
        F.sqrt(F.sum(F.col("mv") * F.col("mv"))).alias("nrm")
    )
    return m.join(F.broadcast(n), "label").select(
        "label",
        F.col("pos").cast("int").alias("dim"),
        F.round("mx", 6).alias("max_v"),
        F.round("mv", 6).alias("mean_v"),
        F.round(F.col("mv") / F.nullif(F.col("nrm"), F.lit(0.0)), 6).alias(
            "unit_mean_v"
        ),
    )


@register(
    "hard_negatives",
    f"""
    WITH ex AS (SELECT vec_id, label, pos, v FROM ({_EMB_LONG})),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM ex GROUP BY vec_id),
    q AS (SELECT DISTINCT vec_id, label FROM embeddings WHERE vec_id < 10),
    dots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               sum(qe.v * c.v) AS dot
        FROM q
        JOIN ex qe ON qe.vec_id = q.vec_id
        JOIN ex c ON c.pos = qe.pos AND c.vec_id <> q.vec_id
                  AND c.label <> q.label
        GROUP BY 1, 2),
    scored AS (
        SELECT d.query_id, d.neighbor_id,
               round(d.dot / (nq.nrm * nc.nrm), 6) AS sim
        FROM dots d
        JOIN norms nq ON d.query_id = nq.vec_id
        JOIN norms nc ON d.neighbor_id = nc.vec_id)
    SELECT query_id, neighbor_id, sim, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY sim DESC, neighbor_id) AS rnk
          FROM scored)
    WHERE rnk <= 5
    """,
    doc="Hard-negative mining for contrastive training: per anchor, the "
    "top-5 most-similar vectors with a DIFFERENT label — the examples "
    "a retrieval model learns the most from. Same broadcast-scan shape "
    "as cosine_topk with one extra label predicate pushed into the "
    "join condition, so negatives never materialize before the filter; "
    "at scale the ANN families (LSH/IVF/IVFPQ) nominate candidates and "
    "this exact pass re-ranks the sliver.",
)
def hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from ..functions.vector import cosine_similarity

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_vec"),
        F.col("label").alias("c_label"),
    )
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("query_id") != F.col("neighbor_id"))
            & (F.col("q_label") != F.col("c_label")),
        )
        .withColumn("sim", F.round(cosine_similarity("q_vec", "c_vec"), 6))
        .select("query_id", "neighbor_id", "sim")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return scored.withColumn(
        "rnk", F.row_number().over(w).cast("bigint")
    ).filter(F.col("rnk") <= 5)


@register(
    "pmi_cooccurrence",
    f"""
    WITH base AS (SELECT doc_id, {_TOKS} AS l0 FROM documents),
    g AS (SELECT doc_id,
                 CASE WHEN l0 IS NULL OR (len(l0) = 1 AND l0[1] = '')
                      THEN CAST([] AS VARCHAR[]) ELSE l0 END AS l
          FROM base),
    pr AS (SELECT unnest(flatten(list_transform(range(1, len(l)),
               i -> list_transform(range(i+1, least(i+2, len(l))+1),
                    j -> CASE WHEN l[i] <= l[j] THEN l[i] || ' ' || l[j]
                              ELSE l[j] || ' ' || l[i] END)))) AS pair
           FROM g WHERE len(l) >= 2),
    pc AS (SELECT pair, CAST(count(*) AS BIGINT) AS n_pair FROM pr GROUP BY pair),
    un AS (SELECT t, CAST(count(*) AS BIGINT) AS n_tok
           FROM (SELECT unnest(l) AS t FROM g) GROUP BY t),
    tot AS (SELECT (SELECT sum(n_pair) FROM pc) AS np,
                   (SELECT sum(n_tok) FROM un) AS nt),
    top AS (SELECT pair, n_pair FROM pc WHERE n_pair >= 5
            ORDER BY n_pair DESC, pair LIMIT 50)
    SELECT t.pair, t.n_pair,
           a.n_tok AS count_a, b.n_tok AS count_b,
           round(ln((t.n_pair / CAST(tot.np AS DOUBLE))
                    / ((a.n_tok / CAST(tot.nt AS DOUBLE))
                       * (b.n_tok / CAST(tot.nt AS DOUBLE)))), 6) AS pmi
    FROM top t
    JOIN un a ON a.t = string_split(t.pair, ' ')[1]
    JOIN un b ON b.t = string_split(t.pair, ' ')[2]
    CROSS JOIN tot
    """,
    doc="PMI collocation mining (operators/tfidf.py::pmi_pairs): token "
    "pairs co-occurring within a 2-token window, scored by pointwise "
    "mutual information — the phrase-discovery / count-based-embedding "
    "statistic. Pair generation is in-row (≤ window pairs per token, "
    "never an explode self-join); counts are map-side-combined hash "
    "aggs; selection is top-50 by exact integer count so membership is "
    "engine-deterministic, PMI reported alongside.",
bench=True,
)
def pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.tfidf import pmi_pairs

    return pmi_pairs(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        window=2,
        min_count=5,
        top_n=50,
    )


_RRF_K = 60
_RRF_CAND = 50


@register(
    "hybrid_rrf_search",
    f"""
    WITH bm AS ({{bm25}}),
    t50 AS (SELECT doc_id,
                   row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_text
            FROM bm ORDER BY bm25 DESC, doc_id LIMIT {_RRF_CAND}),
    ex AS ({_EMB_LONG}),
    q AS (SELECT pos, v FROM ex WHERE vec_id = 0),
    qn AS (SELECT sqrt(sum(v * v)) AS nrm FROM q),
    dots AS (SELECT c.vec_id, sum(c.v * q.v) AS dot
             FROM ex c JOIN q USING (pos) GROUP BY c.vec_id),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM ex GROUP BY vec_id),
    scored AS (SELECT d.vec_id,
                      round(d.dot / (n.nrm * qn.nrm), 6) AS sim
               FROM dots d JOIN norms n USING (vec_id) CROSS JOIN qn),
    v50 AS (SELECT vec_id,
                   row_number() OVER (ORDER BY sim DESC, vec_id) AS rank_vec
            FROM scored ORDER BY sim DESC, vec_id LIMIT {_RRF_CAND}),
    fused AS (SELECT coalesce(t.doc_id, v.vec_id) AS doc_id,
                     t.rank_text, v.rank_vec,
                     coalesce(1.0 / ({_RRF_K} + t.rank_text), 0.0)
                     + coalesce(1.0 / ({_RRF_K} + v.rank_vec), 0.0) AS rrf
              FROM t50 t FULL JOIN v50 v ON t.doc_id = v.vec_id)
    SELECT doc_id, CAST(rank_text AS INTEGER) AS rank_text,
           CAST(rank_vec AS INTEGER) AS rank_vec,
           round(rrf, 6) AS rrf_score,
           CAST(fused_rank AS INTEGER) AS fused_rank
    FROM (SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id)
                        AS fused_rank
          FROM fused)
    WHERE fused_rank <= 20
    """.format(bm25=_bm25_oracle(_BM25_TERMS)),
    doc="Hybrid retrieval serving: reciprocal-rank fusion "
    "(Cormack/Clarke/Buettcher 2009) of a lexical ranker (Okapi BM25 "
    "over the fixed query terms) and a dense ranker (cosine against "
    "the vec_id=0 query embedding, doc_id = vec_id) — THE standard "
    "two-tower search stack. Each ranker keeps only its top-50 via "
    "TakeOrderedAndProject (never a global window over the corpus; "
    "row_number runs on the 50-row candidate sets), the fuse is a "
    "full-outer join of two candidate lists with 1/(60+rank) "
    "contributions (absent = 0), top-20 by fused score. BM25 inputs "
    "are integer-exact and cosine is rounded to 6 before ranking, so "
    "both rankings are engine-deterministic; rrf is exact IEEE "
    "arithmetic on integer ranks.",
    bench=True,
)
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.tfidf import bm25_scores

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")

    bm = bm25_scores(docs, _BM25_TERMS)
    t_cand = bm.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(_RRF_CAND)
    t50 = t_cand.withColumn(
        "rank_text",
        F.row_number().over(W.orderBy(F.desc("bm25"), F.asc("doc_id"))),
    ).select("doc_id", "rank_text")

    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_vec"))
    scored = (
        emb.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(V.cosine_similarity("q_vec", "embedding"), 6).alias("sim"),
        )
    )
    v_cand = scored.orderBy(F.desc("sim"), F.asc("vec_id")).limit(_RRF_CAND)
    v50 = v_cand.withColumn(
        "rank_vec", F.row_number().over(W.orderBy(F.desc("sim"), F.asc("vec_id")))
    ).select(F.col("vec_id").alias("doc_id"), "rank_vec")

    fused = (
        t50.join(v50, "doc_id", "full_outer")
        .withColumn(
            "rrf",
            F.coalesce(1.0 / (_RRF_K + F.col("rank_text")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_K + F.col("rank_vec")), F.lit(0.0)),
        )
    )
    return (
        fused.withColumn(
            "fused_rank",
            F.row_number().over(W.orderBy(F.desc("rrf"), F.asc("doc_id"))),
        )
        .filter(F.col("fused_rank") <= 20)
        .select(
            "doc_id",
            F.col("rank_text").cast("int").alias("rank_text"),
            F.col("rank_vec").cast("int").alias("rank_vec"),
            F.round("rrf", 6).alias("rrf_score"),
            F.col("fused_rank").cast("int").alias("fused_rank"),
        )
    )


@register(
    "bpe_merge_candidates",
    f"""
    WITH base AS (SELECT {_TOKS_G} AS l FROM documents),
    prs AS (SELECT unnest(list_transform(range(1, len(l)),
                          i -> l[i] || ' ' || l[i+1])) AS pair
            FROM base WHERE len(l) >= 2),
    pc AS (SELECT pair, CAST(count(*) AS BIGINT) AS pair_count
           FROM prs GROUP BY pair),
    top AS (SELECT pair, pair_count FROM pc
            ORDER BY pair_count DESC, pair LIMIT 30)
    SELECT string_split(pair, ' ')[1] AS left_tok,
           string_split(pair, ' ')[2] AS right_tok,
           pair_count,
           CAST(row_number() OVER (ORDER BY pair_count DESC, pair)
                AS INTEGER) AS merge_rank
    FROM top
    """,
    doc="BPE-style merge-candidate mining: the 30 most frequent ADJACENT "
    "token pairs across the corpus — the statistic a byte-pair-encoding "
    "tokenizer trainer computes at every merge step (Sennrich et al. "
    "2016); distinct from pmi_cooccurrence, which scores windowed "
    "co-occurrence by information content, not adjacency count. Pair "
    "generation is an in-row HOF over the token array (never an "
    "explode self-join), counts are map-side-combined, selection is "
    "TakeOrderedAndProject on exact integer counts (pair-string "
    "tiebreak) with row_number only over the 30-row result.",
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = F.coalesce(
        TX.tokens(F.lower(F.col("text"))), F.array().cast("array<string>")
    )
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.element_at(toks, i + 1),
                                  F.element_at(toks, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pc = (
        docs.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").cast("long").alias("pair_count"))
    )
    top = pc.orderBy(F.desc("pair_count"), F.asc("pair")).limit(30)
    return (
        top.withColumn(
            "merge_rank",
            F.row_number()
            .over(W.orderBy(F.desc("pair_count"), F.asc("pair")))
            .cast("int"),
        )
        .select(
            F.split(F.col("pair"), " ").getItem(0).alias("left_tok"),
            F.split(F.col("pair"), " ").getItem(1).alias("right_tok"),
            "pair_count",
            "merge_rank",
        )
    )


_BPE_K = 12  # merges applied; bounded so the oracle recursion is too


@register(
    "bpe_apply_tokenize",
    f"""
    WITH RECURSIVE base AS (SELECT doc_id, {_TOKS_G} AS l FROM documents),
    prs AS (SELECT unnest(list_transform(range(1, len(l)),
                          i -> l[i] || ' ' || l[i+1])) AS pair
            FROM base WHERE len(l) >= 2),
    pc AS (SELECT pair, count(*) AS c FROM prs GROUP BY pair),
    top AS (SELECT pair, c FROM pc ORDER BY c DESC, pair LIMIT {_BPE_K}),
    merges AS MATERIALIZED (
      SELECT CAST(row_number() OVER (ORDER BY c DESC, pair) AS INTEGER)
                 AS merge_rank,
             ' ' || string_split(pair, ' ')[1] || '  ' ||
                 string_split(pair, ' ')[2] || ' ' AS pat,
             ' ' || string_split(pair, ' ')[1] || '~' ||
                 string_split(pair, ' ')[2] || ' ' AS rep
      FROM top),
    prep AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
             CASE WHEN len(l) = 0 THEN ''
                  ELSE ' ' || array_to_string(l, '  ') || ' ' END AS seq
             FROM base),
    app AS (SELECT doc_id, n_tokens, seq, 0 AS i FROM prep
            UNION ALL
            SELECT a.doc_id, a.n_tokens, replace(a.seq, m.pat, m.rep),
                   a.i + 1
            FROM app a JOIN merges m ON m.merge_rank = a.i + 1
            WHERE a.i < {_BPE_K}),
    fin AS (SELECT doc_id, n_tokens, seq,
            row_number() OVER (PARTITION BY doc_id ORDER BY i DESC) AS rn
            FROM app)
    SELECT doc_id, n_tokens,
           CASE WHEN n_tokens = 0 THEN 0
                ELSE CAST(len(string_split(trim(seq), '  ')) AS BIGINT)
                END AS n_bpe_tokens,
           n_tokens - CASE WHEN n_tokens = 0 THEN 0
                ELSE CAST(len(string_split(trim(seq), '  ')) AS BIGINT)
                END AS n_merges_applied
    FROM fin WHERE rn = 1
    """,
    doc="BPE merge-table APPLICATION — the serving half of "
    "bpe_merge_candidates' training statistic (Sennrich et al. 2016: "
    "apply learned merges in rank order). Each document's token "
    "sequence is encoded with DOUBLE-space separators and single-space "
    "edges, so applying merge (a,b)→a~b is a plain left-to-right "
    "replace of ' a  b ' with ' a~b ': adjacent matches never share a "
    "character, which makes Spark's replace() and DuckDB's replace() "
    "bit-identical, and neighbor spacing is preserved for later "
    "merges. Spark plan: mining is one map-side-combined pair count + "
    "TakeOrdered({k}); the {k} applications are broadcast single-row "
    "left joins with a JVM replace each — the CORPUS never shuffles "
    "and the whole apply chain is codegen'd map work, the shape that "
    "holds at 100 TB (merge table broadcast, one pass over the "
    "documents). Missing ranks (tiny corpora) no-op via coalesce; "
    "the oracle's recursion stops early the same way.".format(k=_BPE_K),
    bench=True,
)
def bpe_apply_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import repartition_for_compute

    docs = _t(spark, sf_dir, "documents")
    toks = F.coalesce(
        TX.tokens(F.lower(F.col("text"))), F.array().cast("array<string>")
    )
    # widen before tokenize/explode/replace: a single-file scan is one
    # partition, which ran both the merge mining and the apply chain
    # serially (r10 profile: 3.3 s CPU on one task)
    base = repartition_for_compute(docs.select("doc_id", "text")).select(
        "doc_id", toks.alias("l")
    )
    pairs = F.when(
        F.size("l") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("l") - 2),
            lambda i: F.concat_ws(" ", F.element_at(F.col("l"), i + 1),
                                  F.element_at(F.col("l"), i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    top = (
        base.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("pair"))
        .limit(_BPE_K)
    )
    # Bounded driver merge table (≤ _BPE_K tiny rows — the documented
    # ≤K-row collect pattern): the former formulation applied each
    # merge through a single-row broadcast LEFT join, which planned as
    # _BPE_K BroadcastNestedLoopJoins and paid _BPE_K broadcast-build
    # jobs per run (r10 stage profile: ~0.5 s of pure job overhead at
    # sf0.1). With the ranks in hand the whole apply chain folds into
    # ONE codegen'd projection of nested literal replace()s — the
    # corpus still never shuffles, and missing ranks (tiny corpora)
    # no-op by simply not appearing in the chain, exactly like the
    # coalesce no-op did.
    merge_rows = sorted(
        top.collect(), key=lambda r: (-r["c"], r["pair"])
    )
    seq = F.when(F.size("l") == 0, F.lit("")).otherwise(
        F.concat(F.lit(" "), F.array_join("l", "  "), F.lit(" "))
    )
    for row in merge_rows:
        l_tok, r_tok = row["pair"].split(" ")
        seq = F.replace(
            seq,
            F.lit(f" {l_tok}  {r_tok} "),
            F.lit(f" {l_tok}~{r_tok} "),
        )
    n_tokens = F.size("l").cast("long")
    n_after = F.when(n_tokens == 0, F.lit(0).cast("long")).otherwise(
        F.size(F.split(F.trim(seq), "  ")).cast("long")
    )
    return base.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_after.alias("n_bpe_tokens"),
        (n_tokens - n_after).alias("n_merges_applied"),
    )


_BPE_DEEP_K = 96  # above ARROW_APPLY_THRESHOLD: serves via the kernel


@register(
    "bpe_apply_deep",
    f"""
    WITH RECURSIVE base AS (SELECT doc_id, {_TOKS_G} AS l FROM documents),
    prs AS (SELECT unnest(list_transform(range(1, len(l)),
                          i -> l[i] || ' ' || l[i+1])) AS pair
            FROM base WHERE len(l) >= 2),
    pc AS (SELECT pair, count(*) AS c FROM prs
           WHERE NOT contains(pair, '~') GROUP BY pair),
    top AS (SELECT pair, c FROM pc ORDER BY c DESC, pair LIMIT {_BPE_DEEP_K}),
    merges AS MATERIALIZED (
      SELECT CAST(row_number() OVER (ORDER BY c DESC, pair) AS INTEGER)
                 AS merge_rank,
             ' ' || string_split(pair, ' ')[1] || '  ' ||
                 string_split(pair, ' ')[2] || ' ' AS pat,
             ' ' || string_split(pair, ' ')[1] || '~' ||
                 string_split(pair, ' ')[2] || ' ' AS rep
      FROM top),
    prep AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
             CASE WHEN len(l) = 0 THEN ''
                  ELSE ' ' || array_to_string(l, '  ') || ' ' END AS seq
             FROM base),
    app AS (SELECT doc_id, n_tokens, seq, 0 AS i FROM prep
            UNION ALL
            SELECT a.doc_id, a.n_tokens, replace(a.seq, m.pat, m.rep),
                   a.i + 1
            FROM app a JOIN merges m ON m.merge_rank = a.i + 1
            WHERE a.i < {_BPE_DEEP_K}),
    fin AS (SELECT doc_id, n_tokens, seq,
            row_number() OVER (PARTITION BY doc_id ORDER BY i DESC) AS rn
            FROM app)
    SELECT doc_id, n_tokens,
           CASE WHEN n_tokens = 0 THEN 0
                ELSE CAST(len(string_split(trim(seq), '  ')) AS BIGINT)
                END AS n_bpe_tokens,
           n_tokens - CASE WHEN n_tokens = 0 THEN 0
                ELSE CAST(len(string_split(trim(seq), '  ')) AS BIGINT)
                END AS n_merges_applied
    FROM fin WHERE rn = 1
    """,
    doc=f"Production-depth merge application through the ARROW KERNEL "
    f"(round 6): {_BPE_DEEP_K} mined merges — above apply_merges' "
    f"64-merge literal-chain cap, so this row serves via the constant-"
    f"plan-depth Arrow arm (operators/tokenizer.py) and the oracle's "
    f"rank-parameterized recursive CTE pins the kernel's semantics on "
    f"real corpus data, complementing the property test that pins the "
    f"two arms bit-identical. The merge table is a bounded collect "
    f"(top-{_BPE_DEEP_K} pairs — TakeOrdered, corpus-size-independent) "
    f"broadcast into one Arrow pass over the documents; pairs touching "
    f"'~'-bearing tokens are excluded in both engines (a merged symbol "
    f"must never collide with an original token — the arm-equivalence "
    f"precondition). Zero-token docs no-op through the kernel's exact-"
    f"literal fallback.",
)
def bpe_apply_deep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.tokenizer import apply_merges

    docs = _t(spark, sf_dir, "documents")
    toks = F.coalesce(
        TX.tokens(F.lower(F.col("text"))), F.array().cast("array<string>")
    )
    base = docs.select("doc_id", toks.alias("l"))
    pairs = F.when(
        F.size("l") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("l") - 2),
            lambda i: F.concat_ws(" ", F.element_at(F.col("l"), i + 1),
                                  F.element_at(F.col("l"), i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    top = (
        base.select(F.explode(pairs).alias("pair"))
        .filter(~F.col("pair").contains("~"))
        .groupBy("pair")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("pair"))
        .limit(_BPE_DEEP_K)
        .collect()  # bounded: ≤ K rows regardless of corpus size
    )
    merges = [tuple(r["pair"].split(" ", 1)) for r in top]
    cur = base.select(
        "doc_id",
        F.size("l").cast("long").alias("n_tokens"),
        F.when(F.size("l") == 0, F.lit("")).otherwise(
            F.concat(F.lit(" "), F.array_join("l", "  "), F.lit(" "))
        ).alias("seq"),
    )
    ap = apply_merges(cur, merges)
    n_after = F.when(F.col("n_tokens") == 0, F.lit(0).cast("long")).otherwise(
        F.size(F.split(F.trim(F.col("seq")), "  ")).cast("long")
    )
    return ap.select(
        "doc_id",
        "n_tokens",
        n_after.alias("n_bpe_tokens"),
        (F.col("n_tokens") - n_after).alias("n_merges_applied"),
    )


_BPE_TRAIN_K = 8  # merges learned; bounds the oracle's unrolled rounds
_BPE_TRAIN_V = 400  # vocab cap (freq desc, word asc) — the trainer's bound


def _bpe_train_parts(k: int = _BPE_TRAIN_K, v: int = _BPE_TRAIN_V) -> list[str]:
    """CTE chain of the unrolled trainer — shared by the train oracle
    and the composed compression oracle.

    Round r: weighted adjacent-pair counts over w{r-1}'s double-space
    symbol sequences → 1-row argmax t{r} (count desc, pair asc) →
    w{r} applies it with the same replace() the Spark side uses.
    MATERIALIZED everywhere w{r} is referenced twice (pair counts +
    apply) — the kcore lesson. LEFT JOIN ON TRUE keeps w{r} populated
    when a round runs dry (tiny/empty corpora), so later rounds emit
    no rows instead of erroring, matching the Spark early-break.
    """
    parts = [
        f"wf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM ("
        f"SELECT unnest({_TOKS_G}) AS word FROM documents) GROUP BY word)",
        f"vocab AS (SELECT word, freq FROM wf"
        f" ORDER BY freq DESC, word LIMIT {v})",
        "w0 AS MATERIALIZED (SELECT freq,"
        " ' ' || array_to_string(regexp_extract_all(word, '.'), '  ') || ' '"
        " AS seq FROM vocab)",
    ]
    for r in range(1, k + 1):
        parts.append(
            f"pc{r} AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM ("
            f"SELECT freq, unnest(CASE WHEN len(sy) >= 2 THEN"
            f" list_transform(range(1, len(sy)), i -> sy[i] || ' ' || sy[i+1])"
            f" ELSE CAST([] AS VARCHAR[]) END) AS pair FROM ("
            f"SELECT freq, string_split(trim(seq), '  ') AS sy FROM w{r-1}))"
            f" GROUP BY pair)"
        )
        parts.append(
            f"t{r} AS MATERIALIZED (SELECT pair, cnt,"
            f" string_split(pair, ' ')[1] AS l, string_split(pair, ' ')[2] AS r"
            f" FROM pc{r} ORDER BY cnt DESC, pair LIMIT 1)"
        )
        if r < k:
            parts.append(
                f"w{r} AS MATERIALIZED (SELECT w.freq,"
                f" coalesce(replace(w.seq,"
                f" ' ' || t.l || '  ' || t.r || ' ',"
                f" ' ' || t.l || '~' || t.r || ' '), w.seq) AS seq"
                f" FROM w{r-1} w LEFT JOIN t{r} t ON TRUE)"
            )
    return parts


def _bpe_train_oracle(k: int = _BPE_TRAIN_K, v: int = _BPE_TRAIN_V) -> str:
    rows = " UNION ALL ".join(
        f"SELECT CAST({r} AS INTEGER) AS merge_rank, l AS left_sym,"
        f" r AS right_sym, l || '~' || r AS merged_sym,"
        f" cnt AS pair_count FROM t{r}"
        for r in range(1, k + 1)
    )
    return "WITH " + ",\n    ".join(_bpe_train_parts(k, v)) + f"\n    {rows}"


@register(
    "bpe_train_merges",
    _bpe_train_oracle(),
    doc="TRUE character-level BPE tokenizer training (Sennrich et al. "
    "2016), the full algorithm rather than bpe_merge_candidates' "
    "single statistic: lowercased word frequencies → top-"
    f"{_BPE_TRAIN_V} vocabulary → {_BPE_TRAIN_K} merge rounds of "
    "frequency-weighted adjacent-symbol-pair argmax + greedy replace "
    "apply (double-space encoding, engine-exact). The 100 TB shape of "
    "every production trainer (subword-nmt/HF/SentencePiece): the "
    "corpus contributes ONE map-side-combined word-count shuffle — "
    "the only data-volume-scaled stage — plus a TakeOrdered vocab cap; "
    "the merge loop runs on the collected word table, bounded at "
    f"{_BPE_TRAIN_V} rows BY CONSTRUCTION (the trainer's explicit "
    "memory budget; the cluster-counts-words / one-process-learns "
    "split every real trainer uses — a distributed round loop "
    "measured 8× slower on pure per-round scheduler cost). "
    "operators/tokenizer.py::train_bpe; property-tested against an "
    "independent Sennrich loop in tests/test_tokenizer.py. Not bench-"
    "flagged: bpe_compression_by_source trains AND applies, so it is "
    "the headline tokenizer entry.",
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.tokenizer import train_bpe_merges, word_frequencies

    wf = word_frequencies(_t(spark, sf_dir, "documents"))
    return train_bpe_merges(wf, n_merges=_BPE_TRAIN_K, max_words=_BPE_TRAIN_V)


def _bpe_compression_oracle(k: int = _BPE_TRAIN_K, v: int = _BPE_TRAIN_V) -> str:
    """Train oracle's CTE chain + recursive merge application over the
    per-source distinct-word table + per-source rollup."""
    parts = _bpe_train_parts(k, v)
    merges_union = " UNION ALL ".join(
        f"SELECT CAST({r} AS INTEGER) AS merge_rank,"
        f" ' ' || l || '  ' || r || ' ' AS pat,"
        f" ' ' || l || '~' || r || ' ' AS rep FROM t{r}"
        for r in range(1, k + 1)
    )
    parts.append(f"merges AS MATERIALIZED ({merges_union})")
    parts.append(
        f"wsrc AS (SELECT source, word, CAST(count(*) AS BIGINT) AS cnt"
        f" FROM (SELECT source, unnest({_TOKS_G}) AS word FROM documents)"
        f" GROUP BY 1, 2)"
    )
    parts.append(
        "prep AS (SELECT source, word, cnt,"
        " ' ' || array_to_string(regexp_extract_all(word, '.'), '  ') || ' '"
        " AS seq FROM wsrc)"
    )
    parts.append(
        f"app AS (SELECT source, word, cnt, seq, 0 AS i FROM prep"
        f" UNION ALL"
        f" SELECT a.source, a.word, a.cnt, replace(a.seq, m.pat, m.rep),"
        f" a.i + 1 FROM app a JOIN merges m ON m.merge_rank = a.i + 1"
        f" WHERE a.i < {k})"
    )
    parts.append(
        "fin AS (SELECT source, word, cnt, seq,"
        " row_number() OVER (PARTITION BY source, word ORDER BY i DESC)"
        " AS rn FROM app)"
    )
    nsym = "len(string_split(trim(seq), '  '))"
    return (
        "WITH RECURSIVE "
        + ",\n    ".join(parts)
        + f"""
    SELECT source,
           CAST(sum(cnt) AS BIGINT) AS n_word_occurrences,
           CAST(sum(cnt * length(word)) AS BIGINT) AS n_chars,
           CAST(sum(cnt * {nsym}) AS BIGINT) AS n_bpe_tokens,
           round(sum(cnt * length(word))
                 / CAST(sum(cnt * {nsym}) AS DOUBLE), 6) AS chars_per_token,
           round(sum(cnt * {nsym})
                 / CAST(sum(cnt) AS DOUBLE), 6) AS fertility
    FROM fin WHERE rn = 1 GROUP BY source ORDER BY source"""
    )


@register(
    "bpe_compression_by_source",
    _bpe_compression_oracle(),
    doc="Full tokenizer lifecycle — train, apply, EVALUATE: the "
    f"{_BPE_TRAIN_K} learned merges are applied once per DISTINCT "
    "(source, word) — never per occurrence — and the per-source "
    "rollup weights by word frequency: chars-per-BPE-token "
    "(compression) and subwords-per-word (fertility), the two numbers "
    "that say whether a tokenizer fits a data source (a drifting "
    "source shows rising fertility before anything else). Scale "
    "shape: one corpus pass builds the (source, word) frequency table "
    "(map-side combined, localCheckpointed, reused by training and "
    "evaluation); merge application is in-row literal replace over "
    "the VOCAB-BOUNDED table — |sources| × |vocab| rows regardless of "
    "corpus bytes. Oracle composes the unrolled trainer with the "
    "recursive-CTE apply. operators/tokenizer.py.",
    bench=True,
)
def bpe_compression_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.tokenizer import apply_merges, train_bpe
    from ..session import repartition_for_compute

    docs = _t(spark, sf_dir, "documents")
    toks = F.coalesce(
        TX.tokens(F.lower(F.col("text"))), F.array().cast("array<string>")
    )
    wsrc = (
        repartition_for_compute(docs.select("source", "text"))
        .select("source", F.explode(toks).alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint()  # vocab-bounded; feeds training AND evaluation
    )
    wf = wsrc.groupBy("word").agg(F.sum("cnt").cast("long").alias("freq"))
    merges = train_bpe(wf, n_merges=_BPE_TRAIN_K, max_words=_BPE_TRAIN_V)
    prep = wsrc.select(
        "source",
        "word",
        "cnt",
        F.concat(
            F.lit(" "),
            F.array_join(F.regexp_extract_all(F.col("word"), F.lit("."), 0), "  "),
            F.lit(" "),
        ).alias("seq"),
    )
    ap = apply_merges(prep, [(m[1], m[2]) for m in merges])
    nsym = F.size(F.split(F.trim(F.col("seq")), "  ")).cast("long")
    n_chars = F.sum(F.col("cnt") * F.length("word"))
    n_bpe = F.sum(F.col("cnt") * nsym)
    return (
        ap.groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_word_occurrences"),
            n_chars.cast("long").alias("n_chars"),
            n_bpe.cast("long").alias("n_bpe_tokens"),
            F.round(n_chars / n_bpe.cast("double"), 6).alias("chars_per_token"),
            F.round(n_bpe / F.sum("cnt").cast("double"), 6).alias("fertility"),
        )
        .orderBy("source")
    )


def _mmr_oracle(k: int = 10, cand: int = 50, lam: float = 0.7) -> str:
    # (1.0 - {lam}) spelled as the SUBTRACTION, not its decimal value:
    # Spark computes lit(1.0 - 0.7) in IEEE (0.30000000000000004) and
    # the oracle must hit the same bits.
    parts = [
        f"ex AS ({_EMB_LONG})",
        "q AS (SELECT pos, v FROM ex WHERE vec_id = 0)",
        "qn AS (SELECT sqrt(sum(v * v)) AS nrm FROM q)",
        "norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm"
        " FROM ex GROUP BY vec_id)",
        "dots AS (SELECT c.vec_id, sum(c.v * q.v) AS dot"
        " FROM ex c JOIN q USING (pos) GROUP BY c.vec_id)",
        "relv AS (SELECT d.vec_id, round(d.dot / (n.nrm * qn.nrm), 6) AS rel"
        " FROM dots d JOIN norms n USING (vec_id) CROSS JOIN qn)",
        f"cand AS MATERIALIZED (SELECT vec_id, rel FROM relv"
        f" ORDER BY rel DESC, vec_id LIMIT {cand})",
        "cd AS (SELECT e.vec_id, e.pos, e.v FROM ex e"
        " JOIN cand c USING (vec_id))",
        "pwd AS (SELECT a.vec_id AS ia, b.vec_id AS ib, sum(a.v * b.v) AS dot"
        " FROM cd a JOIN cd b ON a.pos = b.pos AND a.vec_id <> b.vec_id"
        " GROUP BY 1, 2)",
        "pw AS MATERIALIZED (SELECT ia, ib,"
        " round(d.dot / (na.nrm * nb.nrm), 6) AS s"
        " FROM pwd d JOIN norms na ON d.ia = na.vec_id"
        " JOIN norms nb ON d.ib = nb.vec_id)",
        "s1 AS MATERIALIZED (SELECT vec_id, rel, rel AS mmr_score,"
        " 1 AS mmr_rank FROM cand ORDER BY rel DESC, vec_id LIMIT 1)",
    ]
    prev = "s1"
    for r in range(2, k + 1):
        parts.append(
            f"p{r} AS MATERIALIZED ("
            f"SELECT c.vec_id, c.rel,"
            f" {lam} * c.rel - (1.0 - {lam}) * mx.m AS mmr_score,"
            f" {r} AS mmr_rank"
            f" FROM cand c"
            f" JOIN (SELECT ia, max(s) AS m FROM pw"
            f" WHERE ib IN (SELECT vec_id FROM {prev}) GROUP BY ia) mx"
            f" ON mx.ia = c.vec_id"
            f" WHERE c.vec_id NOT IN (SELECT vec_id FROM {prev})"
            f" ORDER BY {lam} * c.rel - (1.0 - {lam}) * mx.m DESC, c.vec_id"
            f" LIMIT 1)"
        )
        parts.append(
            f"s{r} AS MATERIALIZED (SELECT * FROM {prev}"
            f" UNION ALL SELECT * FROM p{r})"
        )
        prev = f"s{r}"
    return (
        "WITH " + ",\n    ".join(parts)
        + f"\n    SELECT vec_id, CAST(mmr_rank AS INTEGER) AS mmr_rank, rel,"
        f" round(mmr_score, 6) AS mmr_score FROM {prev}"
    )


@register(
    "mmr_diversify_topk",
    _mmr_oracle(k=10, cand=50, lam=0.7),
    doc="Maximal-marginal-relevance diversified top-10 (Carbonell & "
    "Goldstein 1998) from a 50-candidate cosine page against the "
    "vec_id=0 query — the serving-side rerank that trades relevance "
    "against redundancy (lambda=0.7), the standard answer to "
    "near-duplicate result pages. operators/similarity.py::"
    "mmr_diversify: candidate page via TakeOrderedAndProject, "
    "pairwise sims a broadcast self-join of the BOUNDED page, greedy "
    "selection k-1 unrolled rounds over those metadata-sized "
    "relations (anti-join picked, join pairwise max, TakeOrdered 1) "
    "— no driver collect, cost independent of corpus size. Oracle "
    "replays the greedy recurrence as unrolled MATERIALIZED CTEs; "
    "sims round to 6 before every argmax, ties to id.",
)
def mmr_diversify_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select("embedding")
    return SIM.mmr_diversify(
        emb, query, id_col="vec_id", vec_col="embedding",
        k=10, n_candidates=50, lam=0.7,
    )


from .registry import QUERY_REGISTRY as _REGQ  # noqa: E402  (cosine_topk
# is registered above; composition below only reads earlier entries)

_MRL_DIM = 16


@register(
    "matryoshka_recall",
    f"""
    WITH exact AS ({{exact}}),
    ex AS (SELECT vec_id, pos, v FROM ({_EMB_LONG}) WHERE pos < {_MRL_DIM}),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM ex GROUP BY vec_id),
    dots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               sum(q.v * c.v) AS dot
        FROM ex q JOIN ex c ON q.pos = c.pos AND q.vec_id <> c.vec_id
        WHERE q.vec_id < 10
        GROUP BY 1, 2),
    scored AS (
        SELECT query_id, neighbor_id,
               round(d.dot / (nq.nrm * nc.nrm), 6) AS sim
        FROM dots d
        JOIN norms nq ON d.query_id = nq.vec_id
        JOIN norms nc ON d.neighbor_id = nc.vec_id),
    trunc5 AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id) AS rnk
            FROM scored)
        WHERE rnk <= 5),
    hits AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_overlap
             FROM exact e JOIN trunc5 t
               ON e.query_id = t.query_id
              AND e.neighbor_id = t.neighbor_id
             GROUP BY 1)
    SELECT q.query_id,
           coalesce(h.n_overlap, 0) AS n_overlap,
           round(coalesce(h.n_overlap, 0) / 5.0, 6) AS recall_at_5
    FROM (SELECT DISTINCT query_id FROM exact) q
    LEFT JOIN hits h USING (query_id)
    """.format(exact=_REGQ["cosine_topk"].oracle),
    doc="Matryoshka-embedding retrieval self-diagnostic (Kusupati et "
    "al. 2022): rank by cosine over only the FIRST 16 of 64 dims (the "
    "MRL prefix a serving tier uses at 4x less memory bandwidth) and "
    "report per-query top-5 overlap against the full-dim exact "
    "ranking — the measured answer to 'how much recall does prefix "
    "truncation cost on THIS corpus'. Same shape as ann_recall_at_k: "
    "the truncated ranking is a broadcast-query scan over sliced "
    "vectors, the oracle composes the registered cosine_topk oracle "
    "as a CTE. Queries missing from the truncated top-5 entirely "
    "still report (recall 0) via the left join.",
)
def matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    trunc = e.select(
        "vec_id", F.slice("embedding", 1, _MRL_DIM).alias("embedding")
    )
    q = trunc.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    c = trunc.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(V.cosine_similarity("q_vec", "c_vec"), 6))
        .select("query_id", "neighbor_id", "sim")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    trunc5 = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id")
    )
    exact = _REGQ["cosine_topk"].fn(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    hits = (
        exact.join(trunc5, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_overlap"))
    )
    qs = exact.select("query_id").distinct()
    return qs.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
        F.round(F.coalesce("n_overlap", F.lit(0)) / 5.0, 6).alias("recall_at_5"),
    )


_SQ8_DQ = (
    "CASE WHEN mx = mn THEN mn"
    " ELSE mn + (least(255.0, floor((v - mn) * 256.0 / (mx - mn))) + 0.5)"
    " * (mx - mn) / 256.0 END"
)


@register(
    "sq8_quantization_recall",
    f"""
    WITH exact AS ({{exact}}),
    ex AS ({_EMB_LONG}),
    st AS (SELECT pos, min(v) AS mn, max(v) AS mx FROM ex GROUP BY pos),
    dq AS (SELECT vec_id, e.pos, {_SQ8_DQ} AS v
           FROM ex e JOIN st USING (pos)),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM dq GROUP BY vec_id),
    dots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               sum(q.v * c.v) AS dot
        FROM dq q JOIN dq c ON q.pos = c.pos AND q.vec_id <> c.vec_id
        WHERE q.vec_id < 10
        GROUP BY 1, 2),
    scored AS (
        SELECT query_id, neighbor_id,
               round(d.dot / (nq.nrm * nc.nrm), 6) AS sim
        FROM dots d
        JOIN norms nq ON d.query_id = nq.vec_id
        JOIN norms nc ON d.neighbor_id = nc.vec_id),
    trunc5 AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id) AS rnk
            FROM scored)
        WHERE rnk <= 5),
    hits AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_overlap
             FROM exact e JOIN trunc5 t
               ON e.query_id = t.query_id
              AND e.neighbor_id = t.neighbor_id
             GROUP BY 1)
    SELECT q.query_id,
           coalesce(h.n_overlap, 0) AS n_overlap,
           round(coalesce(h.n_overlap, 0) / 5.0, 6) AS recall_at_5
    FROM (SELECT DISTINCT query_id FROM exact) q
    LEFT JOIN hits h USING (query_id)
    """.format(exact=_REGQ["cosine_topk"].oracle),
    doc="Int8 scalar-quantization retrieval self-diagnostic — the "
    "third point on the repo's quantization curve (PQ subspace "
    "codes, Matryoshka prefix truncation, now SQ8 per-dimension "
    "8-bit): each dimension maps to floor-of-256-bins between the "
    "corpus per-dim min/max (one tiny global aggregate, broadcast "
    "back as two 64-double arrays — 4x memory-bandwidth saving at "
    "serving time), ranks by cosine over midpoint-dequantized "
    "vectors, and reports per-query top-5 overlap against the exact "
    "full-precision ranking. Quantize-dequantize is in-row transform("
    ") arithmetic — floor/least only, no round-half parity risk; the "
    "oracle replays the identical expression in long format and "
    "composes the registered cosine_topk oracle for the exact side.",
)
def sq8_quantization_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    long = e.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>"))
    ).toDF("vec_id", "pos", "v")
    stats = (
        long.groupBy("pos")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .agg(F.array_sort(F.collect_list(F.struct("pos", "mn", "mx"))).alias("s"))
        .select(
            F.transform("s", lambda x: x.mn).alias("mn_arr"),
            F.transform("s", lambda x: x.mx).alias("mx_arr"),
        )
    )

    def _dq(v, i):
        mn = F.element_at(F.col("mn_arr"), i + 1)
        mx = F.element_at(F.col("mx_arr"), i + 1)
        vd = v.cast("double")
        q = F.least(F.lit(255.0), F.floor((vd - mn) * F.lit(256.0) / (mx - mn)))
        return F.when(mx == mn, mn).otherwise(
            mn + (q + F.lit(0.5)) * (mx - mn) / F.lit(256.0)
        )

    dq = e.crossJoin(F.broadcast(stats)).select(
        "vec_id", F.transform("embedding", _dq).alias("dq")
    )
    q = dq.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("dq").alias("q_vec")
    )
    c = dq.select(
        F.col("vec_id").alias("neighbor_id"), F.col("dq").alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(V.cosine_similarity("q_vec", "c_vec"), 6))
        .select("query_id", "neighbor_id", "sim")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    trunc5 = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id")
    )
    exact = _REGQ["cosine_topk"].fn(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    hits = (
        exact.join(trunc5, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_overlap"))
    )
    qs = exact.select("query_id").distinct()
    return qs.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
        F.round(F.coalesce("n_overlap", F.lit(0)) / 5.0, 6).alias("recall_at_5"),
    )


def _minhash_est_error_oracle(num_hashes: int = 16, band_size: int = 4) -> str:
    from ..operators.dedup import MINHASH_P, minhash_coeffs

    mins = ", ".join(
        f"min(({a} * H + {b}) % {MINHASH_P}) AS mh{i}"
        for i, (a, b) in enumerate(minhash_coeffs(num_hashes))
    )
    n_bands = num_hashes // band_size
    band_rows = ", ".join(
        "({bi}, md5({cat}))".format(
            bi=bi,
            cat=" || '|' || ".join(
                f"CAST(mh{bi * band_size + j} AS VARCHAR)"
                for j in range(band_size)
            ),
        )
        for bi in range(n_bands)
    )
    est = " + ".join(
        f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END"
        for i in range(num_hashes)
    )
    return f"""
    WITH posts AS (SELECT DISTINCT doc_id, shingle FROM ({_SHINGLES})),
    hashed AS (
        SELECT doc_id,
               CAST(concat('0x', substring(md5(shingle), 1, 12)) AS BIGINT)
                   % {MINHASH_P} AS H
        FROM posts),
    sigs AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
    bands AS (
        SELECT doc_id, b.band, b.band_sig
        FROM sigs, LATERAL (VALUES {band_rows}) AS b(band, band_sig)),
    pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_sig = b.band_sig
         AND a.doc_id < b.doc_id),
    est AS (
        SELECT p.id_a, p.id_b, ({est}) / {num_hashes}.0 AS est
        FROM pairs p
        JOIN sigs sa ON sa.doc_id = p.id_a
        JOIN sigs sb ON sb.doc_id = p.id_b),
    sizes AS (SELECT doc_id, count(*) AS sz FROM posts GROUP BY doc_id),
    inter AS (
        SELECT p.id_a, p.id_b, CAST(count(*) AS BIGINT) AS n_inter
        FROM pairs p
        JOIN posts a ON a.doc_id = p.id_a
        JOIN posts b ON b.doc_id = p.id_b AND b.shingle = a.shingle
        GROUP BY 1, 2),
    tj AS (
        SELECT e.id_a, e.id_b, e.est,
               COALESCE(i.n_inter, 0) * 1.0
                   / (sa.sz + sb.sz - COALESCE(i.n_inter, 0)) AS truej
        FROM est e
        LEFT JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
        JOIN sizes sa ON e.id_a = sa.doc_id
        JOIN sizes sb ON e.id_b = sb.doc_id)
    SELECT CAST(least(CAST(floor(truej * 10) AS INTEGER), 9) AS INTEGER)
               AS sim_bin,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(truej), 6) AS mean_true_jaccard,
           round(avg(est), 6) AS mean_minhash_est,
           round(avg(abs(est - truej)), 6) AS mean_abs_err
    FROM tj GROUP BY 1
    """


@register(
    "minhash_estimate_error",
    _minhash_est_error_oracle(),
    doc="Dedup self-calibration: for every LSH candidate pair, the "
    "MinHash similarity ESTIMATE (fraction of matching signature "
    "positions — an unbiased Jaccard estimator, Broder 1997) against "
    "the TRUE shingle Jaccard, aggregated per true-similarity decile. "
    "This is the measurement that justifies a production threshold "
    "choice: it tells you the estimator's bias/spread exactly where "
    "the banding concentrates candidates. Plan: signatures and bands "
    "are in-row; true Jaccard is computed ONLY for candidate pairs "
    "(postings semi-joined down to candidate docs first), so the "
    "exact-verification cost tracks collisions, never n².",
)
def minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as DD

    docs = _t(spark, sf_dir, "documents")
    cands = DD.minhash_lsh_candidates(
        docs, "doc_id", "text", n=3, num_hashes=16, band_size=4
    ).localCheckpoint(eager=False)  # 3 consumers below
    sigs = DD.minhash_signatures(docs, "doc_id", "text", n=3, num_hashes=16)
    est = (
        cands.join(
            sigs.select(F.col("doc_id").alias("id_a"), F.col("mh").alias("ma")),
            "id_a",
        )
        .join(
            sigs.select(F.col("doc_id").alias("id_b"), F.col("mh").alias("mb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            (
                F.aggregate(
                    F.zip_with(
                        "ma", "mb",
                        lambda x, y: F.when(x == y, 1).otherwise(0),
                    ),
                    F.lit(0),
                    lambda acc, v: acc + v,
                )
                / F.lit(16.0)
            ).alias("est"),
        )
    )
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
    tj = (
        est.join(inter, ["id_a", "id_b"], "left")
        .withColumn("n_inter", F.coalesce("n_inter", F.lit(0)))
        .join(
            sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sza")),
            "id_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("szb")),
            "id_b",
        )
        .withColumn(
            "truej",
            F.col("n_inter") * 1.0
            / (F.col("sza") + F.col("szb") - F.col("n_inter")),
        )
        .withColumn("abs_err", F.abs(F.col("est") - F.col("truej")))
    )
    return tj.groupBy(
        F.least(F.floor(F.col("truej") * 10).cast("int"), F.lit(9))
        .cast("int")
        .alias("sim_bin")
    ).agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.round(F.avg("truej"), 6).alias("mean_true_jaccard"),
        F.round(F.avg("est"), 6).alias("mean_minhash_est"),
        F.round(F.avg("abs_err"), 6).alias("mean_abs_err"),
    )


@register(
    "token_burstiness",
    f"""
    WITH base AS (SELECT doc_id, {_TOKS_G} AS l FROM documents),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM base),
    wc AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS c
           FROM (SELECT doc_id, unnest(l) AS word FROM base)
           GROUP BY 1, 2),
    st AS (SELECT word,
                  CAST(count(*) AS BIGINT) AS n_docs_with,
                  CAST(sum(c) AS BIGINT) AS total_occ,
                  CAST(sum(c * c) AS BIGINT) AS sum_sq
           FROM wc GROUP BY word),
    top AS (SELECT word, n_docs_with, total_occ, sum_sq FROM st
            ORDER BY total_occ DESC, word LIMIT 50)
    SELECT word, n_docs_with, total_occ,
           round(total_occ / CAST(n_docs_with AS DOUBLE), 6) AS burstiness,
           round((CAST(sum_sq AS DOUBLE) / nd.n_docs
                  - (CAST(total_occ AS DOUBLE) / nd.n_docs)
                    * (CAST(total_occ AS DOUBLE) / nd.n_docs))
                 / (CAST(total_occ AS DOUBLE) / nd.n_docs), 6) AS vmr
    FROM top CROSS JOIN nd
    """,
    doc="Word BURSTINESS (Church & Gale 1995): for the 50 most frequent "
    "words, occurrences-per-containing-doc (Eb — function words sit "
    "near their per-doc rate, topical words burst) and the "
    "variance-to-mean ratio over ALL docs (VMR > 1 = over-dispersed "
    "vs Poisson — the statistical signature of topicality; the signal "
    "behind stopword-vs-keyword decisions and TF saturation). All "
    "moments accumulate as exact BIGINTs (count, Σc, Σc²) in one "
    "map-side-combined (doc, word) reduction + one word rollup — "
    "aggregation-order-deterministic at any parallelism; the corpus "
    "count rides a broadcast 1-row relation.",
)
def token_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import repartition_for_compute

    docs = _t(spark, sf_dir, "documents")
    toks = F.coalesce(
        TX.tokens(F.lower(F.col("text"))), F.array().cast("array<string>")
    )
    base = repartition_for_compute(docs.select("doc_id", "text")).select(
        "doc_id", toks.alias("l")
    )
    nd = base.agg(F.count("*").cast("long").alias("n_docs"))
    wc = (
        base.select("doc_id", F.explode("l").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").cast("long").alias("c"))
    )
    st = wc.groupBy("word").agg(
        F.count("*").cast("long").alias("n_docs_with"),
        F.sum("c").cast("long").alias("total_occ"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_sq"),
    )
    top = st.orderBy(F.desc("total_occ"), F.asc("word")).limit(50)
    mean = F.col("total_occ").cast("double") / F.col("n_docs")
    return top.crossJoin(F.broadcast(nd)).select(
        "word",
        "n_docs_with",
        "total_occ",
        F.round(
            F.col("total_occ") / F.col("n_docs_with").cast("double"), 6
        ).alias("burstiness"),
        F.round(
            (F.col("sum_sq").cast("double") / F.col("n_docs") - mean * mean)
            / mean,
            6,
        ).alias("vmr"),
    )


def _bpe_vocab_oracle(k: int = _BPE_TRAIN_K, v: int = _BPE_TRAIN_V) -> str:
    """Train CTE chain + recursive apply over ALL corpus words +
    frequency-weighted symbol rollup."""
    parts = _bpe_train_parts(k, v)
    merges_union = " UNION ALL ".join(
        f"SELECT CAST({r} AS INTEGER) AS merge_rank,"
        f" ' ' || l || '  ' || r || ' ' AS pat,"
        f" ' ' || l || '~' || r || ' ' AS rep FROM t{r}"
        for r in range(1, k + 1)
    )
    parts.append(f"merges AS MATERIALIZED ({merges_union})")
    parts.append(
        "prep AS (SELECT word, freq,"
        " ' ' || array_to_string(regexp_extract_all(word, '.'), '  ') || ' '"
        " AS seq FROM wf)"
    )
    parts.append(
        f"app AS (SELECT word, freq, seq, 0 AS i FROM prep"
        f" UNION ALL"
        f" SELECT a.word, a.freq, replace(a.seq, m.pat, m.rep), a.i + 1"
        f" FROM app a JOIN merges m ON m.merge_rank = a.i + 1"
        f" WHERE a.i < {k})"
    )
    parts.append(
        "fin AS (SELECT word, freq, seq,"
        " row_number() OVER (PARTITION BY word ORDER BY i DESC) AS rn"
        " FROM app)"
    )
    parts.append(
        "sym AS (SELECT word, freq,"
        " unnest(string_split(trim(seq), '  ')) AS symbol"
        " FROM fin WHERE rn = 1)"
    )
    parts.append(
        "st AS (SELECT symbol,"
        " CAST(sum(freq) AS BIGINT) AS n_occurrences,"
        " CAST(count(DISTINCT word) AS BIGINT) AS n_words"
        " FROM sym GROUP BY symbol)"
    )
    return (
        "WITH RECURSIVE "
        + ",\n    ".join(parts)
        + """
    SELECT symbol, n_occurrences, n_words,
           symbol LIKE '%~%' AS is_merged
    FROM st ORDER BY n_occurrences DESC, symbol LIMIT 50"""
    )


@register(
    "bpe_vocab_table",
    _bpe_vocab_oracle(),
    doc="The derived VOCABULARY — the artifact shipped WITH the merge "
    "table: after applying the learned merges to every corpus word, "
    "the top-50 symbols by frequency-weighted occurrence count, with "
    "how many distinct words contain each and whether it is a merged "
    "(multi-char) unit — the table an embedding-matrix sizing / "
    "token-budget decision reads. Same scale shape as "
    "bpe_compression_by_source: merges apply in-row to the "
    "vocab-bounded word-frequency table (never per occurrence), the "
    "symbol rollup is one map-side-combined shuffle over "
    "symbols-per-distinct-word, selection is TakeOrdered(50).",
)
def bpe_vocab_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.tokenizer import apply_merges, train_bpe, word_frequencies

    docs = _t(spark, sf_dir, "documents")
    wf = word_frequencies(docs).localCheckpoint()  # trainer + apply table
    merges = train_bpe(wf, n_merges=_BPE_TRAIN_K, max_words=_BPE_TRAIN_V)
    prep = wf.select(
        "word",
        "freq",
        F.concat(
            F.lit(" "),
            F.array_join(F.regexp_extract_all(F.col("word"), F.lit("."), 0), "  "),
            F.lit(" "),
        ).alias("seq"),
    )
    ap = apply_merges(prep, [(m[1], m[2]) for m in merges])
    sym = ap.select(
        "word",
        "freq",
        F.explode(F.split(F.trim(F.col("seq")), "  ")).alias("symbol"),
    )
    st = sym.groupBy("symbol").agg(
        F.sum("freq").cast("long").alias("n_occurrences"),
        F.countDistinct("word").cast("long").alias("n_words"),
    )
    return (
        st.orderBy(F.desc("n_occurrences"), F.asc("symbol"))
        .limit(50)
        .select(
            "symbol",
            "n_occurrences",
            "n_words",
            F.col("symbol").contains("~").alias("is_merged"),
        )
    )
