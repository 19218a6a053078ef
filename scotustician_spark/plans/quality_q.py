"""Corpus-quality + event-funnel queries (beyond-reference
training-data operators), each with a DuckDB oracle.

Spark implementations live in ``operators/quality.py`` and
``operators/temporal.py``; this module binds them to the driver's
synthetic tables and supplies the SQL twins. The PII query derives a
deterministic contact string from existing columns (same expression on
both engines) so the redaction path is verified against non-degenerate
matches — the raw synthetic text contains no PII-shaped spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.quality import (
    EMAIL_RE,
    PHONE_RE,
    bigram_lm_scores,
    chunk_boilerplate_removal,
    contamination_pairs,
    pii_redact,
    repetition_stats,
)
from ..operators.temporal import funnel_stages
from .registry import QUERY_REGISTRY, register
from .relational import _events
from .tables import load_table

# Lower-cased whitespace tokens with python-str.split() semantics, and
# the zero-token guard (DuckDB splits '' into [''], Spark tokens()
# yields []) — shared shape with vectors_text._TOKS / _SHINGLES.
_TOKS = (
    "regexp_split_to_array("
    "regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+')"
)
_TOKS_GUARDED = (
    f"CASE WHEN text IS NULL OR length(regexp_replace(lower(text), "
    f"'^\\s+|\\s+$', '', 'g')) = 0 THEN CAST([] AS VARCHAR[]) "
    f"ELSE {_TOKS} END"
)


def _ngrams_sql(n: int) -> str:
    """DuckDB expression: word n-grams of column ``l`` (token list),
    with word_shingles' k<n fallback (whole text as one shingle) and
    [] for zero tokens."""
    return (
        f"CASE WHEN len(l) = 0 THEN CAST([] AS VARCHAR[]) "
        f"WHEN len(l) >= {n} THEN list_transform(range(1, len(l)-{n}+2), "
        f"i -> array_to_string(l[i:i+{n - 1}], ' ')) "
        f"ELSE [array_to_string(l, ' ')] END"
    )


def _d(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents", normalize_ntz=False)


@register(
    "doc_repetition",
    f"""
    WITH base AS (SELECT doc_id, {_TOKS_GUARDED} AS l FROM documents),
    g AS (SELECT doc_id, l AS t, {_ngrams_sql(2)} AS bg FROM base)
    SELECT doc_id,
           CAST(len(t) AS INTEGER) AS n_tokens,
           CASE WHEN len(t) > 0
                THEN 1.0 - len(list_distinct(t)) / CAST(len(t) AS DOUBLE) END
               AS rep_token_frac,
           CASE WHEN len(bg) > 0
                THEN 1.0 - len(list_distinct(bg)) / CAST(len(bg) AS DOUBLE) END
               AS rep_bigram_frac,
           CASE WHEN len(bg) > 0
                THEN list_max(list_transform(list_distinct(bg),
                         b -> len(list_filter(bg, x -> x = b))))
                     / CAST(len(bg) AS DOUBLE) END
               AS top_bigram_frac
    FROM g
    """,
    doc="Gopher-style repetition scoring (repeated-token / repeated-bigram / "
    "modal-bigram fractions) — pure in-row HOF expressions, a map stage at "
    "any scale.",
    bench=True,
)
def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_stats(_d(spark, sf_dir), "doc_id", "text")


# Deterministic contact-string augmentation, same expression both
# engines: '<text> contact <source>.<doc_id>@example.com tel 555-NNNN'
_AUG_SQL = (
    "text || ' contact ' || source || '.' || CAST(doc_id AS VARCHAR) "
    "|| '@example.com tel 555-' || lpad(CAST(doc_id AS VARCHAR), 4, '0')"
)


def _aug_spark() -> F.Column:
    return F.concat(
        F.col("text"),
        F.lit(" contact "),
        F.col("source"),
        F.lit("."),
        F.col("doc_id").cast("string"),
        F.lit("@example.com tel 555-"),
        F.lpad(F.col("doc_id").cast("string"), 4, "0"),
    )


@register(
    "pii_redaction",
    f"""
    WITH aug AS (SELECT doc_id, {_AUG_SQL} AS t FROM documents),
    r1 AS (SELECT doc_id, t,
                  regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g') AS t1
           FROM aug)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS INTEGER)  AS n_emails,
           CAST(len(regexp_extract_all(t1, '{PHONE_RE}')) AS INTEGER) AS n_phones,
           md5(regexp_replace(t1, '{PHONE_RE}', '<PHONE>', 'g'))      AS redacted_md5
    FROM r1
    """,
    doc="PII redaction (emails then phone-shaped runs, fixed order) with "
    "match counts and the md5 of the redacted text; regexes restricted to "
    "the Java-regex ∩ RE2 shared syntax so both engines agree byte-for-byte.",
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = _d(spark, sf_dir).select("doc_id", _aug_spark().alias("text"))
    return pii_redact(aug, "doc_id", "text")


@register(
    "contamination_ngrams",
    f"""
    WITH base AS (SELECT doc_id, {_TOKS_GUARDED} AS l FROM documents),
    sh AS (SELECT doc_id, list_distinct({_ngrams_sql(5)}) AS s FROM base),
    eval_sh AS (SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id % 20 = 0),
    corpus AS (SELECT doc_id, unnest(s) AS shingle FROM sh WHERE doc_id % 20 <> 0),
    hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
             FROM corpus WHERE shingle IN (SELECT shingle FROM eval_sh)
             GROUP BY doc_id)
    SELECT s.doc_id,
           CAST(len(s.s) AS INTEGER) AS n_shingles,
           coalesce(h.n_contaminated, 0) AS n_contaminated,
           coalesce(h.n_contaminated, 0) > 0 AS is_contaminated
    FROM sh s LEFT JOIN hits h ON s.doc_id = h.doc_id
    WHERE s.doc_id % 20 <> 0
    """,
    doc="Benchmark decontamination: 5-gram overlap of every corpus document "
    "against the eval split (doc_id %% 20 = 0). Eval shingles broadcast; the "
    "corpus is scanned once and never shuffled on the join.",
    bench=True,
)
def contamination_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _d(spark, sf_dir)
    corpus = d.filter(F.col("doc_id") % 20 != 0)
    eval_set = d.filter(F.col("doc_id") % 20 == 0)
    return contamination_pairs(corpus, eval_set, "doc_id", "text", n=5)


@register(
    "doc_lm_score",
    f"""
    WITH base AS (SELECT doc_id, {_TOKS_GUARDED} AS l FROM documents),
    bg AS (SELECT doc_id,
                  unnest(CASE WHEN len(l) >= 2
                         THEN list_transform(range(1, len(l)),
                                             i -> array_to_string(l[i:i+1], ' '))
                         ELSE CAST([] AS VARCHAR[]) END) AS bg
           FROM base),
    w AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1 FROM bg),
    c_bg AS (SELECT bg, count(*) AS c_bg FROM w GROUP BY bg),
    c_w1 AS (SELECT w1, count(*) AS c_w1 FROM w GROUP BY w1),
    vocab AS (SELECT count(DISTINCT t) AS v
              FROM (SELECT unnest(l) AS t FROM base)),
    scored AS (
        SELECT w.doc_id,
               ln((c_bg.c_bg + 1) / CAST(c_w1.c_w1 + vocab.v AS DOUBLE)) AS lp
        FROM w JOIN c_bg USING (bg) JOIN c_w1 USING (w1) CROSS JOIN vocab)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(lp), 6) AS avg_logprob,
           round(exp(-round(avg(lp), 6)), 4) AS ppl
    FROM scored GROUP BY doc_id
    """,
    doc="Bigram-LM quality score (CCNet-style perplexity filter), model "
    "estimated from the corpus itself with add-one smoothing. Count "
    "tables scale with observed vocabulary, not corpus size — the "
    "broadcast-or-bucket side of the scoring joins at scale.",
)
def doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_lm_scores(_d(spark, sf_dir), "doc_id", "text")


@register(
    "boilerplate_chunks",
    f"""
    WITH base AS (SELECT doc_id, {_TOKS_GUARDED} AS l FROM documents),
    nc AS (SELECT doc_id, l, CAST(ceil(len(l) / 8.0) AS INT) AS n FROM base),
    chunks AS (
        SELECT doc_id,
               unnest(range(0, n)) AS chunk_idx,
               unnest(list_transform(range(0, n),
                      i -> array_to_string(l[i*8+1 : i*8+8], ' '))) AS chunk
        FROM nc WHERE n > 0
    ),
    hot AS (SELECT md5(chunk) AS fp FROM chunks
            GROUP BY md5(chunk) HAVING count(DISTINCT doc_id) > 2),
    kept AS (SELECT * FROM chunks WHERE md5(chunk) NOT IN (SELECT fp FROM hot)),
    re AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                  string_agg(chunk, ' ' ORDER BY chunk_idx) AS clean_text
           FROM kept GROUP BY doc_id)
    SELECT nc.doc_id,
           CAST(nc.n AS BIGINT) AS n_chunks,
           CAST(nc.n - coalesce(re.n_kept, 0) AS BIGINT) AS n_dropped,
           coalesce(re.clean_text, '') AS clean_text
    FROM nc LEFT JOIN re USING (doc_id)
    """,
    doc="C4/RefinedWeb-style cross-document boilerplate removal: fixed-size "
    "word chunks whose document frequency exceeds the cap are dropped from "
    "every document and the survivors reassembled in order. Chunking is "
    "in-row; the hot set is broadcast — corpus text shuffles at most twice.",
    bench=True,
)
def boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_boilerplate_removal(
        _d(spark, sf_dir), "doc_id", "text", chunk_words=8, df_cap=2
    )


@register(
    "duplicate_spans",
    f"""
    WITH base AS (SELECT doc_id, {_TOKS_GUARDED} AS l FROM documents),
    sh AS (SELECT doc_id,
                  unnest(range(0, greatest(0, len(l) - 8 + 1))) AS start,
                  unnest(list_transform(range(0, greatest(0, len(l) - 8 + 1)),
                         i -> md5(array_to_string(l[i+1:i+8], ' ')))) AS fp
           FROM base WHERE len(l) >= 8),
    hot AS (SELECT fp FROM sh GROUP BY fp HAVING count(*) >= 2),
    dup AS (SELECT doc_id, start FROM sh WHERE fp IN (SELECT fp FROM hot)),
    w AS (SELECT doc_id, start,
                 CASE WHEN lag(start) OVER pw IS NULL
                       OR start > lag(start) OVER pw + 8 THEN 1 ELSE 0 END AS ni
          FROM dup WINDOW pw AS (PARTITION BY doc_id ORDER BY start)),
    isl AS (SELECT doc_id, start,
                   sum(ni) OVER (PARTITION BY doc_id ORDER BY start
                                 ROWS UNBOUNDED PRECEDING) AS island
            FROM w)
    SELECT doc_id,
           CAST(min(start) AS BIGINT) AS span_start,
           CAST(max(start) + 8 AS BIGINT) AS span_end,
           CAST(max(start) + 8 - min(start) AS BIGINT) AS span_len,
           CAST(count(*) AS BIGINT) AS n_shingles
    FROM isl GROUP BY doc_id, island
    """,
    doc="ExactSubstr-style duplicate-SPAN detection (Lee et al. 2022): "
    "every 8-token window fingerprinted IN-ROW, globally repeated "
    "windows marked, and per document the overlapping/adjacent marks "
    "merged into maximal spans by a gaps-and-islands window (fixed "
    "window length makes lag(start)+k the running max end — one lag "
    "comparison, no interval tree). The distributed stand-in for the "
    "single-machine suffix-array pass: same spans quantized to k-grams, "
    "full data parallelism. Shingle relation localCheckpoint'ed so the "
    "hash map feeds both the frequency count and the semi-join probe "
    "without recompute.",
    bench=True,
)
def duplicate_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.spans import duplicate_spans

    return duplicate_spans(_d(spark, sf_dir), "doc_id", "text", k=8)


@register(
    "funnel_conversion",
    """
    WITH s0 AS (SELECT user_id, min(ts) AS t0 FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    s1 AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e
           JOIN s0 ON e.user_id = s0.user_id
           WHERE e.event_type = 'click' AND e.ts >= s0.t0 GROUP BY e.user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
           JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'purchase' AND e.ts >= s1.t1 GROUP BY e.user_id)
    SELECT 0 AS stage_idx, 'view' AS stage,
           (SELECT CAST(count(*) AS BIGINT) FROM s0) AS n_users
    UNION ALL SELECT 1, 'click', (SELECT CAST(count(*) AS BIGINT) FROM s1)
    UNION ALL SELECT 2, 'purchase', (SELECT CAST(count(*) AS BIGINT) FROM s2)
    """,
    doc="Ordered funnel (view → click → purchase): users reaching each stage "
    "in sequence. One filtered min-agg per stage keyed on user — no window "
    "over the raw stream, no per-user event collection, skew-immune.",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    reached = funnel_stages(ev, "user_id", "ts", "event_type", ["view", "click", "purchase"])
    counts = reached.agg(
        F.count("t_0").alias("c0"), F.count("t_1").alias("c1"), F.count("t_2").alias("c2")
    )
    stages = ["view", "click", "purchase"]
    return counts.select(
        F.expr(
            "stack(3, "
            + ", ".join(f"{i}, '{s}', c{i}" for i, s in enumerate(stages))
            + ") AS (stage_idx, stage, n_users)"
        )
    ).select(
        F.col("stage_idx").cast("int").alias("stage_idx"),
        "stage",
        F.col("n_users").cast("long").alias("n_users"),
    )


@register(
    "funnel_deadline",
    """
    WITH s0 AS (SELECT user_id, min(ts) AS t0 FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    s1 AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e
           JOIN s0 ON e.user_id = s0.user_id
           WHERE e.event_type = 'click' AND e.ts >= s0.t0
             AND e.ts <= s0.t0 + INTERVAL 30 MINUTE
           GROUP BY e.user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
           JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'purchase' AND e.ts >= s1.t1
             AND e.ts <= s1.t1 + INTERVAL 30 MINUTE
           GROUP BY e.user_id)
    SELECT 0 AS stage_idx, 'view' AS stage,
           (SELECT CAST(count(*) AS BIGINT) FROM s0) AS n_users
    UNION ALL SELECT 1, 'click', (SELECT CAST(count(*) AS BIGINT) FROM s1)
    UNION ALL SELECT 2, 'purchase', (SELECT CAST(count(*) AS BIGINT) FROM s2)
    """,
    doc="Deadline funnel: each stage must follow the previous within 30 "
    "minutes — the conversion-window variant every product funnel uses. "
    "The deadline is one extra predicate on the same per-stage filtered "
    "min-agg; plan shape (k keyed aggregates, no raw-stream window) is "
    "unchanged from funnel_conversion.",
)
def funnel_deadline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    reached = funnel_stages(
        ev,
        "user_id",
        "ts",
        "event_type",
        ["view", "click", "purchase"],
        max_step_gap="30 MINUTE",
    )
    counts = reached.agg(
        F.count("t_0").alias("c0"), F.count("t_1").alias("c1"), F.count("t_2").alias("c2")
    )
    stages = ["view", "click", "purchase"]
    return counts.select(
        F.expr(
            "stack(3, "
            + ", ".join(f"{i}, '{s}', c{i}" for i, s in enumerate(stages))
            + ") AS (stage_idx, stage, n_users)"
        )
    ).select(
        F.col("stage_idx").cast("int").alias("stage_idx"),
        "stage",
        F.col("n_users").cast("long").alias("n_users"),
    )


def _report_oracle() -> str:
    """Compose the report oracle from the four registered oracles as
    CTEs — the SQL twin is literally the composition of the verified
    parts, so a drift in any constituent surfaces in both gates."""
    q = QUERY_REGISTRY
    return f"""
    WITH dq AS ({q["doc_quality"].oracle}),
    dr AS ({q["doc_repetition"].oracle}),
    lm AS ({q["doc_lm_score"].oracle}),
    ct AS ({q["contamination_ngrams"].oracle})
    SELECT ct.doc_id,
           dq.quality,
           dr.rep_token_frac,
           lm.ppl,
           ct.is_contaminated,
           CASE WHEN ct.is_contaminated           THEN 'drop_contaminated'
                WHEN dr.rep_token_frac > 0.6      THEN 'drop_repetition'
                WHEN lm.ppl > 33.0                THEN 'drop_lm'
                WHEN dq.quality < 1.0             THEN 'drop_quality'
                ELSE 'keep' END AS decision
    FROM ct
    JOIN dq USING (doc_id)
    JOIN dr USING (doc_id)
    LEFT JOIN lm USING (doc_id)
    """


@register(
    "corpus_quality_report",
    _report_oracle(),
    doc="Composed per-document quality verdict: decontamination, "
    "repetition, LM-perplexity and heuristic-quality gates in one "
    "cascade (first matching drop wins). The Spark plan joins the four "
    "constituent map-stage outputs on doc_id; the oracle is the "
    "composition of the four registered oracles as CTEs.",
)
def corpus_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = QUERY_REGISTRY
    dq = q["doc_quality"].fn(spark, sf_dir).select("doc_id", "quality")
    dr = q["doc_repetition"].fn(spark, sf_dir).select("doc_id", "rep_token_frac")
    lm = q["doc_lm_score"].fn(spark, sf_dir).select("doc_id", "ppl")
    ct = q["contamination_ngrams"].fn(spark, sf_dir).select(
        "doc_id", "is_contaminated"
    )
    j = ct.join(dq, "doc_id").join(dr, "doc_id").join(lm, "doc_id", "left")
    decision = (
        F.when(F.col("is_contaminated"), "drop_contaminated")
        .when(F.col("rep_token_frac") > 0.6, "drop_repetition")
        .when(F.col("ppl") > 33.0, "drop_lm")
        .when(F.col("quality") < 1.0, "drop_quality")
        .otherwise("keep")
    )
    return j.select(
        "doc_id",
        "quality",
        "rep_token_frac",
        "ppl",
        "is_contaminated",
        decision.alias("decision"),
    )


@register(
    "text_normalize",
    """
    WITH dirty AS (
        SELECT doc_id, 'Cafe' || chr(769) || ' ' || chr(9) || text AS d
        FROM documents),
    n AS (SELECT doc_id, d,
                 CASE WHEN d IS NULL THEN NULL ELSE
                     regexp_replace(regexp_replace(nfc_normalize(d),
                         '^\\s+|\\s+$', '', 'g'), '\\s+', ' ', 'g') END AS clean
          FROM dirty)
    SELECT doc_id, clean AS norm_text,
           CAST(length(d) AS INTEGER) AS n_chars_raw,
           CAST(length(clean) AS INTEGER) AS n_chars_norm,
           clean <> d AS changed
    FROM n
    """,
    doc="Unicode canonicalization (operators/quality.py::normalize_text): "
    "NFC fold + ASCII-whitespace collapse + edge strip, as an Arrow "
    "kernel (the JVM expression library has no NFC surface) — byte-"
    "distinct but canonically-equal documents must normalize BEFORE any "
    "fingerprint-based dedup. The probe input prepends a combining-"
    "accent sequence ('Cafe'+U+0301) and a tab to every document so the "
    "normalization path is exercised on every row; DuckDB's "
    "nfc_normalize reproduces it exactly (codepoint-length parity "
    "verified).",
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import normalize_text

    d = _d(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("Cafe"), F.lit("́"), F.lit(" \t"), F.col("text")
        ).alias("dirty"),
    )
    return normalize_text(d, "doc_id", "dirty")


@register(
    "doc_token_entropy",
    f"""
    WITH base AS (SELECT doc_id, {_TOKS_GUARDED} AS l FROM documents),
    cnt AS (SELECT doc_id, t, count(*) AS c
            FROM (SELECT doc_id, unnest(l) AS t FROM base) GROUP BY doc_id, t),
    tot AS (SELECT doc_id, CAST(len(l) AS INT) AS n_tokens,
                   CAST(len(list_distinct(l)) AS INT) AS n_distinct FROM base),
    raw AS (SELECT c.doc_id,
                   sum((c.c / CAST(t.n_tokens AS DOUBLE))
                       * ln(CAST(t.n_tokens AS DOUBLE) / c.c)) AS r
            FROM cnt c JOIN tot t USING (doc_id) GROUP BY c.doc_id)
    SELECT t.doc_id, t.n_tokens, t.n_distinct,
           CASE WHEN t.n_tokens > 0 THEN round(r.r, 6) END AS entropy,
           CASE WHEN t.n_distinct > 1 THEN round(r.r / ln(t.n_distinct), 6)
                WHEN t.n_distinct = 1 THEN 0.0 END AS norm_entropy
    FROM tot t LEFT JOIN raw r USING (doc_id)
    """,
    doc="Unigram Shannon entropy per document "
    "(operators/quality.py::token_entropy) — the information-density "
    "quality signal; norm_entropy (entropy/ln(distinct)) is the "
    "length-comparable evenness score. Spark computes it IN-ROW with a "
    "sorted-run fold (no explode, no shuffle); the oracle replays it "
    "as unnest + per-token counts.",
)
def doc_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import token_entropy

    return token_entropy(_d(spark, sf_dir), "doc_id", "text")


def _keep_best_oracle() -> str:
    q = QUERY_REGISTRY
    return f"""
    WITH comps AS ({q["dedup_components"].oracle}),
    dq AS ({q["doc_quality"].oracle}),
    j AS (SELECT c.doc_id, c.component_id, c.component_size, d.quality
          FROM comps c JOIN dq d USING (doc_id)),
    best AS (SELECT component_id, doc_id AS best_doc FROM (
        SELECT component_id, doc_id,
               row_number() OVER (PARTITION BY component_id
                                  ORDER BY quality DESC, doc_id) AS rn
        FROM j) WHERE rn = 1)
    SELECT j.doc_id, j.component_id, j.component_size, j.quality,
           j.doc_id = b.best_doc AS is_best
    FROM j JOIN best b USING (component_id)
    """


@register(
    "dedup_keep_best",
    _keep_best_oracle(),
    doc="Quality-aware duplicate resolution: where dedup_components "
    "keeps the MIN-ID document per duplicate cluster (arbitrary), "
    "this keeps the HIGHEST-QUALITY member (doc_quality score, "
    "doc_id-asc tie-break) — the policy a real corpus pipeline wants: "
    "near-duplicates differ in boilerplate/truncation, and the keeper "
    "should be the best exemplar, not the lowest key. Composes two "
    "registered oracles (recursive-CTE components + quality) as CTEs; "
    "the Spark plan joins the component labeling to the quality map "
    "stage and takes a per-component argmax.",
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    q = QUERY_REGISTRY
    comps = q["dedup_components"].fn(spark, sf_dir).select(
        "doc_id", "component_id", "component_size"
    )
    dq = q["doc_quality"].fn(spark, sf_dir).select("doc_id", "quality")
    j = comps.join(dq, "doc_id")
    w = W.partitionBy("component_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    best = (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("component_id", F.col("doc_id").alias("best_doc"))
    )
    return j.join(best, "component_id").select(
        "doc_id",
        "component_id",
        "component_size",
        "quality",
        (F.col("doc_id") == F.col("best_doc")).alias("is_best"),
    )


@register(
    "winnowing_pairs",
    f"""
    WITH base AS (SELECT doc_id, {_TOKS_GUARDED} AS l FROM documents),
    st AS (SELECT doc_id,
                  list_transform(range(0, len(l) - 4),
                      i -> md5(array_to_string(l[i+1:i+5], ' '))) AS fps
           FROM base WHERE len(l) - 4 >= 4),
    selpos AS (SELECT doc_id, fps,
                      list_distinct(list_transform(range(0, len(fps) - 3),
                          i -> list_max(list_filter(range(i, i+4),
                              j -> fps[j+1] = list_min(fps[i+1:i+4])))))
                          AS sel
               FROM st),
    sel AS (SELECT DISTINCT doc_id, fps[p + 1] AS fp
            FROM (SELECT doc_id, fps, unnest(sel) AS p FROM selpos))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= 2
    """,
    doc="Winnowing fingerprint matching (Schleimer/Wilkerson/Aiken "
    "2003, the MOSS algorithm): every 5-token window hashed, a 4-hash "
    "sliding window keeps only the rightmost minimal hash, documents "
    "sharing >= 2 selected fingerprints pair with their overlap count. "
    "Guarantees any shared run of >= w+k-1 = 8 tokens yields a shared "
    "fingerprint while keeping ~2/(w+1) of hashes — the cheap "
    "position-robust complement to duplicate_spans' ExactSubstr pass. "
    "Hashing AND window-min selection are in-row HOFs (selection never "
    "leaves the row); only selected fingerprints explode and the pair "
    "join is keyed on fingerprint like the LSH band join. "
    "operators/spans.py::winnowing_pairs.",
    bench=True,
)
def winnowing_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.spans import winnowing_pairs

    return winnowing_pairs(_d(spark, sf_dir), "doc_id", "text", k=5, w=4,
                           min_shared=2)
