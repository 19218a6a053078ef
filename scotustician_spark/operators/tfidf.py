"""TF-IDF top-terms — distributed text featurization.

Beyond-reference (the reference's only text features are word/token
counts, helpers.py:153-169); a training-data pipeline needs document
keyword/feature extraction that scales. Pure DataFrame plan:

  tokenize → (doc, term) tf counts → term document-frequency →
  smoothed idf ln((N+1)/(df+1)) → per-doc top-k by score.

Scale notes: term frequency is a map-side-combined hash aggregation;
document frequency is a count window over ``term`` on the tf rows —
one sort-shuffle on term that replaces the agg-shuffle + sort-merge
self-join of the textbook formulation (measured 2× at sf0.1; at
100 TB it removes an entire large-to-large join, and the vocabulary
is far too big to broadcast so that join would have been a full SMJ).
The corpus-size scalar rides a broadcast. The final top-k is a
per-doc window — re-shuffles on doc_id, bounded output k rows/doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.text import tokens
from ..session import repartition_for_compute


def tfidf_top_terms(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF.

    Deterministic: ties (equal score) break on term ascending; ranks
    are dense 1..k via row_number.
    """
    toks = repartition_for_compute(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    n_docs = docs.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        # tf rows are distinct (doc, term) pairs, so count-over-term IS
        # the document frequency — no self-join needed
        tf.withColumn("doc_freq", F.count("*").over(W.partitionBy("term")))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf") * F.log((F.col("n_docs") + 1) / (F.col("doc_freq") + 1)),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "doc_freq", "tfidf", "rank")
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed term set
    (the retrieval scorer behind corpus search / hard-negative mining):

        score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
        idf(t) = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5))

    Plan shape — NOTHING ever explodes: per-term tf is an in-row
    ``size(filter(tokens, = term))`` (query terms are a handful of
    literals), so the per-term flags ride the scan; N/avgdl/df(t) come
    from ONE global aggregation broadcast back as a single row. The
    whole query is scan → tiny-agg → broadcast → map, at any corpus
    size. Every input to the row formula (tf, dl, N, df, exact
    long-sum avgdl) is integer-exact, so scores are bit-identical
    across engines.
    """
    # NULL text scores like empty text (dl = 0, no matches), not NULL
    toks = F.coalesce(
        tokens(F.lower(F.col(text_col))), F.array().cast("array<string>")
    )
    base = repartition_for_compute(docs).select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("dl"),
        *[
            F.size(F.filter(toks, lambda t: t == F.lit(term)))
            .cast("long")
            .alias(f"__tf_{i}")
            for i, term in enumerate(query_terms)
        ],
    )
    stats = base.agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
            for i in range(len(query_terms))
        ],
    )
    score = None
    for i in range(len(query_terms)):
        idf = F.log(
            1.0
            + (F.col("n_docs") - F.col(f"__df_{i}") + 0.5)
            / (F.col(f"__df_{i}") + 0.5)
        )
        tf = F.col(f"__tf_{i}")
        part = idf * (tf * (k1 + 1)) / (
            tf + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
        )
        score = part if score is None else score + part
    return (
        base.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "dl",
            (sum(F.col(f"__tf_{i}") for i in range(len(query_terms)))).alias(
                "n_matches"
            ),
            score.alias("bm25"),
        )
    )


def pmi_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 2,
    min_count: int = 5,
    top_n: int = 50,
) -> DataFrame:
    """Pointwise-mutual-information co-occurrence mining — the classic
    collocation / phrase-discovery pass (and the statistic under
    count-based word embeddings): for token pairs co-occurring within
    ``window`` positions, PMI = ln(p(a,b) / (p(a)·p(b))) measures how
    much more often they appear together than independence predicts.

    Pair generation is IN-ROW (nested transform over position
    sequences — ≤ window pairs per token, never an explode-then-
    self-join), pairs are orientation-normalized (min,max) so each
    unordered pair counts once per occurrence. Unigram and pair counts
    are map-side-combined hash aggregations; the two corpus totals
    ride a broadcast single-row relation. Selection is top-``top_n``
    by pair COUNT (exact integers — deterministic set membership on
    any engine) with PMI reported; ``min_count`` drops the noise tail
    where PMI explodes on singletons.
    """
    from ..functions.text import tokens
    from ..session import repartition_for_compute

    toks = tokens(F.lower(F.col(text_col)))
    t = F.col("__toks")

    def pair_str(i, j):
        a, b = F.element_at(t, i + 1), F.element_at(t, j + 1)
        return F.concat(F.least(a, b), F.lit(" "), F.greatest(a, b))

    pairs_arr = F.when(
        F.size(t) >= 2,
        F.flatten(
            F.transform(
                F.sequence(F.lit(0), F.size(t) - 2),
                lambda i: F.transform(
                    F.sequence(i + 1, F.least(i + F.lit(window), F.size(t) - 1)),
                    lambda j: pair_str(i, j),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))

    # ONE tokenize + explode + aggregation pass for BOTH count tables:
    # tokens and window-pairs explode together under a kind tag and
    # aggregate in a single (kind, key) count, then the tiny count
    # relation is checkpointed and filtered per consumer. The former
    # two-table formulation re-tokenized the corpus once per consumer
    # subtree — the r10 plan audit counted FIVE scan+tokenize+agg
    # copies (pair counts for top + N_pairs, unigrams for tok_a,
    # tok_b, N_toks) because the pushed-down per-branch projections
    # defeated exchange reuse.
    base = repartition_for_compute(df.select(F.col(text_col))).select(
        toks.alias("__toks")
    )
    uni_tagged = F.transform(
        t, lambda x: F.struct(F.lit(0).alias("k"), x.alias("key"))
    )
    pair_tagged = F.transform(
        pairs_arr, lambda p: F.struct(F.lit(1).alias("k"), p.alias("key"))
    )
    counts = (
        base.select(F.explode(F.concat(uni_tagged, pair_tagged)).alias("e"))
        .groupBy(F.col("e.k").alias("k"), F.col("e.key").alias("key"))
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)
    )
    pair_counts = counts.filter(F.col("k") == 1).select(
        F.col("key").alias("pair"), F.col("n").alias("n_pair")
    )
    uni = counts.filter(F.col("k") == 0).select(
        F.col("key").alias("tok"), F.col("n").alias("n_tok")
    )
    totals = pair_counts.agg(F.sum("n_pair").alias("N_pairs")).crossJoin(
        F.broadcast(uni.agg(F.sum("n_tok").alias("N_toks")))
    )
    top = (
        pair_counts.filter(F.col("n_pair") >= min_count)
        .orderBy(F.desc("n_pair"), F.asc("pair"))
        .limit(top_n)
    )
    a = uni.select(F.col("tok").alias("tok_a"), F.col("n_tok").alias("c_a"))
    b = uni.select(F.col("tok").alias("tok_b"), F.col("n_tok").alias("c_b"))
    return (
        top.withColumn("tok_a", F.split("pair", " ")[0])
        .withColumn("tok_b", F.split("pair", " ")[1])
        .join(a, "tok_a")
        .join(b, "tok_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "pair",
            "n_pair",
            F.col("c_a").alias("count_a"),
            F.col("c_b").alias("count_b"),
            F.round(
                F.log(
                    (F.col("n_pair") / F.col("N_pairs"))
                    / (
                        (F.col("c_a") / F.col("N_toks"))
                        * (F.col("c_b") / F.col("N_toks"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
