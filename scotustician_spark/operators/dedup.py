"""Deduplication operators for large text corpora.

The reference dedups by exact deterministic keys only
(unique-constraint skip, helpers.py:287-296; anti-join on processed
keys, processors.py:86-116). A 100 TB training-data pipeline needs the
near-dup family as well; each operator here is a pure DataFrame plan:

- exact:      hash-groupBy on a normalized fingerprint (one shuffle);
- n-gram Jaccard: shingle-explode + equi-join on shingle — scales as
  sum of postings-list squares, with a document-frequency cap to drop
  degenerate hot shingles (the classic skew guard);
- MinHash+LSH: signature = min hash per seed, band buckets, candidate
  pairs from equal band signatures — pair generation never touches
  non-colliding documents;
- SimHash:    per-token hashed bit votes → n-bit signature; equal
  signatures (or banded sub-signatures) are candidates;
- embedding near-dup: cosine over dimension-exploded join (see
  similarity.py for the top-k variant).

Hashes are md5-based (hex strings) rather than xxhash so an external
SQL oracle can reproduce them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, word_shingles
from ..session import repartition_for_compute


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of exact duplicates after whitespace/case normalization.

    Returns one row per fingerprint: n_docs, min doc id (the keeper),
    list-free so the shuffle payload stays tiny at scale.
    """
    return (
        df.select(F.col(id_col).alias("doc_id"), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keeper_id"),
        )
    )


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep exactly one row per normalized-text fingerprint (min id wins
    deterministically — not dropDuplicates, whose survivor is
    partition-order dependent)."""
    fp = df.withColumn("__fp", fingerprint(text_col))
    keepers = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return fp.join(keepers, [ "__fp", id_col], "left_semi").drop("__fp")


def shingle_postings(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, df_cap: int | None = None
) -> DataFrame:
    """(doc_id, shingle) distinct postings; optional document-frequency
    cap drops shingles appearing in more than ``df_cap`` docs (hot-key
    skew guard — a shingle in 1M docs would otherwise create 1M² join
    rows)."""
    posts = (
        repartition_for_compute(df)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(word_shingles(text_col, n)).alias("shingle"),
        )
        .distinct()
    )
    if df_cap is not None:
        hot = (
            posts.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > df_cap)
            .select("shingle")
        )
        posts = posts.join(F.broadcast(hot), "shingle", "left_anti")
    return posts


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    df_cap: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all candidate pairs.

    |A∩B| via self-equi-join of the postings on shingle (only documents
    sharing at least one shingle ever meet — no cartesian product);
    |A∪B| = |A|+|B|−|A∩B|. One shuffle keyed on shingle + one on pair.
    """
    posts = shingle_postings(df, id_col, text_col, n, df_cap)
    sizes = posts.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = posts.alias("a")
    b = posts.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_inter", "sz_a", "sz_b", "jaccard")
    )


# Mersenne prime for the universal-hash family; shingle base hash is
# 48 bits (12 md5 hex digits) and a_i ≤ 2·num_hashes+3, so a_i·H + b_i
# stays far below 2^63 — identical int64 arithmetic in any engine.
MINHASH_P = (1 << 61) - 1


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Fixed (a_i, b_i) for hash_i(H) = (a_i·H + b_i) mod P."""
    return [(2 * i + 3, 1000003 * i + 17) for i in range(num_hashes)]


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 16
) -> DataFrame:
    """Wide MinHash signature per document: columns mh0..mh{k-1}.

    One md5 per shingle (48-bit base hash H), then the k hashes come
    from a universal family (a_i·H + b_i) mod P — pure int64 codegen
    arithmetic, reproducible in any SQL engine. ALL k minima aggregate
    in a single groupBy(doc_id): one shuffle carrying k longs per doc
    (vs. the naive per-seed explode, which costs k× the hashing and a
    k-times-larger shuffle).
    """
    posts = shingle_postings(df, id_col, text_col, n)
    base = F.conv(F.substring(F.md5("shingle"), 1, 12), 16, 10).cast("long")
    hashed = posts.withColumn("__h", base)
    aggs = [
        F.min((F.lit(a) * F.col("__h") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"mh{i}")
        for i, (a, b) in enumerate(minhash_coeffs(num_hashes))
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 16,
    band_size: int = 4,
) -> DataFrame:
    """LSH candidate pairs: documents sharing any band signature.

    Band signatures (md5 of the band's minhashes in seed order) derive
    from the wide signature row directly — no second aggregation; the
    per-band layout comes from an in-row explode. The candidate join is
    an equi-join on (band, signature): documents that collide in no
    band are never paired, which is the whole point of LSH at corpus
    scale — pair cost tracks actual collisions, never n².
    """
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes)
    n_bands = num_hashes // band_size
    band_structs = [
        F.struct(
            F.lit(bi).alias("band"),
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"mh{bi * band_size + j}").cast("string")
                        for j in range(band_size)
                    ],
                )
            ).alias("band_sig"),
        )
        for bi in range(n_bands)
    ]
    bands = sigs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("b")
    ).select("doc_id", "b.band", "b.band_sig")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = 16
) -> DataFrame:
    """SimHash: per-token md5 hex digits vote ±1 on each of ``bits``
    bits (weighted by token multiplicity); the sign vector is the
    signature, emitted as a bit-string so any SQL engine can reproduce
    it. Near-duplicates differ in few bits (compare via hamming —
    or band the bit-string for LSH-style candidate generation).
    """
    assert bits <= 32, "md5 hex provides 32 digit votes"
    from ..functions.text import tokens

    df = repartition_for_compute(df)
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    ).withColumn("h", F.md5("tok"))
    odd = "13579bdf"
    votes = [
        F.sum(
            F.when(F.substring("h", j + 1, 1).isin(*list(odd)), 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    bit_cols = [F.when(F.col(f"v{j}") > 0, "1").otherwise("0") for j in range(bits)]
    return agg.select("doc_id", F.concat(*bit_cols).alias("simhash"))
