"""Distributed BPE tokenizer training (Sennrich et al. 2016).

The scale shape every production trainer (subword-nmt, HF tokenizers,
SentencePiece) uses: the corpus contributes ONE distributed
word-frequency aggregation (map-side combined groupBy — the only pass
whose cost grows with data volume), and the merge loop then runs over
the vocabulary-bounded word-frequency table, whose size is capped by
``max_words`` regardless of corpus size. At 100 TB the corpus pass is
a single shuffle on ``word``; the K merge rounds touch ≤ ``max_words``
rows each and cost seconds.

Merge application uses the repo's double-space symbol encoding proven
bit-identical across Spark and DuckDB in ``bpe_apply_tokenize``
(plans/vectors_text.py): a word's symbol sequence ``[a, b, c]`` is
encoded ``' a  b  c '`` (single-space edges, double-space separators),
so applying merge (a, b) → ``a~b`` is a plain non-overlapping
left-to-right ``replace(' a  b ', ' a~b ')`` — adjacent matches never
share a character, and neighbor spacing survives for later merges.

Pair statistics follow the reference algorithm exactly: every adjacent
symbol pair in a word counts once per occurrence, weighted by the
word's corpus frequency (Sennrich's ``get_stats``), ties broken by
pair string ascending. Each round's argmax is a single-row collect —
the same bounded convergence-probe pattern as the CC checksum — and
the learned table is returned as a small DataFrame.

Reference analog: the reference tokenizes with a pretrained HF
tokenizer (helpers.py word counts); training one is the beyond-
reference serving half that makes the pipeline self-contained.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MERGE_SCHEMA = StructType(
    [
        StructField("merge_rank", IntegerType(), False),
        StructField("left_sym", StringType(), False),
        StructField("right_sym", StringType(), False),
        StructField("merged_sym", StringType(), False),
        StructField("pair_count", LongType(), False),
    ]
)


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-scale pass: lowercased whitespace-token frequencies.

    Map-side-combined groupBy on ``word`` — the only stage here whose
    cost scales with corpus bytes.
    """
    from ..functions import text as TX

    toks = F.coalesce(
        TX.tokens(F.lower(F.col(text_col))), F.array().cast("array<string>")
    )
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-symbol-pair counts over (freq, seq)."""
    sy = F.split(F.trim(F.col("seq")), "  ")
    pairs = F.when(
        F.size(sy) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(sy) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(sy, i + 1), F.element_at(sy, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        seqs.select("freq", F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("pair_count"))
    )


def train_bpe(
    words: DataFrame,
    n_merges: int = 8,
    max_words: int = 400,
    word_col: str = "word",
    freq_col: str = "freq",
) -> list[tuple[int, str, str, str, int]]:
    """Learn ``n_merges`` BPE merges from a (word, freq) table.

    ``words`` is capped to the ``max_words`` most frequent words
    (freq desc, word asc — the min-frequency/vocab bound every trainer
    applies), then K rounds of: weighted adjacent-pair count → argmax
    (count desc, pair asc) → apply via the double-space replace.

    The capped table is localCheckpointed once; each round's plan is
    the checkpoint plus r literal ``replace()`` columns — linear, not
    exponential, because the argmax result enters as a LITERAL (one-row
    collect), never as a joined subplan. Rounds stop early when no
    adjacent pair remains (tiny vocabularies), matching the oracle's
    empty-round semantics.

    Returns the merge table as a list of
    ``(merge_rank, left_sym, right_sym, merged_sym, pair_count)``.
    """
    vocab = (
        words.select(F.col(word_col).alias("word"), F.col(freq_col).cast("long").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(max_words)
    )
    seqs = vocab.select(
        "freq",
        F.concat(
            F.lit(" "),
            F.array_join(F.regexp_extract_all(F.col("word"), F.lit("."), 0), "  "),
            F.lit(" "),
        ).alias("seq"),
    ).localCheckpoint()  # bounded: ≤ max_words rows; K consumers below

    cur = seqs
    out: list[tuple] = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(cur)
            .orderBy(F.desc("pair_count"), F.asc("pair"))
            .limit(1)
            .collect()
        )  # one-row argmax probe over the ≤ max_words relation
        if not top:
            break
        pair, cnt = top[0]["pair"], int(top[0]["pair_count"])
        left, right = pair.split(" ", 1)
        out.append((rank, left, right, f"{left}~{right}", cnt))
        cur = cur.withColumn(
            "seq",
            F.replace(
                "seq",
                F.lit(f" {left}  {right} "),
                F.lit(f" {left}~{right} "),
            ),
        )
    return out


def train_bpe_merges(
    words: DataFrame,
    n_merges: int = 8,
    max_words: int = 400,
    word_col: str = "word",
    freq_col: str = "freq",
) -> DataFrame:
    """``train_bpe`` with the learned merge table as a DataFrame."""
    rows = train_bpe(words, n_merges, max_words, word_col, freq_col)
    return words.sparkSession.createDataFrame(rows, MERGE_SCHEMA)


def apply_merges(
    df: DataFrame, merges: list[tuple[str, str]], seq_col: str = "seq"
) -> DataFrame:
    """Apply learned merges in rank order to double-space-encoded
    sequences (serving half; merge table is literals, corpus never
    shuffles)."""
    cur = df
    for left, right in merges:
        cur = cur.withColumn(
            seq_col,
            F.replace(
                seq_col, F.lit(f" {left}  {right} "), F.lit(f" {left}~{right} ")
            ),
        )
    return cur
