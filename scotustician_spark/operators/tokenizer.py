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

import pandas as pd  # module-level: pandas_udf type hints must resolve
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
    applies; TakeOrderedAndProject, scale-safe), and that BOUNDED
    table — ≤ ``max_words`` rows by construction, independent of
    corpus bytes — is collected once. The merge loop then runs on the
    driver, the same split every production trainer uses (HF
    tokenizers / SentencePiece / subword-nmt: cluster counts words,
    one process learns merges). A distributed round loop was measured
    8× slower here: K sequential argmax jobs cost ~0.3 s of scheduler
    each against a ≤400-row relation.

    Per round: frequency-weighted adjacent-pair counts (overlap-
    inclusive, Sennrich's ``get_stats``), argmax with (count desc,
    pair-string asc) tie-break — Python codepoint order equals the
    engines' UTF-8 binary order — then greedy non-overlapping
    left-to-right application, the exact semantics of the engines'
    ``replace`` on the double-space encoding. Stops early when no
    adjacent pair remains, matching the oracle's empty rounds.

    Returns the merge table as a list of
    ``(merge_rank, left_sym, right_sym, merged_sym, pair_count)``.
    """
    from collections import Counter

    vocab = (
        words.select(
            F.col(word_col).alias("word"), F.col(freq_col).cast("long").alias("freq")
        )
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(max_words)
        .collect()
    )  # bounded by max_words — the trainer's explicit memory budget
    seqs: list[tuple[list[str], int]] = [
        (list(r["word"]), int(r["freq"])) for r in vocab
    ]
    out: list[tuple] = []
    for rank in range(1, n_merges + 1):
        pc: Counter = Counter()
        for sy, f in seqs:
            for a, b in zip(sy, sy[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1])
        )
        merged = f"{left}~{right}"
        out.append((rank, left, right, merged, int(cnt)))
        nxt: list[tuple[list[str], int]] = []
        for sy, f in seqs:
            res, j = [], 0
            while j < len(sy):
                if j + 1 < len(sy) and sy[j] == left and sy[j + 1] == right:
                    res.append(merged)
                    j += 2
                else:
                    res.append(sy[j])
                    j += 1
            nxt.append((res, f))
        seqs = nxt
    return out


def train_bpe_merges(
    words: DataFrame,
    n_merges: int = 8,
    max_words: int = 400,
    word_col: str = "word",
    freq_col: str = "freq",
) -> DataFrame:
    """``train_bpe`` with the learned merge table as a DataFrame."""
    from ..session import local_relation

    rows = train_bpe(words, n_merges, max_words, word_col, freq_col)
    return local_relation(words.sparkSession, rows, MERGE_SCHEMA)


def write_bpe(spark, merges: list[tuple], path: str, params: dict | None = None) -> None:
    """Persist a trained merge table (train once, serve many — the
    tokenizer's analog of the ANN index lifecycle in ann_index.py):
    ``{path}/merges`` parquet + ``{path}/meta`` json. One tiny file —
    a tokenizer is metadata, not data."""
    from pyspark.sql import Row

    from ..session import local_relation

    df = local_relation(spark, merges, MERGE_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/merges")
    spark.createDataFrame([Row(**(params or {"n_merges": len(merges)}))]).coalesce(
        1
    ).write.mode("overwrite").json(f"{path}/meta")


def read_bpe(spark, path: str) -> list[tuple[int, str, str, str, int]]:
    """Load a persisted merge table in rank order, ready for
    ``apply_merges``."""
    return [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["merged_sym"], r["pair_count"])
        for r in spark.read.schema(MERGE_SCHEMA)
        .parquet(f"{path}/merges")
        .orderBy("merge_rank")
        .collect()
    ]


#: Above this merge count the literal ``F.replace`` chain is replaced
#: by the Arrow-batched kernel: one ``withColumn``+``replace`` per
#: merge builds a vocab-deep Catalyst expression tree (30k-deep at a
#: production vocab — analyzer/codegen blowup long before data size
#: matters), while the kernel's plan depth is constant.
ARROW_APPLY_THRESHOLD = 64


def apply_merges(
    df: DataFrame,
    merges: list[tuple[str, str]],
    seq_col: str = "seq",
    arrow_threshold: int = ARROW_APPLY_THRESHOLD,
) -> DataFrame:
    """Apply learned merges in rank order to double-space-encoded
    sequences (serving half; merge table is task-broadcast literals,
    corpus never shuffles).

    Two equality-tested arms (tests/test_tokenizer.py pins them
    bit-identical on random corpora):

    - ``len(merges) <= arrow_threshold``: one JVM ``F.replace`` per
      merge — whole-stage-codegen, zero Python, the plan the oracle
      SQL mirrors. Plan depth grows with the merge count, so it is
      capped.
    - above the threshold: a single Arrow-batched pandas UDF
      (constant plan depth) applying the same greedy non-overlapping
      left-to-right semantics at symbol level with a min-rank merge
      loop + per-unique-word memoization — the standard BPE serving
      kernel (GPT-2 ``bpe()``); O(len * merges_applied) per unique
      word instead of O(len * vocab) scan passes.

    The two orders are equivalent: a merge collapses two symbols into
    one NEW symbol, so adjacency between pre-existing symbols is never
    created by a later merge — each learned pair needs exactly one
    left-to-right pass, in any rank-respecting order.

    That equivalence requires a RANK-CONSISTENT table: every composite
    (``~``-bearing) component of a merge must be the output of an
    earlier merge. ``train_bpe`` tables satisfy this by construction;
    arbitrary tables like ``[("x", "a~b"), ("a", "b")]`` do not (the
    literal chain would stop at ``[x, a~b]`` while the min-rank kernel
    revisits rank 0 after rank 1 fires), so they are rejected here
    rather than silently changing output across ``arrow_threshold``.
    """
    _validate_rank_consistency(merges)
    if len(merges) <= arrow_threshold:
        cur = df
        for left, right in merges:
            cur = cur.withColumn(
                seq_col,
                F.replace(
                    seq_col, F.lit(f" {left}  {right} "), F.lit(f" {left}~{right} ")
                ),
            )
        return cur
    return df.withColumn(seq_col, _arrow_apply_udf(merges)(F.col(seq_col)))


def _validate_rank_consistency(merges: list[tuple[str, str]]) -> None:
    """Reject merge tables whose composite components are not produced
    by an earlier merge — the precondition under which the literal
    F.replace chain and the Arrow min-rank kernel are bit-identical
    (see apply_merges docstring). ``~`` is the reserved join character
    of this encoding, so a ``~``-bearing symbol that no earlier merge
    emitted can only come from a malformed table."""
    produced: set[str] = set()
    for k, (left, right) in enumerate(merges):
        for comp in (left, right):
            if "~" in comp and comp not in produced:
                raise ValueError(
                    f"merge table not rank-consistent: merge {k} "
                    f"({left!r}, {right!r}) uses composite symbol "
                    f"{comp!r} that no earlier merge produced; the two "
                    "apply arms would diverge on this table"
                )
        produced.add(f"{left}~{right}")


def _arrow_apply_udf(merges: list[tuple[str, str]]):
    """Build the Arrow-batched serving kernel for a frozen merge
    table. The rank dict rides to executors once per task via closure
    serialization (~1 MB at a 30k vocab — broadcast-sized)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def _decode(s: str) -> list[str] | None:
        # Well-formed iff the symbol list round-trips and no symbol
        # embeds a space: then every substring match of the literal
        # chain falls exactly on a symbol boundary and the two arms
        # are provably identical. Anything else takes the fallback,
        # which IS the literal semantics.
        if len(s) < 3 or s[0] != " " or s[-1] != " ":
            return None
        sy = s[1:-1].split("  ")
        if any((not sym) or (" " in sym) for sym in sy):
            return None
        return sy

    def _bpe_word(sy: list[str]) -> str:
        # Symbol-level greedy apply: repeatedly merge the lowest-rank
        # pair present (all its occurrences, left-to-right,
        # non-overlapping) — bit-identical to the rank-order replace
        # chain (see apply_merges docstring).
        while len(sy) > 1:
            best = None
            for pair in zip(sy, sy[1:]):
                r = ranks.get(pair)
                if r is not None and (best is None or r < best[0]):
                    best = (r, pair)
            if best is None:
                break
            left, right = best[1]
            merged = f"{left}~{right}"
            res, j = [], 0
            while j < len(sy):
                if j + 1 < len(sy) and sy[j] == left and sy[j + 1] == right:
                    res.append(merged)
                    j += 2
                else:
                    res.append(sy[j])
                    j += 1
            sy = res
        return " " + "  ".join(sy) + " "

    def _fallback(s: str) -> str:
        # Input not in the double-space encoding: reproduce the
        # literal chain verbatim (plain substring replace per merge).
        for left, right in merges:
            s = s.replace(f" {left}  {right} ", f" {left}~{right} ")
        return s

    @F.pandas_udf(StringType())
    def _apply(col: pd.Series) -> pd.Series:
        cache: dict[str, str] = {}

        def one(s):
            if s is None:
                return None
            hit = cache.get(s)
            if hit is None:
                sy = _decode(s)
                hit = _bpe_word(sy) if sy is not None else _fallback(s)
                cache[s] = hit
            return hit

        return col.map(one)

    return _apply
