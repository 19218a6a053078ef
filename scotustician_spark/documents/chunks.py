"""Section-chunk assembly (reference helpers.py:137-200, operator C1).

Per (case, oa, section): concatenate ``"{speaker}: {text}"`` lines in
utterance order, carry word/token totals and utterance-index bounds.

Ordering is the sharp edge (SURVEY §7 hard #4): ``collect_list`` gives
no order guarantee after a shuffle, so lines are collected as
``struct(utterance_index, line)`` and ``array_sort``-ed before joining
— deterministic at any parallelism. One shuffle keyed by
(case_id, oa_id, section_id); at 100 TB the key space is ~sections
(cases × ~5) so reducers stay balanced, and map-side partial
aggregation shrinks the shuffle to one record per section per mapper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scotustician_spark.functions.text import bpe_ish_token_count

MAX_CHUNK_TOKENS = 8000  # reference truncation budget (helpers.py:183-187)


def assemble_section_chunks(
    utterances: DataFrame,
    max_chars: int | None = None,
) -> DataFrame:
    """utterances (flatten.py output) → one row per transcript section.

    ``max_chars``: optional char-budget truncation of the assembled
    text, the codegen-friendly stand-in for the reference's 8000-token
    decode-truncate (C3); token-exact truncation plugs in as a
    pandas_udf where a real tokenizer is available.
    """
    line = F.concat_ws(
        ": ", F.coalesce("speaker_name", F.lit("Unknown")), F.col("text")
    )
    chunks = (
        utterances.groupBy("case_id", "oa_id", "section_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("utterance_index").alias("i"), line.alias("l")))
            ).alias("__lines"),
            F.sum("word_count").cast("long").alias("word_count"),
            F.min("utterance_index").alias("first_utterance_index"),
            F.max("utterance_index").alias("last_utterance_index"),
            F.count("*").cast("long").alias("utterance_count"),
            F.countDistinct("speaker_name").cast("long").alias("speaker_count"),
        )
        .withColumn(
            "chunk_text",
            F.array_join(F.transform("__lines", lambda s: s["l"]), "\n"),
        )
        .drop("__lines")
    )
    if max_chars is not None:
        chunks = chunks.withColumn(
            "chunk_text", F.substring("chunk_text", 1, max_chars)
        )
    return chunks.withColumn("token_count", bpe_ish_token_count("chunk_text")).select(
        "case_id",
        "oa_id",
        "section_id",
        "chunk_text",
        "word_count",
        "token_count",
        "utterance_count",
        "speaker_count",
        "first_utterance_index",
        "last_utterance_index",
    )
