"""Nested document → utterance flattening (the reference's core parser).

Re-expresses services/transformers/helpers.py:117-200 (triple loop over
sections→turns→text_blocks with running indexes/offsets) as a
Spark-first plan:

* The three explode levels are fused INSIDE the array domain with
  nested ``transform``/``flatten`` higher-order functions, then a
  single ``posexplode`` emits one row per utterance. Position indexes
  (section_id, turn_pos, block_pos, utterance_index) come from the HOF
  index lambdas — **zero shuffles for the whole flatten**; at 100 TB it
  is a pure map stage that scales with input splits.
* Only the running character offset (helpers.py:164-175) needs
  cross-row state; that is one window keyed by case_id — a single
  shuffle whose key space (cases) is large and unskewed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def split_quarantine(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Valid/junk split (helpers.py:122-127, 239-246): a document must
    parse, and carry a non-empty ``transcript.sections`` array and a
    docket number. Returns (valid, junk) DataFrames over one scan —
    Catalyst collapses the two filters into the same WholeStageCodegen.
    """
    is_valid = (
        F.col("_corrupt_record").isNull()
        & F.col("transcript").isNotNull()
        & (F.coalesce(F.size("transcript.sections"), F.lit(0)) > 0)
        & F.col("docket_number").isNotNull()
    )
    valid = docs.filter(is_valid).drop("_corrupt_record")
    junk = docs.filter(~F.coalesce(is_valid, F.lit(False)))
    return valid, junk


def flatten_utterances(docs: DataFrame, min_words: int = 4) -> DataFrame:
    """One row per text block with section/turn/block indexes, speaker,
    word count, time bounds and per-case running char offsets
    (helpers.py:137-176).

    ``min_words`` reproduces the reference's short-text filter
    (helpers.py:149: keep blocks with > 3 whitespace words).
    """
    # sections[] -> turns[] -> text_blocks[] fused into one array of
    # utterance structs, order-preserving, all inside codegen.
    # turns/text_blocks normalize NULL -> EMPTY array first: F.flatten
    # returns NULL when ANY element array is NULL, so one section with
    # turns=null (nullable in OA JSON under PERMISSIVE reads) would
    # otherwise null the whole document's utterance array and silently
    # drop its VALID sections. _or_empty is the type-safe
    # COALESCE(arr, []): wrap in a 1-element array, drop the NULL
    # element, flatten — no hand-written type literal to drift from
    # the schema.
    def _or_empty(arr):
        return F.flatten(F.filter(F.array(arr), lambda x: x.isNotNull()))

    utt_arr = F.flatten(
        F.transform(
            "transcript.sections",
            lambda s, si: F.flatten(
                F.transform(
                    _or_empty(s["turns"]),
                    lambda t, ti: F.transform(
                        _or_empty(t["text_blocks"]),
                        lambda b, bi: F.struct(
                            si.alias("section_id"),
                            ti.alias("turn_pos"),
                            bi.alias("block_pos"),
                            t["speaker"]["ID"].alias("speaker_id"),
                            t["speaker"]["name"].alias("speaker_name"),
                            F.coalesce(
                                t["speaker"]["roles"],
                                F.array().cast("array<string>"),
                            ).alias("speaker_roles"),
                            b["text"].alias("text"),
                            (b["start"] * 1000).cast("long").alias("start_time_ms"),
                            (b["stop"] * 1000).cast("long").alias("end_time_ms"),
                        ),
                    ),
                )
            ),
        )
    )
    exploded = docs.select(
        F.col("case_id"),
        F.col("id").alias("oa_id"),
        F.col("term"),
        F.col("docket_number"),
        F.posexplode(utt_arr).alias("utterance_index", "u"),
    ).select(
        "case_id",
        "oa_id",
        "term",
        "docket_number",
        "utterance_index",
        "u.*",
    )
    # token_count (regex edge-strip), NOT trim+split: SQL trim removes
    # only ASCII spaces, so tab/newline-edged text would gain a phantom
    # empty token and both this gate and word_count would run one high
    # vs the reference's len(text.split()) (helpers.py:149,153)
    from ..functions.text import token_count

    kept = exploded.filter(token_count("text") >= F.lit(min_words))
    # The reference resets idx/offset per *document* (its triple loop
    # runs once per OA JSON), and posexplode's utterance_index likewise
    # restarts per oa_id — so the windows MUST partition by
    # (case_id, oa_id); case_id alone gives duplicate order keys (and
    # nondeterministic numbering) for cases with multiple OA documents.
    w = (
        Window.partitionBy("case_id", "oa_id")
        .orderBy("utterance_index")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # re-number after the filter so indexes are dense (reference
    # increments only for kept blocks, helpers.py:132,176), then running
    # offsets over the kept text + 1 separator char (helpers.py:164-175)
    dense = kept.withColumn(
        "utterance_index",
        F.row_number().over(
            Window.partitionBy("case_id", "oa_id").orderBy("utterance_index")
        )
        - 1,
    )
    return (
        dense.withColumn(
            "char_start",
            F.coalesce(F.sum(F.length("text") + 1).over(w), F.lit(0)).cast("long"),
        )
        .withColumn("char_end", (F.col("char_start") + F.length("text")).cast("long"))
        .withColumn("word_count", token_count("text").cast("long"))
    )


def classify_speaker_role(utterances: DataFrame) -> DataFrame:
    """bronze_oa_text.sql:34-39 CASE-WHEN role classification."""
    name_u = F.upper(F.coalesce(F.col("speaker_name"), F.lit("")))
    return utterances.withColumn(
        "speaker_role",
        F.when(name_u.contains("JUSTICE"), "Justice")
        .when(F.exists("speaker_roles", lambda r: F.upper(r).contains("ATTORNEY")), "Attorney")
        .when(name_u == "", "Unknown")
        .otherwise("Advocate"),
    )
