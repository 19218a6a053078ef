"""XML serialization of transcripts (reference S11, helpers.py:348-421:
nested JSON → ``<transcript><utterance speaker=…>`` documents).

Built entirely from codegen string expressions (escape via chained
``replace``; assembly via ordered ``array_sort(collect_list(struct))``)
— one shuffle keyed by case, no Python in the path. The result is one
XML string per case, writable with ``df.write.text`` / partitioned by
term.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def xml_escape(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    c = F.replace(c, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    c = F.replace(c, F.lit(">"), F.lit("&gt;"))
    c = F.replace(c, F.lit('"'), F.lit("&quot;"))
    return F.replace(c, F.lit("'"), F.lit("&apos;"))


def transcript_to_xml(utterances: DataFrame) -> DataFrame:
    """flatten.py output → (case_id, oa_id, term, xml), one row per OA
    document (the reference serializes per transcript file; a case
    argued twice yields two XML rows — grouping by case alone would
    interleave the two documents' utterance indexes, which reset per
    oa_id)."""
    utt_xml = F.format_string(
        '  <utterance index="%s" section="%s" speaker="%s" start_ms="%s" stop_ms="%s">%s</utterance>',
        F.col("utterance_index").cast("string"),
        F.col("section_id").cast("string"),
        xml_escape(F.coalesce("speaker_name", F.lit("Unknown"))),
        F.coalesce(F.col("start_time_ms").cast("string"), F.lit("0")),
        F.coalesce(F.col("end_time_ms").cast("string"), F.lit("0")),
        xml_escape("text"),
    )
    return (
        utterances.groupBy("case_id", "oa_id", "term")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("utterance_index").alias("i"), utt_xml.alias("x"))
                )
            ).alias("__u")
        )
        .select(
            "case_id",
            "oa_id",
            "term",
            F.concat(
                F.format_string('<transcript case_id="%s">\n', xml_escape("case_id")),
                F.array_join(F.transform("__u", lambda s: s["x"]), "\n"),
                F.lit("\n</transcript>"),
            ).alias("xml"),
        )
    )


def write_xml(utterances: DataFrame, path: str) -> None:
    """Partitioned-by-term XML corpus sink (reference writes xml/ keys
    per case; partition pruning replaces key-prefix listing)."""
    transcript_to_xml(utterances).write.partitionBy("term").mode("overwrite").parquet(
        path
    )


# attribute-prefixed struct schema for Spark 4's native XML parser
# (attributes surface as _name, element text as _VALUE)
TRANSCRIPT_XML_SCHEMA = (
    "_case_id STRING, "
    "utterance ARRAY<STRUCT<_index BIGINT, _section BIGINT, _speaker STRING, "
    "_start_ms BIGINT, _stop_ms BIGINT, _VALUE STRING>>"
)


def parse_transcript_xml(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """S11 read-back: the XML corpus parses back to utterance rows with
    Spark 4's NATIVE ``from_xml`` expression (JVM-side, codegen — no
    external spark-xml package, no Python). Entity escapes reverse in
    the parser, so ``transcript_to_xml → parse_transcript_xml`` is a
    lossless roundtrip on (case_id, utterance_index, section_id,
    speaker_name, times, text) — pinned by the roundtrip test.

    A single-document transcript with N utterances parses as one
    struct row and explodes to N rows: one map stage plus the explode,
    shuffle-free at any corpus size.
    """
    parsed = df.withColumn("__p", F.from_xml(F.col(xml_col), TRANSCRIPT_XML_SCHEMA))
    return parsed.select(
        F.col("__p._case_id").alias("case_id"),
        F.explode("__p.utterance").alias("u"),
    ).select(
        "case_id",
        F.col("u._index").alias("utterance_index"),
        F.col("u._section").alias("section_id"),
        F.col("u._speaker").alias("speaker_name"),
        F.col("u._start_ms").alias("start_time_ms"),
        F.col("u._stop_ms").alias("end_time_ms"),
        F.col("u._VALUE").alias("text"),
    )
