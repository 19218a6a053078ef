"""Declared schema for the oral-argument document corpus.

The reference consumes nested Oyez JSON (shape observed at
reference examples/17970_20250802_023426.json, validated at
services/transformers/helpers.py:122-127):

    {id, title, term, case_id, docket_number, session,
     transcript: {title, duration,
        sections: [{start, stop, byte_start, byte_stop,
           turns: [{start, stop, speaker: {ID, name, roles[]},
              text_blocks: [{start, stop, byte_start, byte_stop, text}]}]}]}}

Schema-on-write (explicit StructType) + PERMISSIVE corrupt-record
capture reproduces the reference's defensive validation: malformed
files route to a junk sink instead of failing the job
(helpers.py:239-246; ingest/main.py:96-119).
"""

from __future__ import annotations

from pyspark.sql import types as T

SPEAKER = T.StructType(
    [
        T.StructField("ID", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("roles", T.ArrayType(T.StringType())),
    ]
)

TEXT_BLOCK = T.StructType(
    [
        T.StructField("start", T.DoubleType()),
        T.StructField("stop", T.DoubleType()),
        T.StructField("byte_start", T.LongType()),
        T.StructField("byte_stop", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

TURN = T.StructType(
    [
        T.StructField("start", T.DoubleType()),
        T.StructField("stop", T.DoubleType()),
        T.StructField("speaker", SPEAKER),
        T.StructField("text_blocks", T.ArrayType(TEXT_BLOCK)),
    ]
)

SECTION = T.StructType(
    [
        T.StructField("start", T.DoubleType()),
        T.StructField("stop", T.DoubleType()),
        T.StructField("byte_start", T.LongType()),
        T.StructField("byte_stop", T.LongType()),
        T.StructField("turns", T.ArrayType(TURN)),
    ]
)

TRANSCRIPT = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("duration", T.DoubleType()),
        T.StructField("sections", T.ArrayType(SECTION)),
    ]
)

OA_DOCUMENT = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("term", T.StringType()),
        T.StructField("case_id", T.StringType()),
        T.StructField("docket_number", T.StringType()),
        T.StructField("session", T.StringType()),
        T.StructField("transcript", TRANSCRIPT),
    ]
)

# unparseable documents carry their raw text here → junk sink
OA_DOCUMENT_WITH_CORRUPT = T.StructType(
    OA_DOCUMENT.fields + [T.StructField("_corrupt_record", T.StringType())]
)


def read_oa_json(spark, path: str):
    """Schema-enforced corpus read; corrupt rows carried, not dropped.

    One document per file (the reference's S3 layout,
    ingest/main.py:299-310): wholetext read + ``from_json`` instead of
    ``spark.read.json(multiLine=True)`` so (a) the raw text of a
    malformed file survives for the junk sink (helpers.py:239-246
    quarantines the original payload, not a parse stub) and (b) the
    corrupt-record column is a plain computed column Catalyst can
    filter on freely. ``input_file_name()`` reproduces the reference's
    key→metadata lineage (helpers.py:21-37, P4).
    """
    from pyspark.sql import functions as F

    raw = spark.read.text(path, wholetext=True)
    parsed = raw.select(
        F.input_file_name().alias("source_key"),
        F.from_json(
            "value",
            OA_DOCUMENT_WITH_CORRUPT,
            {"columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("doc"),
    )
    return parsed.select("source_key", "doc.*")
