"""Python UDTFs (table functions) — the §2.10 UDF-surface member the
rest of the engine deliberately avoids.

Policy: every hot-path transform in this repo is a Catalyst expression
or an Arrow-batched Pandas UDF; a row-at-a-time Python UDTF is the
slow path and exists for the cases where a function genuinely returns
a *variable-length relation* per input row AND the logic is too
stateful/imperative for ``explode(transform(...))``. The canonical
example here mirrors the reference's section splitter
(services/transformers/helpers.py:117-200: one document row in, many
section rows out, with per-row running state).

Register with ``spark.udtf.register`` and call in SQL via
``LATERAL``; at scale the UDTF runs once per input partition worker —
parallelism follows the scan like any map, but every row crosses the
Python boundary, so prefer the expression form wherever one exists.
"""

from __future__ import annotations

import re

try:
    from pyspark.sql.functions import udtf
except ImportError:  # pragma: no cover - pyspark < 3.5
    udtf = None


if udtf is not None:

    @udtf(returnType="piece_idx int, piece string, char_start int, char_end int")
    class SplitWithOffsets:
        """Split text on sentence-ish boundaries, emitting one row per
        piece WITH running character offsets — the per-row state
        (offset accumulates across emitted pieces) is what an
        ``explode`` expression cannot carry without a window."""

        def eval(self, text: str):  # noqa: D102 - UDTF contract
            if not text:
                return
            offset = 0
            for i, piece in enumerate(re.split(r"(?<=[.!?])\s+", text)):
                if piece:
                    start = text.index(piece, offset)
                    yield i, piece, start, start + len(piece)
                    offset = start + len(piece)


def register_udtfs(spark) -> None:
    """Make the UDTFs callable from SQL (``LATERAL split_with_offsets(text)``)."""
    if udtf is None:  # pragma: no cover
        raise RuntimeError("Python UDTFs require pyspark >= 3.5")
    spark.udtf.register("split_with_offsets", SplitWithOffsets)
    spark.udtf.register("unpivot_csv_line", UnpivotCsvLine)


if udtf is not None:
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult
    from pyspark.sql.types import StringType, StructField, StructType

    @udtf
    class UnpivotCsvLine:
        """Polymorphic UDTF (Spark-4 ``analyze()``): the OUTPUT SCHEMA
        is computed at plan time from a constant argument — here, a
        comma-separated header names one output column per field, so
        ``unpivot_csv_line('a,b,c', line)`` yields typed (a, b, c)
        rows. This is the dynamic-schema half of the UDTF surface
        (SplitWithOffsets is the static-schema, stateful half): the
        schema exists BEFORE execution, so Catalyst can prune and
        push down on the generated columns like any relation.
        """

        @staticmethod
        def analyze(header: AnalyzeArgument, line: AnalyzeArgument) -> AnalyzeResult:
            if header.value is None:
                raise ValueError("unpivot_csv_line: header must be a constant")
            fields = [
                StructField(name.strip(), StringType())
                for name in str(header.value).split(",")
            ]
            return AnalyzeResult(StructType(fields))

        def eval(self, header: str, line: str):  # noqa: D102 - UDTF contract
            if line is None:
                return
            n = len(header.split(","))
            vals = [v.strip() or None for v in line.split(",")]
            vals = (vals + [None] * n)[:n]
            yield tuple(vals)
