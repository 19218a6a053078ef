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
