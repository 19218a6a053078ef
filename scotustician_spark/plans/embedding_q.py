"""Embedding-inference query: runs the full distributed inference path
(Arrow-batched mapInPandas, per-executor model singleton pattern) with
the deterministic hash embedder, verified bit-for-bit by a SQL twin.
Swapping ``mode='model'`` reuses the identical plan with a real
sentence-transformers model (import-gated)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml.embedding import embed_text
from .registry import register
from .tables import load_table

_DIM = 8

_RAW = ", ".join(
    f"CAST(ascii(substring(md5(CAST({j} AS VARCHAR) || '|' || text), 1, 1)) AS DOUBLE) AS r{j}"
    for j in range(_DIM)
)
_NRM = "sqrt(" + " + ".join(f"r{j} * r{j}" for j in range(_DIM)) + ")"
_OUT = ", ".join(f"round(r{j} / nrm, 6) AS e{j}" for j in range(_DIM))


@register(
    "embed_documents",
    f"""
    WITH raw AS (SELECT doc_id, {_RAW} FROM documents),
    n AS (SELECT *, {_NRM} AS nrm FROM raw)
    SELECT doc_id, {_OUT} FROM n
    """,
    doc="C4/M4 embedding inference: pluggable-model mapInPandas stage "
    "(executor-singleton, Arrow batches); deterministic hash embedder in "
    "test mode so the oracle verifies the distributed path end-to-end; "
    "L2-normalized float64.",
    bench=True,
)
def embed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", normalize_ntz=False).select("doc_id", "text")
    out = embed_text(d, "text", dim=_DIM, mode="hash")
    return out.select(
        "doc_id", *[F.round(F.col("embedding")[j], 6).alias(f"e{j}") for j in range(_DIM)]
    )
