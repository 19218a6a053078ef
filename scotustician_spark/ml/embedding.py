"""Embedding inference (reference C4/M4: helpers.py:209-231 —
SentenceTransformer.encode over chunk texts, batch_size-grouped) and
the tokenizer surface (C2/C3: helpers.py:90-98,153 — HF token counts +
token-budget truncation).

Spark shape: Arrow-batched ``mapInPandas`` with a model/tokenizer
singleton initialized once per executor process (the
predict_batch_udf pattern) — batches stream through Python without
per-row serde. The model is PLUGGABLE:

* ``mode='hash'`` (default): a deterministic md5-derived unit vector —
  the test-mode embedder SURVEY §7 asks for, reproducible in SQL so
  the driver's DuckDB oracle verifies the full distributed inference
  path end-to-end (schema, batching, normalization).
* ``mode='model'``: real sentence-transformers, import-gated (not in
  this container) with per-executor singleton + configurable batch
  size; the surrounding plan is identical.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MODEL_SINGLETON = {}


def _hash_vector(text: str, dim: int) -> list[float]:
    """Deterministic pseudo-embedding: component j = ascii of the first
    md5 hex digit of ``"{j}|{text}"``, then L2-normalized in float64."""
    raw = [
        float(ord(hashlib.md5(f"{j}|{text}".encode()).hexdigest()[0]))
        for j in range(dim)
    ]
    nrm = sum(v * v for v in raw) ** 0.5
    return [v / nrm for v in raw]


def embed_text(
    df: DataFrame,
    text_col: str,
    out_col: str = "embedding",
    dim: int = 8,
    mode: str = "hash",
    model_name: str = "baai/bge-m3",
    batch_size: int = 16,
) -> DataFrame:
    """Append an ``array<double>`` embedding column.

    The reference asserts the produced dimension (helpers.py:306-307);
    here the schema declares it and the normalization guarantees
    finite values.
    """
    in_cols = df.columns
    schema = T.StructType(
        [df.schema[c] for c in in_cols]
        + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )

    def run_hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[text_col].map(lambda t: _hash_vector(t or "", dim))
            yield pdf

    def run_model(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-executor singleton: load once, reuse across batches
        if "model" not in _MODEL_SINGLETON:  # pragma: no cover - needs lib
            try:
                from sentence_transformers import SentenceTransformer
            except ImportError as e:
                raise NotImplementedError(
                    "mode='model' needs sentence-transformers (not in this "
                    "container); use mode='hash' for the deterministic "
                    "test-mode embedder"
                ) from e
            _MODEL_SINGLETON["model"] = SentenceTransformer(model_name)
        model = _MODEL_SINGLETON["model"]  # pragma: no cover
        for pdf in batches:  # pragma: no cover
            pdf = pdf.copy()
            vecs = model.encode(pdf[text_col].tolist(), batch_size=batch_size)
            pdf[out_col] = [v.tolist() for v in vecs]
            yield pdf

    from scotustician_spark.session import repartition_for_compute

    if mode == "hash_sql":
        # the hash embedder IS SQL-expressible — run it as Catalyst
        # expressions (guide §4.1: prefer built-ins; no JVM↔Python
        # boundary, no Arrow transpose). Bit-identical to mode='hash':
        # md5 over the same UTF-8 bytes, ascii of the first hex digit,
        # the norm sums j-ascending left-associative exactly like
        # _hash_vector's sum(), and glibc pow(x, 0.5)/Math.sqrt are
        # both correctly rounded so the normalization divisor matches
        # (asserted in tests). Composed pipelines (chunk_embed_pool)
        # use this arm; embed_documents keeps the mapInPandas arm —
        # that row exists to exercise the distributed-inference
        # plumbing the model arm shares (C4/M4).
        raw = [
            F.ascii(
                F.substring(
                    F.md5(
                        F.encode(
                            F.concat(
                                F.lit(f"{j}|"),
                                F.coalesce(F.col(text_col), F.lit("")),
                            ),
                            "utf-8",
                        )
                    ),
                    1,
                    1,
                )
            ).cast("double")
            for j in range(dim)
        ]
        nrm = F.sqrt(sum(r * r for r in raw))
        return df.withColumn(out_col, F.array(*[r / nrm for r in raw]))

    df = repartition_for_compute(df)
    if mode == "hash":
        return df.mapInPandas(run_hash, schema)
    if mode == "model":
        try:
            import sentence_transformers  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "mode='model' needs sentence-transformers (not in this "
                "container); use mode='hash' for the deterministic test-mode "
                "embedder"
            ) from e
        return df.mapInPandas(run_model, schema)  # pragma: no cover
    raise ValueError(f"unknown mode {mode!r}")


def hf_token_count(
    df: DataFrame, text_col: str, out_col: str = "token_count"
) -> DataFrame:
    """C2: exact tokenizer counts via a per-executor HF tokenizer
    singleton — import-gated; the JVM-side proxy is
    ``functions.text.bpe_ish_token_count`` (same column contract)."""
    try:
        import transformers  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "hf_token_count needs transformers; use "
            "functions.text.bpe_ish_token_count as the codegen proxy"
        ) from e
    # pragma: no cover - needs lib
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.LongType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from transformers import AutoTokenizer

        if "tok" not in _MODEL_SINGLETON:
            _MODEL_SINGLETON["tok"] = AutoTokenizer.from_pretrained("baai/bge-m3")
        tok = _MODEL_SINGLETON["tok"]
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[text_col].map(lambda t: len(tok.encode(t or "")))
            yield pdf

    return df.mapInPandas(run, schema)


def truncate_chars(df: DataFrame, text_col: str, max_chars: int) -> DataFrame:
    """C3 codegen proxy: char-budget truncation (the reference decodes
    the first 8000 tokens back to text; with ~4 chars/token the char
    budget is the JVM-side equivalent; hf mode plugs in like above)."""
    return df.withColumn(text_col, F.substring(F.col(text_col), 1, max_chars))
