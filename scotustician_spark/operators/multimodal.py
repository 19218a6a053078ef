"""Multimodal (image/audio/video) column plumbing.

Beyond-reference training-pipeline operators: media travel as opaque
``binary`` columns with typed metadata structs; decode / feature
extraction / frame sampling run as Arrow-batched ``mapInPandas``
stages (the only sane shape for Python media libs at scale: one
pandas batch per task, library initialized once per partition, bytes
never round-trip through the driver).

The actual media decode is STUBBED: real decoders (PIL/cv2/ffmpeg)
are not in this container, so ``mode='real'`` raises
NotImplementedError at the single clearly-marked point, and
``mode='fake'`` substitutes a deterministic byte-level feature
extractor (md5/length-derived) — the Spark-side plumbing (schema,
batching, partitioning, UDF signatures) is real and tested either
way, and the fake is SQL-reproducible so the driver oracle can verify
the full distributed path.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import repartition_for_compute

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)


def _fake_features(content: bytes, n_dims: int) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector:
    dims j = ascii(md5_hex[j]) — reproducible in any engine."""
    h = hashlib.md5(content).hexdigest()
    return [float(ord(h[j])) for j in range(n_dims)]


def extract_media_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    n_dims: int = 8,
    mode: str = "fake",
) -> DataFrame:
    """binary content → (id, n_bytes, content_md5, features[n_dims]).

    Arrow-batched mapInPandas: each task processes whole record
    batches; a real decoder would be initialized once per partition in
    the generator prologue (the predict_batch_udf pattern, C4).
    """
    if mode == "real":
        raise NotImplementedError(
            "real media decode needs PIL/cv2/ffmpeg (not in this container); "
            "use mode='fake' for the deterministic byte-level extractor"
        )

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("content_md5", T.StringType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # <- real decoder init would go here, once per partition
        for pdf in batches:
            content = pdf[content_col]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "n_bytes": content.map(len).astype("int64"),
                    "content_md5": content.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "features": content.map(
                        lambda b: _fake_features(bytes(b), n_dims)
                    ),
                }
            )

    return repartition_for_compute(df.select(id_col, content_col)).mapInPandas(
        run, schema
    )


def sample_frames(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    n_frames: int = 4,
    mode: str = "fake",
) -> DataFrame:
    """Video-style frame sampling: each binary explodes into
    ``n_frames`` evenly-spaced byte slices with offset metadata and a
    per-frame digest (a real implementation would seek keyframes; the
    slicing/fan-out plumbing is identical). 1 row in → n rows out via
    mapInPandas — the UDTF shape.
    """
    if mode == "real":
        raise NotImplementedError(
            "real frame decode needs ffmpeg bindings; mode='fake' slices bytes"
        )

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("byte_start", T.LongType()),
            T.StructField("byte_len", T.LongType()),
            T.StructField("frame_md5", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in schema.fields}
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                b = bytes(content)
                step = len(b) // n_frames
                if step == 0:
                    continue  # shorter than one frame per slot → skip
                for k in range(n_frames):
                    sl = b[k * step : (k + 1) * step]
                    out["id"].append(int(rid))
                    out["frame_idx"].append(k)
                    out["byte_start"].append(k * step)
                    out["byte_len"].append(len(sl))
                    out["frame_md5"].append(hashlib.md5(sl).hexdigest())
            yield pd.DataFrame(out)

    return repartition_for_compute(df.select(id_col, content_col)).mapInPandas(
        run, schema
    )


def with_media_metadata(
    df: DataFrame,
    content_col: str = "content",
    media_type: str = "image",
    fmt: str = "raw",
) -> DataFrame:
    """Attach the typed metadata struct (decode-free fields only; a
    real decoder would fill width/height/duration)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("double").alias("duration_s"),
        ),
    )
