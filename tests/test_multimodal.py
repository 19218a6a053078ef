"""Multimodal plumbing tests: Arrow-batched feature extraction, frame
fan-out, metadata struct, and the clearly-marked real-decode stubs."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from scotustician_spark.operators.multimodal import (
    extract_media_features,
    sample_frames,
    with_media_metadata,
)


@pytest.fixture(scope="module")
def bdf(spark):
    rows = [(1, b"hello world, this is binary content"), (2, b"tiny"), (3, b"")]
    return spark.createDataFrame(rows, "doc_id long, content binary")


def test_extract_features_deterministic(bdf):
    out = {r["id"]: r for r in extract_media_features(bdf, "content", "doc_id").collect()}
    assert len(out) == 3
    for rid, content in [(1, b"hello world, this is binary content"), (2, b"tiny")]:
        h = hashlib.md5(content).hexdigest()
        assert out[rid]["content_md5"] == h
        assert out[rid]["n_bytes"] == len(content)
        assert out[rid]["features"] == [float(ord(h[j])) for j in range(8)]


def test_sample_frames_fanout_and_skip(bdf):
    frames = sample_frames(bdf, "content", "doc_id", n_frames=4).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["id"], []).append(r)
    # 36 bytes → step 9, 4 frames; 4 bytes → step 1, 4 frames; 0 bytes → skipped
    assert sorted(by_id) == [1, 2]
    for rid, rows in by_id.items():
        assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == [0, 1, 2, 3]
        content = b"hello world, this is binary content" if rid == 1 else b"tiny"
        step = len(content) // 4
        for r in rows:
            sl = content[r["frame_idx"] * step : (r["frame_idx"] + 1) * step]
            assert r["byte_len"] == step
            assert r["frame_md5"] == hashlib.md5(sl).hexdigest()


def test_real_mode_unknown_bytes_raise(bdf):
    # text bytes are not a recognized media container: the real path
    # must refuse loudly, not silently fall back to the fake features
    from pyspark.errors import PythonException

    with pytest.raises(PythonException, match="unrecognized media container"):
        extract_media_features(
            bdf.filter(F.col("doc_id") == 1), mode="real"
        ).collect()
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        sample_frames(bdf, mode="real")


def _make_wav(n_frames: int = 8000, rate: int = 8000) -> bytes:
    """1-channel 16-bit PCM: first half silence, second half a
    full-scale square wave (RMS == amplitude)."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        half = n_frames // 2
        samples = [0] * half + [
            32767 if i % 2 == 0 else -32767 for i in range(n_frames - half)
        ]
        w.writeframes(struct.pack(f"<{n_frames}h", *samples))
    return buf.getvalue()


def test_real_wav_decode_distributed(spark):
    """REAL audio decode (stdlib wave parser) through the distributed
    mapInPandas path: silence and the loud half land in the right
    feature chunks, duration comes from the actual header."""
    wav = _make_wav()
    df = spark.createDataFrame([(1, wav)], "doc_id long, content binary")
    out = extract_media_features(df, mode="real", n_dims=4).collect()
    assert len(out) == 1
    feats = out[0]["features"]
    assert len(feats) == 4
    assert feats[0] == 0.0 and feats[1] == 0.0  # silent half
    assert feats[2] > 0.99 and feats[3] > 0.99  # square wave RMS ≈ 1
    assert out[0]["n_bytes"] == len(wav)


def test_probe_media_metadata_headers(spark):
    """Header-level probe needs no optional deps: WAV duration and
    PNG/GIF/JPEG dimensions parse from raw struct layouts."""
    import struct

    from scotustician_spark.operators.multimodal import probe_media_metadata

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", 640, 480)
        + b"\x08\x02\x00\x00\x00"
        + b"\x00\x00\x00\x00"
    )
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 6
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xc0"
        + struct.pack(">H", 17)
        + b"\x08"
        + struct.pack(">HH", 240, 360)
        + b"\x00" * 10
    )
    rows = [(1, _make_wav()), (2, png), (3, gif), (4, jpeg), (5, b"plain")]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {
        r["id"]: r["media_meta"].asDict()
        for r in probe_media_metadata(df).collect()
    }
    assert got[1]["media_type"] == "audio" and got[1]["format"] == "wav"
    assert got[1]["duration_s"] == pytest.approx(1.0)
    assert (got[2]["width"], got[2]["height"]) == (640, 480)
    assert (got[3]["width"], got[3]["height"]) == (320, 200)
    assert (got[4]["width"], got[4]["height"]) == (360, 240)
    assert got[4]["format"] == "jpeg"
    assert got[5]["media_type"] is None and got[5]["format"] is None


def test_real_image_pixels_pil_gated(spark):
    """Pixel decode requires PIL; with it absent the kernel raises the
    documented NotImplementedError, with it present a black PNG's
    histogram mass lands in bucket 0."""
    import struct

    png_sig = b"\x89PNG\r\n\x1a\n"
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        from pyspark.errors import PythonException

        png = (
            png_sig
            + struct.pack(">I", 13)
            + b"IHDR"
            + struct.pack(">II", 2, 2)
            + b"\x08\x02\x00\x00\x00"
            + b"\x00" * 4
        )
        df = spark.createDataFrame([(1, png)], "doc_id long, content binary")
        with pytest.raises(PythonException, match="needs PIL"):
            extract_media_features(df, mode="real").collect()
        return
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (4, 4), 0).save(buf, format="PNG")
    df = spark.createDataFrame([(1, buf.getvalue())], "doc_id long, content binary")
    feats = extract_media_features(df, mode="real", n_dims=8).collect()[0][
        "features"
    ]
    assert feats[0] == pytest.approx(1.0) and sum(feats) == pytest.approx(1.0)


def test_media_metadata_struct(bdf):
    out = with_media_metadata(bdf, media_type="video", fmt="mp4")
    row = out.select("media_meta").limit(1).collect()[0]["media_meta"]
    assert row["media_type"] == "video" and row["format"] == "mp4"
    assert row["width"] is None and row["duration_s"] is None
    # schema is the typed struct, not a map
    assert dict(out.dtypes)["media_meta"].startswith("struct<media_type:string")
