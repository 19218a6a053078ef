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


def test_real_mode_is_stubbed(bdf):
    with pytest.raises(NotImplementedError, match="PIL|cv2|ffmpeg"):
        extract_media_features(bdf, mode="real")
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        sample_frames(bdf, mode="real")


def test_media_metadata_struct(bdf):
    out = with_media_metadata(bdf, media_type="video", fmt="mp4")
    row = out.select("media_meta").limit(1).collect()[0]["media_meta"]
    assert row["media_type"] == "video" and row["format"] == "mp4"
    assert row["width"] is None and row["duration_s"] is None
    # schema is the typed struct, not a map
    assert dict(out.dtypes)["media_meta"].startswith("struct<media_type:string")
