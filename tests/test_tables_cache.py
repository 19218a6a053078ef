"""Memoized table loader + persisted derived-relation cache keying
(plans/tables.py): local (mtime, size) stamps, and the round-6
catalog-backed fallback — on a path os.stat cannot see (object
stores), the cache keys on the dataset MANIFEST's content hash, so a
republished dataset still re-keys instead of serving a stale relation
forever."""

from __future__ import annotations

import json

import pytest

from scotustician_spark.plans import tables as TB


@pytest.fixture
def no_local_stat(monkeypatch):
    """Simulate an object-store path: every _LOCAL_STAT call raises,
    exactly what os.stat does for s3a://... URIs."""

    def raising_stat(path):
        raise OSError(f"simulated non-local path: {path}")

    monkeypatch.setattr(TB, "_LOCAL_STAT", raising_stat)


def test_local_stamp_rekeys_on_overwrite(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(3).write.parquet(p)
    s1 = TB._path_stamp(p, spark)
    a = TB.load_table(spark, str(tmp_path), "t", normalize_ntz=False)
    assert a.count() == 3
    spark.range(7).write.mode("overwrite").parquet(p)
    assert TB._path_stamp(p, spark) != s1
    b = TB.load_table(spark, str(tmp_path), "t", normalize_ntz=False)
    assert b.count() == 7


def test_catalog_stamp_rekeys_without_local_stat(spark, tmp_path, no_local_stat):
    """VERDICT r5 #8: a stamp-less (os.stat-blind) path with an
    _ingest_manifest.json still re-keys on data change — the manifest
    hash IS the stamp — and keeps a stable key while the manifest is
    unchanged."""
    d = tmp_path / "ds.parquet"
    d.mkdir()
    spark.range(3).coalesce(1).write.mode("overwrite").parquet(str(d))
    (d / "_ingest_manifest.json").write_text(json.dumps({"version": 1, "rows": 3}))

    s1 = TB._path_stamp(str(d), spark)
    assert s1[1] == "manifest" and s1[2] == "_ingest_manifest.json"
    assert TB._path_stamp(str(d), spark) == s1  # stable while unchanged

    a = TB.load_table(spark, str(tmp_path), "ds", normalize_ntz=False)
    assert a.count() == 3

    # republish: new data + rewritten manifest -> different stamp,
    # fresh relation (the old mtime-blind key would have served 3)
    spark.range(9).coalesce(1).write.mode("overwrite").parquet(str(d))
    (d / "_ingest_manifest.json").write_text(json.dumps({"version": 2, "rows": 9}))
    s2 = TB._path_stamp(str(d), spark)
    assert s2 != s1
    b = TB.load_table(spark, str(tmp_path), "ds", normalize_ntz=False)
    assert b.count() == 9


def test_catalog_stamp_rekeys_on_content_identical_rewrite(
    spark, tmp_path, no_local_stat
):
    """Round-6 review: manifest CONTENT can collide across republishes
    (per-term counts unchanged by a one-doc correction) — the stamp
    must also carry the manifest file's mtime/length so a rewrite
    with identical bytes still re-keys (worst case: one harmless
    rebuild, never a stale serve)."""
    import os as _os

    d = tmp_path / "ds2.parquet"
    d.mkdir()
    mf = d / "_ingest_manifest.json"
    mf.write_text('{"terms": {"a": 3}, "total": 3}')
    _os.utime(mf, (1_000_000_000, 1_000_000_000))
    s1 = TB._path_stamp(str(d), spark)
    mf.write_text('{"terms": {"a": 3}, "total": 3}')  # same bytes
    _os.utime(mf, (1_000_000_999, 1_000_000_999))
    s2 = TB._path_stamp(str(d), spark)
    assert s1 != s2
    assert s1[3] == s2[3]  # content hash identical — mtime re-keyed


def test_snapshot_manifest_also_stamps(spark, tmp_path, no_local_stat):
    """The snapshot discipline's _MANIFEST works as the stamp too."""
    d = tmp_path / "v1"
    d.mkdir()
    (d / "_MANIFEST").write_text(json.dumps({"version": 1, "tables": {"x": 1}}))
    s = TB._path_stamp(str(d), spark)
    assert s[1:3] == ("manifest", "_MANIFEST")


def test_manifestless_remote_path_falls_back_to_path_key(spark, tmp_path, no_local_stat):
    """No manifest anywhere: keying degrades to path-only, matching
    plain spark.read semantics (documented limitation, never an
    error)."""
    d = tmp_path / "bare.parquet"
    d.mkdir()
    assert TB._path_stamp(str(d), spark) == (str(d), None, None)
    # nonexistent path: the Hadoop probe must not raise either
    assert TB._path_stamp("/no/such/dir", spark) == ("/no/such/dir", None, None)


def test_persisted_relation_rekeys_on_manifest_change(spark, tmp_path, no_local_stat):
    """The derived-relation cache (LSH/fingerprint index discipline)
    re-builds when the source manifest hash changes."""
    d = tmp_path / "src.parquet"
    d.mkdir()
    spark.range(4).coalesce(1).write.mode("overwrite").parquet(str(d))
    (d / "_ingest_manifest.json").write_text('{"v": 1}')

    builds = []

    def build():
        builds.append(1)
        return spark.read.parquet(str(d)).selectExpr("id", "id * 2 AS y")

    import uuid

    name = f"t6cache_{uuid.uuid4().hex[:6]}"
    r1 = TB.persisted_relation(spark, name, [str(d)], "p1", build)
    assert r1.count() == 4 and len(builds) == 1
    # same manifest -> served, no rebuild
    TB.persisted_relation(spark, name, [str(d)], "p1", build)
    assert len(builds) == 1
    # republished source -> new stamp -> rebuild
    spark.range(6).coalesce(1).write.mode("overwrite").parquet(str(d))
    (d / "_ingest_manifest.json").write_text('{"v": 2}')
    r2 = TB.persisted_relation(spark, name, [str(d)], "p1", build)
    assert r2.count() == 6 and len(builds) == 2
