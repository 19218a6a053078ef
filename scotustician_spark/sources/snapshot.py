"""Multi-table consistent snapshot publication — the lakehouse
"transactional view" pattern without a table format.

The reference publishes related outputs as independent S3 writes, so a
reader can observe table A from run N and table B from run N−1. Here a
GROUP of relations publishes as one immutable snapshot version:

    root/
      v1/<table>/...      immutable parquet per table
      v1/_MANIFEST        row counts + table list (written LAST inside
                          the version — marks the version complete)
      LATEST              one-row JSON pointer, flipped LAST of all

Readers resolve LATEST once and read only ``v<N>/`` paths, so they keep
a consistent multi-table view while v<N+1> lands; a crash mid-publish
leaves a version dir without _MANIFEST (ignored) and the pointer
untouched. The same discipline as the persisted ANN index's versioned
publication (operators/ann_index.py::publish_ivfpq_version), lifted to
arbitrary table groups — e.g. the medallion bronze/silver/gold set, so
a dashboard never joins silver@N against gold@N−1. On S3-like stores
pair the pointer flip with a conditional put; in a Delta/Iceberg
deployment this is a multi-table transaction or a single COMMIT on a
shared catalog.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    ), hpath, jvm


def _write_text(spark: SparkSession, path: str, text: str) -> None:
    fs, hpath, _ = _fs(spark, path)
    out = fs.create(hpath, True)
    out.write(bytearray(text.encode()))
    out.close()


def _read_text(spark: SparkSession, path: str) -> str:
    # commons-io (on Spark's classpath via Hadoop) drains the stream
    # JVM-side; a Python-side read(byte[]) loop would see nothing —
    # py4j passes arrays by value, so Java-side mutation is lost
    fs, hpath, jvm = _fs(spark, path)
    stream = fs.open(hpath)
    try:
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        return bytes(data).decode()
    finally:
        stream.close()


def _complete_versions(spark: SparkSession, root: str) -> list[int]:
    fs, hroot, jvm = _fs(spark, root)
    if not fs.exists(hroot):
        return []
    out = []
    for st in fs.listStatus(hroot):
        name = st.getPath().getName()
        if name.startswith("v") and name[1:].isdigit() and fs.exists(
            jvm.org.apache.hadoop.fs.Path(st.getPath(), "_MANIFEST")
        ):
            out.append(int(name[1:]))
    return sorted(out)


def latest_snapshot_version(spark: SparkSession, root: str) -> int | None:
    """The LATEST pointer's version. Missing pointer → None; a pointer
    that exists but cannot be read RAISES (never silently restart at
    v1 over immutable versions — the ann_index discipline)."""
    fs, _, jvm = _fs(spark, f"{root}/LATEST")
    if not fs.exists(jvm.org.apache.hadoop.fs.Path(f"{root}/LATEST")):
        return None
    return int(json.loads(_read_text(spark, f"{root}/LATEST"))["version"])


def publish_snapshot(
    spark: SparkSession, tables: dict[str, DataFrame], root: str
) -> int:
    """Publish ``tables`` as the next immutable snapshot version and
    flip LATEST. Returns the new version number. Write order is the
    whole safety argument: per-table parquet → _MANIFEST (version now
    complete) → LATEST (readers can now see it)."""
    # Next version = past BOTH the pointer and any complete-but-
    # unpointed version: a crash between the _MANIFEST write and the
    # pointer flip leaves v<N> complete (readable via explicit time
    # travel) while LATEST still says N-1 — deriving from the pointer
    # alone would silently overwrite that immutable version in place.
    cur = latest_snapshot_version(spark, root) or 0
    done = _complete_versions(spark, root)
    nxt = max(cur, max(done, default=0)) + 1
    vdir = f"{root}/v{nxt}"
    manifest: dict[str, int] = {}
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(f"{vdir}/{name}")
        manifest[name] = spark.read.parquet(f"{vdir}/{name}").count()
    _write_text(
        spark,
        f"{vdir}/_MANIFEST",
        json.dumps({"version": nxt, "tables": manifest}),
    )
    _write_text(spark, f"{root}/LATEST", json.dumps({"version": nxt}))
    return nxt


def read_snapshot(
    spark: SparkSession, root: str, version: int | None = None
) -> dict[str, DataFrame]:
    """A CONSISTENT multi-table view: every returned relation reads
    from the same immutable ``v<N>/`` — publications after the resolve
    are invisible. ``version=None`` resolves LATEST; an explicit
    version gives time travel over retained snapshots."""
    v = latest_snapshot_version(spark, root) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no published snapshot under {root}")
    manifest = json.loads(_read_text(spark, f"{root}/v{v}/_MANIFEST"))
    return {
        name: spark.read.parquet(f"{root}/v{v}/{name}")
        for name in manifest["tables"]
    }


def prune_snapshots(spark: SparkSession, root: str, keep: int = 2) -> list[int]:
    """Drop all but the newest ``keep`` COMPLETE versions (incomplete
    crash leftovers are removed too, except anything at or above the
    newest kept version). The version LATEST points to is never
    dropped, even in a torn-publish state where a newer complete-but-
    unpointed version exists — pruning the pointer's target would
    break every ``read_snapshot()``. Returns the dropped versions."""
    fs, hroot, jvm = _fs(spark, root)
    done = _complete_versions(spark, root)
    cutoff = done[-keep] if len(done) >= keep else (done[0] if done else 0)
    pointed = latest_snapshot_version(spark, root)
    if pointed is not None:
        cutoff = min(cutoff, pointed)
    dropped = []
    if not fs.exists(hroot):
        return dropped
    for st in fs.listStatus(hroot):
        name = st.getPath().getName()
        if name.startswith("v") and name[1:].isdigit() and int(name[1:]) < cutoff:
            fs.delete(st.getPath(), True)
            dropped.append(int(name[1:]))
    return sorted(dropped)
