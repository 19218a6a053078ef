"""PySpark-4 Python DataSource for the term-partitioned document
corpus (reference S1/S2/S14: per-term REST listing + fetch,
ingest/main.py:121-136, throttle 52-72; prefix discovery,
visualization/helpers.py:20-71).

Where ``rest_source.fetch_keys`` is imperative plumbing the caller
wires up, this is the declarative surface a Spark user expects:

    spark.dataSource.register(OaDocsDataSource)
    spark.read.format("oa_docs").option("path", root).load()
    spark.readStream.format("oa_docs")...   # new-file discovery

Scale design:

- **One InputPartition per term** — fetching parallelizes across the
  cluster exactly like the reference's per-term jobs, and the
  per-partition token bucket recreates its 1-req/s throttle
  (cluster-wide rate = rate_per_sec × #terms, the same arithmetic as
  its MAX_WORKERS).
- **Filter pushdown prunes partitions**: ``.filter(col("term") ==
  "2024")`` reaches ``pushFilters``, and non-matching terms are never
  listed, let alone fetched — the custom-source analog of Hive-style
  partition pruning, which is what makes an incremental current-term
  run touch 1/45th of the corpus.
- **Streaming**: ``SimpleDataSourceStreamReader`` with a
  lexicographic high-watermark offset per term — the reference's
  "skip keys already in the DB" probe (processors.py:86-116) becomes
  a checkpointed offset, no warehouse round-trip.

The "fetch" here is a local filesystem read (layout
``root/term=<t>/<key>.json``) — the container has no network; the
HTTP fetch in production differs only inside ``_fetch_one``.
Unreadable files quarantine into the ``error`` column (S4 semantics),
never fail the job.
"""

from __future__ import annotations

import os
import time
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

SCHEMA = "term string, source_key string, payload string, error string"


def _term_dirs(root: str) -> list[str]:
    return sorted(
        d.split("=", 1)[1]
        for d in os.listdir(root)
        if d.startswith("term=") and os.path.isdir(os.path.join(root, d))
    )


def _list_keys(root: str, term: str) -> list[str]:
    d = os.path.join(root, f"term={term}")
    return sorted(f for f in os.listdir(d) if f.endswith(".json"))


def _fetch_one(root: str, term: str, key: str) -> str:
    with open(os.path.join(root, f"term={term}", key), encoding="utf-8") as fh:
        return fh.read()


def _fetch_rows(
    root: str, term: str, keys: list[str], rate_per_sec: float, max_retries: int
) -> Iterator[tuple]:
    min_interval = 1.0 / rate_per_sec if rate_per_sec > 0 else 0.0
    last_call = 0.0
    for key in keys:
        payload, err = None, None
        # at least ONE attempt always runs: max_retries=0 ("no
        # retries") must not silently yield payload=None error=None
        # for every row — data loss indistinguishable from success
        for attempt in range(max(1, max_retries)):
            wait = min_interval - (time.monotonic() - last_call)
            if wait > 0:
                time.sleep(wait)
            last_call = time.monotonic()
            try:
                payload = _fetch_one(root, term, key)
                err = None
                break
            except Exception as e:  # noqa: BLE001 — quarantine, don't fail
                err = f"{type(e).__name__}: {e}"
                time.sleep(0.01 * (2**attempt))
        yield (term, key, payload, err)


class TermPartition(InputPartition):
    def __init__(self, term: str):
        self.term = term


class OaDocsReader(DataSourceReader):
    def __init__(self, options):
        self.root = options["path"]
        self.rate = float(options.get("rate_per_sec", "0"))  # 0 = unthrottled
        self.retries = int(options.get("max_retries", "3"))
        # arrow=true: yield pyarrow RecordBatches instead of per-row
        # tuples — the PySpark-4 vectorized handoff (one Arrow buffer
        # crosses the Python→JVM boundary per batch, not one pickled
        # tuple per row); same rows, order and quarantine semantics
        self.arrow = options.get("arrow", "false").lower() == "true"
        self.batch_size = int(options.get("arrow_batch_size", "512"))
        self._term_filter: set[str] | None = None

    def pushFilters(self, filters: list[Filter]) -> Sequence[Filter]:
        """Accept term equality/membership filters — they prune entire
        partitions before any listing happens. Everything else stays
        with Spark.

        Accepted filters are conjunctive and Spark will NOT re-apply
        them, so multiple accepted term predicates INTERSECT (a
        last-wins overwrite would silently return rows violating the
        earlier filter — e.g. isin('2023') then isin('2024','2025')
        must yield nothing). ``In`` carries its tuple in ``.value``
        (same field name as EqualTo), not ``.values``."""
        remaining: list[Filter] = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("term",):
                accepted = {str(f.value)}
            elif isinstance(f, In) and f.attribute == ("term",):
                accepted = {str(v) for v in f.value}
            else:
                remaining.append(f)
                continue
            self._term_filter = (
                accepted
                if self._term_filter is None
                else self._term_filter & accepted
            )
        return remaining

    def partitions(self) -> Sequence[InputPartition]:
        terms = _term_dirs(self.root)
        if self._term_filter is not None:
            terms = [t for t in terms if t in self._term_filter]
        # an EMPTY partition list is not a valid plan for the Python
        # data source (Spark still schedules one read(None) task) —
        # a fully-pruned scan (e.g. two pushed term filters with an
        # empty intersection) ships one sentinel empty partition
        return [TermPartition(t) for t in terms] or [TermPartition("")]

    def read(self, partition: TermPartition) -> Iterator:
        if not getattr(partition, "term", None):
            return  # sentinel empty partition: fully pruned scan
        keys = _list_keys(self.root, partition.term)
        rows = _fetch_rows(self.root, partition.term, keys, self.rate, self.retries)
        if not self.arrow:
            yield from rows
            return
        import pyarrow as pa

        buf: list[tuple] = []

        def flush(b: list[tuple]):
            cols = list(zip(*b))
            return pa.RecordBatch.from_arrays(
                [pa.array(c, type=pa.string()) for c in cols],
                names=["term", "source_key", "payload", "error"],
            )

        for row in rows:
            buf.append(row)
            if len(buf) >= self.batch_size:
                yield flush(buf)
                buf = []
        if buf:
            yield flush(buf)


class OaDocsStreamReader(SimpleDataSourceStreamReader):
    """New-file discovery as a checkpointed offset: the offset is a
    per-term lexicographic high-watermark over file names; each batch
    reads only keys above it. Replaces the reference's ever-growing
    processed-keys probe (processors.py:97-101) with O(#terms) state.

    Replay semantics: within a run, each batch's EXACT planned file
    list is stashed in memory keyed by its end offset, so an
    intra-run replay re-reads precisely the files the original batch
    planned — never whatever a fresh directory listing happens to
    contain. After a driver restart the stash is gone and replay
    falls back to re-listing the (lo, hi] watermark window; a LATE
    file that landed below the watermark in the meantime is then
    included — the right call for this source, since such a file is
    otherwise below every future batch's low watermark and would be
    skipped forever, and the documented downstream contract
    (idempotent keyed sinks) absorbs any rows the original batch
    already delivered."""

    def __init__(self, options):
        self.root = options["path"]
        self.rate = float(options.get("rate_per_sec", "0"))
        self.retries = int(options.get("max_retries", "3"))
        self._planned: dict[str, dict[str, list[str]]] = {}

    @staticmethod
    def _offset_key(end: dict) -> str:
        import json

        return json.dumps(end.get("watermarks", {}), sort_keys=True)

    def initialOffset(self) -> dict:
        return {"watermarks": {}}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        marks = dict(start.get("watermarks", {}))
        rows: list[tuple] = []
        planned: dict[str, list[str]] = {}
        for term in _term_dirs(self.root):
            new = [k for k in _list_keys(self.root, term) if k > marks.get(term, "")]
            if new:
                rows.extend(_fetch_rows(self.root, term, new, self.rate, self.retries))
                marks[term] = new[-1]
                planned[term] = new
        end = {"watermarks": marks}
        self._planned[self._offset_key(end)] = planned
        while len(self._planned) > 16:  # only recent uncommitted
            self._planned.pop(next(iter(self._planned)))  # batches replay
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        stashed = self._planned.get(self._offset_key(end))
        s = start.get("watermarks", {})
        e = end.get("watermarks", {})
        rows: list[tuple] = []
        for term, hi in e.items():
            if stashed is not None:
                keys = stashed.get(term, [])
            else:  # post-restart fallback: re-list the offset window
                lo = s.get(term, "")
                keys = [k for k in _list_keys(self.root, term) if lo < k <= hi]
            rows.extend(_fetch_rows(self.root, term, keys, self.rate, self.retries))
        return iter(rows)


class OaStagedFiles(WriterCommitMessage):
    """Per-task manifest: (term, file name, staged path) triples plus
    the task's staging dir — everything commit/abort needs."""

    def __init__(self, stage_dir: str, entries: list[tuple[str, str, str]]):
        self.stage_dir = stage_dir
        self.entries = entries


def _stage_rows(root: str, iterator: Iterator) -> OaStagedFiles:
    """Task side of the two-phase commit: write every row to a
    task-unique staging dir, return the staged paths.

    Duplicate (term, source_key) rows within a task collapse to ONE
    staged file (last row wins) — without the dedup, two entries would
    point at one staged path and the second ``os.replace`` at publish
    time would crash mid-commit. Cross-task duplicates publish
    last-rename-wins (``os.replace`` is an atomic overwrite)."""
    import uuid

    stage_dir = os.path.join(root, "_staging", uuid.uuid4().hex)
    os.makedirs(stage_dir, exist_ok=True)
    import hashlib

    staged_by_name: dict[tuple[str, str], str] = {}
    for row in iterator:
        term, key = str(row["term"]), str(row["source_key"])
        name = key if key.endswith(".json") else f"{key}.json"
        # staged name = hash of the (term, name) PAIR: a separator
        # scheme like f"{term}__{name}" collides for distinct pairs
        # when the term itself contains the separator ('a__b','c' vs
        # 'a','b__c'), clobbering one payload and crashing the second
        # os.replace mid-publish. Staged names are temporary — the
        # real layout is rebuilt from the manifest ENTRIES at commit.
        digest = hashlib.md5(f"{len(term)}:{term}/{name}".encode()).hexdigest()
        staged = os.path.join(stage_dir, f"{digest}.json")
        with open(staged, "w", encoding="utf-8") as fh:
            fh.write(row["payload"] or "")
        staged_by_name[(term, name)] = staged
    entries = [(t, n, p) for (t, n), p in staged_by_name.items()]
    return OaStagedFiles(stage_dir, entries)


def _publish_staged(root: str, messages) -> dict[str, int]:
    """Driver side: atomically rename staged files into the
    ``term=<t>/`` layout; returns per-term published counts."""
    import shutil

    counts: dict[str, int] = {}
    seen: set[tuple[str, str]] = set()
    for m in messages:
        if m is None:
            continue
        for term, name, staged in m.entries:
            d = os.path.join(root, f"term={term}")
            os.makedirs(d, exist_ok=True)
            os.replace(staged, os.path.join(d, name))
            # cross-task duplicate keys overwrite (last rename wins);
            # count PUBLISHED files, not renames
            if (term, name) not in seen:
                seen.add((term, name))
                counts[term] = counts.get(term, 0) + 1
        shutil.rmtree(m.stage_dir, ignore_errors=True)
    return counts


def _drop_staged(messages) -> None:
    import shutil

    for m in messages:
        if m is not None:
            shutil.rmtree(m.stage_dir, ignore_errors=True)


class OaDocsWriter(DataSourceWriter):
    """Two-phase-commit document sink (the write half of S3/S5,
    ingest/main.py:299-325, with the commit protocol the reference's
    per-object PUTs lack).

    Tasks write every document to a task-unique ``_staging/`` dir and
    return the staged paths as their commit message — nothing is
    visible to readers while tasks run, so speculative duplicates,
    task retries and mid-job failures can never publish partial
    output. ``commit`` (driver, runs once, only if every task
    succeeded) atomically renames staged files into the
    ``term=<t>/<key>.json`` layout the reader scans and drops one
    ``_ingest_manifest.json`` with per-term counts (the reference's
    run-summary sink). ``abort`` deletes the staging dirs. This is
    the same job-commit discipline as Hadoop's FileOutputCommitter v1,
    expressed through the PySpark-4 writer API.
    """

    def __init__(self, options, overwrite: bool):
        self.root = options["path"]
        self.overwrite = overwrite

    def write(self, iterator: Iterator) -> OaStagedFiles:
        return _stage_rows(self.root, iterator)

    def commit(self, messages) -> None:
        import json
        import shutil

        if self.overwrite:
            for d in list(os.listdir(self.root)):
                if d.startswith("term="):
                    shutil.rmtree(os.path.join(self.root, d))
        counts = _publish_staged(self.root, messages)
        with open(
            os.path.join(self.root, "_ingest_manifest.json"), "w", encoding="utf-8"
        ) as fh:
            json.dump(
                {"terms": counts, "total": sum(counts.values())}, fh, sort_keys=True
            )

    def abort(self, messages) -> None:
        _drop_staged(messages)


class OaDocsStreamWriter(DataSourceStreamWriter):
    """Streaming sink half of the two-phase commit: each micro-batch
    stages on executors, publishes atomically in ``commit`` and
    records a per-batch manifest under ``_batch_manifests/``. The
    manifest doubles as the idempotency marker — Structured Streaming
    can re-run ``commit`` for an already-committed batchId after a
    failure/restart, and the replay must be a no-op (the staged
    duplicates are dropped, nothing double-publishes). Together with
    the checkpointed source offsets this gives the sink end-to-end
    exactly-once file publication."""

    def __init__(self, options):
        self.root = options["path"]

    def write(self, iterator: Iterator) -> OaStagedFiles:
        return _stage_rows(self.root, iterator)

    def _manifest_path(self, batch_id: int) -> str:
        return os.path.join(
            self.root, "_batch_manifests", f"batch-{batch_id}.json"
        )

    def commit(self, messages, batchId: int) -> None:
        import json

        marker = self._manifest_path(batchId)
        if os.path.exists(marker):
            _drop_staged(messages)  # replayed batch: publish nothing
            return
        counts = _publish_staged(self.root, messages)
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        with open(marker, "w", encoding="utf-8") as fh:
            json.dump(
                {"batch_id": batchId, "terms": counts,
                 "total": sum(counts.values())},
                fh,
                sort_keys=True,
            )

    def abort(self, messages, batchId: int) -> None:
        _drop_staged(messages)


class OaDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "oa_docs"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> OaDocsReader:
        return OaDocsReader(self.options)

    def simpleStreamReader(self, schema) -> OaDocsStreamReader:
        return OaDocsStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> OaDocsWriter:
        return OaDocsWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> OaDocsStreamWriter:
        return OaDocsStreamWriter(self.options)
