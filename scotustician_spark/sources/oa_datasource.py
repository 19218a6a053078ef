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
    EqualTo,
    Filter,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
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
        for attempt in range(max_retries):
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
        self._term_filter: set[str] | None = None

    def pushFilters(self, filters: list[Filter]) -> Sequence[Filter]:
        """Accept term equality/membership filters — they prune entire
        partitions before any listing happens. Everything else stays
        with Spark."""
        remaining: list[Filter] = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("term",):
                self._term_filter = {str(f.value)}
            elif isinstance(f, In) and f.attribute == ("term",):
                self._term_filter = {str(v) for v in f.values}
            else:
                remaining.append(f)
        return remaining

    def partitions(self) -> Sequence[InputPartition]:
        terms = _term_dirs(self.root)
        if self._term_filter is not None:
            terms = [t for t in terms if t in self._term_filter]
        return [TermPartition(t) for t in terms]

    def read(self, partition: TermPartition) -> Iterator[tuple]:
        keys = _list_keys(self.root, partition.term)
        yield from _fetch_rows(self.root, partition.term, keys, self.rate, self.retries)


class OaDocsStreamReader(SimpleDataSourceStreamReader):
    """New-file discovery as a checkpointed offset: the offset is a
    per-term lexicographic high-watermark over file names; each batch
    reads only keys above it. Replaces the reference's ever-growing
    processed-keys probe (processors.py:97-101) with O(#terms) state."""

    def __init__(self, options):
        self.root = options["path"]
        self.rate = float(options.get("rate_per_sec", "0"))
        self.retries = int(options.get("max_retries", "3"))

    def initialOffset(self) -> dict:
        return {"watermarks": {}}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        marks = dict(start.get("watermarks", {}))
        rows: list[tuple] = []
        for term in _term_dirs(self.root):
            new = [k for k in _list_keys(self.root, term) if k > marks.get(term, "")]
            if new:
                rows.extend(_fetch_rows(self.root, term, new, self.rate, self.retries))
                marks[term] = new[-1]
        return iter(rows), {"watermarks": marks}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        s = start.get("watermarks", {})
        e = end.get("watermarks", {})
        rows: list[tuple] = []
        for term, hi in e.items():
            lo = s.get(term, "")
            keys = [k for k in _list_keys(self.root, term) if lo < k <= hi]
            rows.extend(_fetch_rows(self.root, term, keys, self.rate, self.retries))
        return iter(rows)


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
