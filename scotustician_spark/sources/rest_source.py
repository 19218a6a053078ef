"""Throttled, retrying external-API source (reference S1/S2:
ingest/main.py:52-72,121-136 — 1 req/s token wait + tenacity
exponential backoff ×3 around every Oyez call).

Design: the fetch function is injected (tests use fakes) with a thin
stdlib ``urllib`` default matching the reference's live contract
(GET + timeout + User-Agent, non-2xx raises), and fetching runs
INSIDE ``mapPartitions`` so
a large key list distributes across executors — each partition
enforces its own token-bucket, so the cluster-wide rate is
``rate_per_sec × num_partitions`` (choose partitions = global_budget /
per-partition rate, the same arithmetic as the reference's
MAX_WORKERS threads). Everything downstream consumes the returned
DataFrame, keeping the engine testable offline (SURVEY §7 hard #6).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def urllib_fetcher(
    timeout_s: float = 30.0, user_agent: str = "scotustician-spark/1.0"
) -> Callable[[str], str]:
    """Default LIVE fetcher — the reference's HTTP contract
    (ingest/main.py:121-136: GET with timeout and a User-Agent header,
    non-2xx raises, body is UTF-8 text) on nothing but the stdlib.
    Returns a closure so it pickles cleanly into ``mapPartitions``
    tasks; urllib imports lazily inside the call, once per fetch path.
    Supports any urllib scheme — ``file://`` URLs make it fully
    testable offline. Still injection-replaceable: pass any
    ``key -> payload`` callable to ``fetch_keys`` instead (retries,
    rate limiting and quarantine behave identically either way)."""

    def fetch(url: str) -> str:
        import urllib.request

        req = urllib.request.Request(url, headers={"User-Agent": user_agent})
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            status = getattr(resp, "status", None)
            if status is not None and status >= 300:
                raise OSError(f"HTTP {status} for {url}")
            return resp.read().decode("utf-8")

    return fetch


def fetch_keys(
    spark: SparkSession,
    keys: list[str],
    fetcher: Callable[[str], str] | None = None,
    rate_per_sec: float = 1.0,
    max_retries: int = 3,
    backoff_base_s: float = 0.1,
    num_partitions: int = 1,
) -> DataFrame:
    """keys → DataFrame(key, payload, attempts, error).

    Failed keys are returned with ``error`` set instead of failing the
    job — the caller routes them to the junk sink (S4), mirroring the
    reference's per-case try/except (ingest/main.py:169-207).

    ``fetcher`` defaults to the live ``urllib_fetcher()`` (keys are
    then URLs); inject a fake for offline tests.
    """
    if fetcher is None:
        fetcher = urllib_fetcher()
    min_interval = 1.0 / rate_per_sec if rate_per_sec > 0 else 0.0

    def run_partition(it: Iterator) -> Iterator[tuple[str, str | None, int, str | None]]:
        last_call = 0.0
        for row in it:
            key = row[0]
            payload, err = None, None
            attempts = 0
            for attempt in range(max_retries):
                wait = min_interval - (time.monotonic() - last_call)
                if wait > 0:
                    time.sleep(wait)
                last_call = time.monotonic()
                attempts = attempt + 1
                try:
                    payload = fetcher(key)
                    err = None
                    break
                except Exception as e:  # noqa: BLE001 - quarantine, don't fail
                    err = f"{type(e).__name__}: {e}"
                    time.sleep(backoff_base_s * (2**attempt))
            yield (key, payload, attempts, err)

    kdf = spark.createDataFrame([(k,) for k in keys], "key string").repartition(
        num_partitions
    )
    return kdf.rdd.mapPartitions(run_partition).toDF(
        "key string, payload string, attempts int, error string"
    )


def parse_fetched(fetched: DataFrame, schema) -> tuple[DataFrame, DataFrame]:
    """Split fetched payloads into (parsed, junk) like the ingest
    validation path (ingest/main.py:96-119): fetch errors and
    unparseable payloads both quarantine with their raw context."""
    parsed = fetched.withColumn(
        "doc", F.from_json("payload", schema)
    )
    ok = parsed.filter(F.col("error").isNull() & F.col("doc.id").isNotNull())
    junk = parsed.filter(
        F.col("error").isNotNull() | F.col("doc.id").isNull()
    ).select(
        "key",
        F.coalesce("error", F.lit("unparseable payload")).alias("reason"),
        F.col("payload").alias("_corrupt_record"),
    )
    return ok.select("key", "doc.*"), junk
