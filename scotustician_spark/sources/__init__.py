from scotustician_spark.sources.rest_source import fetch_keys, parse_fetched
from scotustician_spark.sources.sinks import (
    count_gate,
    idempotent_append,
    run_summary,
    write_partitioned,
    write_quarantine,
)

__all__ = [
    "count_gate",
    "fetch_keys",
    "idempotent_append",
    "parse_fetched",
    "run_summary",
    "write_partitioned",
    "write_quarantine",
]
