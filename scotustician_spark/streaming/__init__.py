from scotustician_spark.streaming.dedup import dedup_stream
from scotustician_spark.streaming.incremental import (
    incremental_filter,
    run_available_now,
    stream_json_corpus,
)
from scotustician_spark.streaming.windows import sessionize, tumbling_agg

__all__ = [
    "dedup_stream",
    "incremental_filter",
    "run_available_now",
    "sessionize",
    "stream_json_corpus",
    "tumbling_agg",
]
