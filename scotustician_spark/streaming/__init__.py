from scotustician_spark.streaming.dedup import dedup_stream
from scotustician_spark.streaming.incremental import (
    incremental_filter,
    run_available_now,
    stream_json_corpus,
)
from scotustician_spark.streaming.joins import (
    stream_interval_join,
    stream_static_enrich,
)
from scotustician_spark.streaming.windows import hopping_agg, sessionize, tumbling_agg

__all__ = [
    "dedup_stream",
    "hopping_agg",
    "incremental_filter",
    "run_available_now",
    "sessionize",
    "stream_interval_join",
    "stream_json_corpus",
    "stream_static_enrich",
    "tumbling_agg",
]
