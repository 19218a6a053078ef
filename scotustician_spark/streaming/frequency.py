"""Streaming heavy hitters: Misra-Gries summaries as keyed stream
state.

The batch operator (operators/frequency.py) bounds per-partition state
to k counters; the streaming twin keeps the SAME bounded summary as
``applyInPandasWithState`` state per shard key, updated every
micro-batch — frequent-item tracking over an unbounded stream in
O(shards × k) memory, total, forever. Emits the shard's current
candidate set (item, lower-bound count) each batch; exact counts, if
needed, come from the batch recount pass exactly as in the batch
operator.

The MG guarantee carries over batch boundaries because the summary
update is sequential over occurrences regardless of how they arrive:
any item with total stream frequency > n/k so far is present in its
shard's summary. Shard by a hash of the item (not one global key!) so
state updates parallelize and no executor holds more than k counters
per shard.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("item", StringType()),
        StructField("mg_count", LongType()),
    ]
)


def _mg_update(k: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            items, counts = state.get
            counters = dict(zip(items, counts))
        else:
            counters = {}
        for pdf in pdfs:
            for it in pdf["item"]:
                if it is None:
                    continue
                if it in counters:
                    counters[it] += 1
                elif len(counters) < k:
                    counters[it] = 1
                else:
                    dead = [key_ for key_ in counters if counters[key_] == 1]
                    for key_ in counters:
                        counters[key_] -= 1
                    for key_ in dead:
                        del counters[key_]
        state.update((list(counters.keys()), list(counters.values())))
        yield pd.DataFrame(
            {
                "shard": [shard] * len(counters),
                "item": list(counters.keys()),
                "mg_count": list(counters.values()),
            }
        )

    return update


def streaming_heavy_hitters(
    items: DataFrame, item_col: str = "item", k: int = 64, n_shards: int = 8
) -> DataFrame:
    """items stream → per-micro-batch snapshot of each shard's
    Misra-Gries summary (item, lower-bound count). State is exactly
    ``n_shards × k`` counters, independent of stream length."""
    from pyspark.sql.functions import abs as sql_abs

    sharded = items.select(
        (sql_abs(F.xxhash64(F.col(item_col))) % n_shards)
        .cast("int")
        .alias("shard"),
        F.col(item_col).alias("item"),
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _mg_update(k),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
