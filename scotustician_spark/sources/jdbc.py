"""JDBC warehouse scan/sink (reference S8: the Postgres warehouse the
services read/write — database/lambda/schema.sql tables, psycopg2
reads in clustering/helpers.py).

Spark's native JDBC source already does the heavy lifting; what a
100 TB deployment must get right is captured here as the one wrapper
worth having:

- **Partitioned parallel reads** — without ``partitionColumn`` bounds
  the whole table arrives through ONE task regardless of cluster
  size. ``read_jdbc_partitioned`` makes the stride explicit and
  derives bounds with one cheap MIN/MAX pushdown query when not
  given.
- **Predicate pushdown** — filters on the returned DataFrame compile
  into the remote WHERE clause (``PushedFilters`` in the scan node;
  pinned by test), so the database ships only matching rows.

Tested against an EMBEDDED Derby database (the Derby jars ship inside
pyspark itself), so the full write → partitioned read → pushdown path
executes in CI with no external database.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_col: str,
    lower: int | None = None,
    upper: int | None = None,
    num_partitions: int = 8,
    driver: str | None = None,
    **options: str,
) -> DataFrame:
    """Partitioned JDBC table scan. ``partition_col`` must be numeric
    (or date-like) and indexed on the remote side; bounds default to a
    single pushed-down ``MIN/MAX`` probe query. Each of the
    ``num_partitions`` tasks then reads one stride — the scan
    parallelizes across executors instead of serializing through one
    connection."""
    reader = spark.read.format("jdbc").option("url", url).option(
        "dbtable", table
    )
    if driver:
        reader = reader.option("driver", driver)
    for k, v in options.items():
        reader = reader.option(k, v)
    if lower is None or upper is None:
        # ANSI-quoted identifiers: Spark's JDBC writer creates quoted
        # (case-exact) column names, so the probe must quote too
        # (Derby/Postgres; swap quoting for backtick dialects)
        probe = (
            f'(SELECT MIN("{partition_col}") AS lo, MAX("{partition_col}") AS hi '
            f"FROM {table}) bounds"
        )
        row = reader.option("dbtable", probe).load().collect()[0]
        b = {k.lower(): v for k, v in row.asDict().items()}
        if b["lo"] is None or b["hi"] is None:
            # empty table: MIN/MAX are NULL — no strides to cut, so
            # fall back to a plain unpartitioned load (0 rows) instead
            # of raising an opaque TypeError from int(None)
            return reader.option("dbtable", table).load()
        lower = int(b["lo"]) if lower is None else lower
        upper = int(b["hi"]) if upper is None else upper
    return (
        reader.option("dbtable", table)
        .option("partitionColumn", partition_col)
        .option("lowerBound", lower)
        .option("upperBound", upper + 1)
        .option("numPartitions", num_partitions)
        .load()
    )


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: str | None = None,
    **options: str,
) -> None:
    """JDBC sink (the reference's INSERT path, ingest → warehouse).
    Each task opens its own connection and batches inserts; pair with
    ``sinks.idempotent_append`` semantics upstream when the target has
    a key constraint."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        writer = writer.option("driver", driver)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.mode(mode).save()
