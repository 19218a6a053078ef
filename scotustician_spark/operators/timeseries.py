"""Time-series regularization: calendar gap-fill + LOCF interpolation.

A training-data/analytics warehouse constantly needs per-key daily (or
hourly) series with explicit zero/carried rows for missing periods —
trend models, retention curves and rate-of-change windows all assume a
dense time axis. The reference's analytics implicitly rely on Postgres
``generate_series`` idioms; here the dense axis is built IN-ROW with
``sequence()`` + ``explode`` (one array per key, no driver loop, no
cross join against a calendar table), so the plan scales as
O(keys × span) rows born directly in the scan stage.

Shape: one aggregation to the observed (key, day) grain, one in-row
span expansion, one left join observed→dense (equi on (key, day),
AQE-broadcastable), one LOCF window per key. The window partitions on
the series key — state is one row per partition frame, never the whole
series of all keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def gap_fill_daily(
    observed: DataFrame,
    key_col: str,
    date_col: str,
    zero_cols: list[str],
    locf_cols: list[str],
    span: tuple | None = None,
) -> DataFrame:
    """Densify ``observed`` (one row per (key, date)) onto a complete
    daily axis.

    - ``zero_cols``: filled with 0 on gap days (counts/sums);
    - ``locf_cols``: last observation carried forward (NULL before the
      first observation of the key);
    - ``span``: (start, end) date literals for the axis; None derives
      the GLOBAL min/max from the data (one tiny agg, broadcast as a
      scalar subquery via crossJoin of a 1-row frame).

    Emits (key, date, is_observed, *zero_cols, *locf_cols).
    """
    if span is None:
        bounds = observed.agg(
            F.min(date_col).alias("__lo"), F.max(date_col).alias("__hi")
        )
    else:
        bounds = observed.sparkSession.range(1).select(
            F.lit(span[0]).cast("date").alias("__lo"),
            F.lit(span[1]).cast("date").alias("__hi"),
        )
    keys = observed.select(key_col).distinct()
    # dense axis born in-row: sequence() builds each key's date array in
    # the project, explode turns it into rows — no calendar-table join
    dense = (
        keys.crossJoin(F.broadcast(bounds))
        .select(
            key_col,
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.expr("interval 1 day"))
            ).alias(date_col),
        )
    )
    # is_observed = join EXISTENCE, via a never-null literal marker on
    # the observed side — deriving it from a measure column's nullness
    # (the old form) misreported genuinely observed rows whose first
    # zero/locf column happened to be NULL (routine for LOCF columns),
    # and crashed outright when both column lists were empty
    joined = dense.join(
        observed.withColumn("__obs", F.lit(True)),
        [key_col, date_col],
        "left",
    )
    w = (
        W.partitionBy(key_col)
        .orderBy(date_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    any_obs = F.col("__obs").isNotNull()
    out_cols = [F.col(key_col), F.col(date_col), any_obs.alias("is_observed")]
    out_cols += [
        F.coalesce(F.col(c), F.lit(0).cast(dict(observed.dtypes)[c])).alias(c)
        for c in zero_cols
    ]
    out_cols += [
        F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in locf_cols
    ]
    return joined.select(*out_cols)
