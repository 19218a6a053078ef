"""Temporal joins: as-of join and binned range (interval) join.

SURVEY §2.3 notes the reference has *no* theta/range/as-of joins —
its temporal logic stops at interval arithmetic (bronze_oa_text.sql:
29-33) and event ordering by utterance index. These two operators are
the beyond-reference additions a training-data / event pipeline needs
(attach latest-known state to an event; correlate events within a
time window), built to scale:

- ``asof_join`` — union + single window pass. The naive formulation
  (inequality join then argmax per left row) explodes to O(|L|·|R|)
  per key; this one shuffles each row exactly once on the key, sorts
  within partition, and carries the right side's payload forward with
  ``last(..., ignorenulls=True)``. Cost is one Exchange + one sort —
  the same plan shape at 100 TB, with no pair blow-up on hot keys.
- ``range_join_binned`` — time-bucketed equi-join. Each left row is
  expanded to the (few) bins its window overlaps, joined on
  (key, bin) — an equi-shuffle Catalyst can plan as a hash join —
  then the exact range predicate filters bin-boundary false
  candidates. Duplication factor is ceil(window/bin)+1 (2 with the
  default bin = window width), vs the unbounded per-key cross
  product of a raw theta join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_SIDE = "__asof_side"
_TIE = "__asof_tie"
_TS = "__asof_ts_us"
_PAY = "__asof_payload"
_BIN = "__range_bin"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: dict[str, str],
    tie_col: str | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """Left as-of join: attach the nearest right row at-or-before
    (``direction='backward'``, the default) or at-or-after
    (``'forward'``) each left row's timestamp, per key. Left rows with
    no matching right row keep nulls (left-outer semantics) — the
    pandas ``merge_asof`` surface, distributed.

    ``right_payload`` maps right column -> output alias. Backward ties
    on the right timestamp break by ``tie_col`` max (latest state
    wins); forward ties by min. ``tolerance`` (same units as the ts
    columns) nulls the match when the right row is further than that
    from the left timestamp.

    Single shuffle either way: union the two sides tagged, ONE window
    ``partitionBy(on).orderBy(ts, side, tie)`` carrying the payload
    struct (``last`` over the preceding frame for backward, ``first``
    over the following frame for forward), then keep the left rows.
    Side ordering puts right rows inside the frame at an equal
    timestamp, so exact matches count in both directions.

    All payload columns travel as ONE struct (null only for left-tagged
    rows), so the carried value is always a consistent snapshot of a
    single right row — carrying columns independently would back-fill a
    NULL field of the latest right row from an older right row, mixing
    fields across rows (argmax semantics must surface that NULL).
    """
    from pyspark.sql.types import StructField, StructType

    assert direction in ("backward", "forward"), direction
    backward = direction == "backward"
    out_left = [c for c in left.columns]
    tie = tie_col if tie_col is not None else next(iter(right_payload))
    pay_fields = [
        StructField(dst, right.schema[src].dataType)
        for src, dst in right_payload.items()
    ]
    # the right ts rides INSIDE the struct so tolerance checks see the
    # matched row's own timestamp
    pay_type = StructType(pay_fields + [StructField("__rts", right.schema[right_ts].dataType)])

    # backward: right(0) sorts before left(1) at equal ts -> inside the
    # preceding frame; forward: left(0) before right(1) -> inside the
    # following frame. Exact-ts matches count in both directions.
    l_side, r_side = (1, 0) if backward else (0, 1)
    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias(_TS),
        F.lit(l_side).alias(_SIDE),
        F.lit(None).cast(right.schema[tie].dataType).alias(_TIE),
        *[F.col(c) for c in out_left if c != on],
        F.lit(None).cast(pay_type).alias(_PAY),
    )
    # backward wants the LATEST prior right row -> at equal (ts, side),
    # bigger tie must sort later in the preceding frame (tie asc, last
    # picks it); forward wants the EARLIEST following right row -> tie
    # asc again (first picks the smallest). One ordering serves both.
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias(_TS),
        F.lit(r_side).alias(_SIDE),
        F.col(tie).alias(_TIE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in out_left if c != on],
        F.struct(
            *[F.col(src).alias(dst) for src, dst in right_payload.items()],
            F.col(right_ts).alias("__rts"),
        ).alias(_PAY),
    )

    order = [F.col(_TS), F.col(_SIDE), F.col(_TIE)]
    if backward:
        w = W.partitionBy(on).orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
        carry = F.last(_PAY, ignorenulls=True)
    else:
        w = W.partitionBy(on).orderBy(*order).rowsBetween(W.currentRow, W.unboundedFollowing)
        carry = F.first(_PAY, ignorenulls=True)
    carried = l_tagged.unionByName(r_tagged).select(
        "*", carry.over(w).alias("__carried")
    )
    if tolerance is not None:
        gap = (
            (F.col(_TS) - F.col("__carried.__rts"))
            if backward
            else (F.col("__carried.__rts") - F.col(_TS))
        )
        carried = carried.withColumn(
            "__carried", F.when(gap <= tolerance, F.col("__carried"))
        )
    return carried.filter(F.col(_SIDE) == l_side).select(
        *[F.col(c) for c in out_left if c != on],
        F.col(on),
        *[F.col(f"__carried.{dst}").alias(dst) for dst in right_payload.values()],
    )


def funnel_stages(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
    max_step_gap: str | None = None,
) -> DataFrame:
    """Ordered-funnel mining: per user, the earliest time each stage of
    ``stages`` was reached IN ORDER (stage k counts only at-or-after
    the user's stage-k−1 time). Returns one row per user who reached
    stage 0, with ``t_0 … t_{k}`` timestamps (NULL once the user falls
    out of the funnel) — the standard event-sequence analysis
    (view → click → purchase) over an events stream.

    ``max_step_gap`` (an INTERVAL literal body, e.g. ``"7 days"``)
    additionally requires each stage within that gap of the previous
    one — a "conversion deadline" per step. PRECISE SEMANTICS: the
    deadline is measured from the user's EARLIEST in-order stage-(k−1)
    time (the same greedy chain the gapless variant walks) — a user
    whose only qualifying pair involves a LATER re-occurrence of the
    previous stage (view@0:00 … view@1:35 → click@1:40 with a 10 s
    gap) counts as dropped here, where an any-chain funnel would count
    them. The greedy-chain rule is what keeps the plan k filtered
    min-aggregations (any-chain needs a per-user ordered scan); both
    the SQL oracle and the tests pin the greedy semantics.

    Plan: one filtered min-aggregation per stage, each keyed on the
    user — k small hash aggregates + k−1 equi-joins on ``user_col``,
    no window over the raw event stream and no per-user event
    collection, so per-user event skew never concentrates memory.
    """
    assert len(stages) >= 1
    reach = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_0"))
    )
    out = reach
    for k, st in enumerate(stages[1:], start=1):
        ev_k = events.filter(F.col(type_col) == st).select(
            user_col, F.col(ts_col).alias("__ts")
        )
        cond = F.col("__ts") >= F.col(f"t_{k-1}")
        if max_step_gap is not None:
            cond = cond & (
                F.col("__ts")
                <= F.col(f"t_{k-1}") + F.expr(f"INTERVAL {max_step_gap}")
            )
        reach = (
            ev_k.join(reach.select(user_col, f"t_{k-1}"), user_col)
            .filter(cond)
            .groupBy(user_col)
            .agg(F.min("__ts").alias(f"t_{k}"))
        )
        out = out.join(reach.select(user_col, f"t_{k}"), user_col, "left")
    return out


def scd2_intervals(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tie_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension Type 2 build: collapse a change log
    (one row per observation of ``key``'s attributes) into validity
    intervals — one row per *state change*, with ``valid_from`` /
    ``valid_to`` (NULL = still current), ``is_current`` and a per-key
    ``version`` counter. The standard dimension-history table a
    warehouse maintains from CDC feeds; the reference's closest
    relative is the idempotent keyed upsert (helpers.py:287-296),
    which keeps only latest state — this keeps full history.

    Consecutive observations with identical attributes collapse into
    one interval (they are re-observations, not changes).

    Plan: ONE shuffle on ``key_col`` serves both window passes — the
    change-detection lag and the interval lead run over the same
    partitioning/ordering, and Catalyst plans them over a single
    Exchange+Sort. No self-join, no per-key collection: safe for keys
    with millions of observations.
    """
    order = [F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
    w = W.partitionBy(key_col).orderBy(*order)
    state = F.struct(*[F.col(c) for c in attr_cols])
    changed = (
        changes.withColumn("__prev", F.lag(state).over(w))
        # IS DISTINCT FROM semantics: first row per key (prev NULL) and
        # genuine attribute changes survive; NULL-safe so an attribute
        # flipping to/from NULL registers as a change
        .filter(~state.eqNullSafe(F.col("__prev")))
        .drop("__prev")
    )
    w2 = W.partitionBy(key_col).orderBy(*order)
    return changed.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    bin_us: int | None = None,
) -> DataFrame:
    """Inner range join: pairs where
    ``left_ts + lower_us <= right_ts < left_ts + upper_us`` and the
    key matches. Timestamp columns must be epoch-microsecond longs and
    the two sides must not share column names other than ``on``.

    The equi-join key is (on, time-bin): left rows fan out to every
    bin their window overlaps (``sequence`` + ``explode`` — a few
    rows, not a cross product), right rows land in exactly one bin.
    """
    if lower_us >= upper_us:
        # an inverted/empty window would make F.sequence DESCEND over
        # up to |upper-lower| bins per left row (default bin_us clamps
        # to 1) — an executor-memory blow-up in place of the correct
        # answer, which is simply "no pairs"; reject loudly instead
        raise ValueError(
            f"empty range window: lower_us={lower_us} >= upper_us={upper_us}"
        )
    if bin_us is None:
        bin_us = max(upper_us - lower_us, 1)
    lo = F.col(left_ts) + F.lit(lower_us)
    hi = F.col(left_ts) + F.lit(upper_us)
    l_binned = left.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(lo / F.lit(bin_us)).cast("long"),
                F.floor((hi - 1) / F.lit(bin_us)).cast("long"),
            )
        ).alias(_BIN),
    )
    r_binned = right.select(
        "*", F.floor(F.col(right_ts) / F.lit(bin_us)).cast("long").alias(_BIN)
    )
    return (
        l_binned.join(r_binned, [on, _BIN], "inner")
        .filter((F.col(right_ts) >= lo) & (F.col(right_ts) < hi))
        .drop(_BIN)
    )
