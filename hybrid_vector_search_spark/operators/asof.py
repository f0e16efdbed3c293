"""As-of (point-in-time) and range joins — time-series operators Spark's
built-in join set lacks (the brief's canonical "custom operator" case).

``asof_join_backward`` implements the classic distributed as-of via the
union-and-carry trick, NOT a per-row lookup:

1. tag both inputs and union them (schema-aligned, right's carried columns
   nulled on left rows and vice versa);
2. one window over ``(keys | time, side)`` carries the last non-null right
   row forward (``last(..., ignorenulls=True)``);
3. keep only left rows — each now paired with the most recent right row at
   or before its timestamp.

Cost: ONE shuffle on the join keys (the window sort), no theta-join, no
per-row probe. This is the plan a 100 TB backfill wants: both sides
shuffle-partition on the key, the window sorts within partitions, and
skew in event volume is AQE's problem, not a cross product. Right-side
ties on (key, time) resolve to the largest tiebreaker column value
(deterministic), matching the stable-order contract used everywhere else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_time: str,
    right_time: str,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: for every left row, attach the right row with the
    greatest ``right_time <= left_time`` within the same key group
    (inclusive backward match — a right row at the exact left timestamp
    matches). Left rows with no prior right row keep NULL carried columns.
    """
    keys = [on] if isinstance(on, str) else list(on)
    # right_time itself is carried too — "when was the matched row" is part
    # of the standard as-of output
    carry = carry_cols or [c for c in right.columns if c not in keys]

    lhs = left.withColumn("__side", F.lit(1)).withColumn(
        "__t", F.col(left_time)
    )
    for c in carry:
        lhs = lhs.withColumn(f"__r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    rhs = right.withColumn("__side", F.lit(0)).withColumn(
        "__t", F.col(right_time)
    )
    for c in carry:
        rhs = rhs.withColumn(f"__r_{c}", F.col(c))
    left_only = [
        c for c in left.columns if c not in keys
    ]
    for c in left_only:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    cols = keys + left_only + ["__side", "__t"] + [f"__r_{c}" for c in carry]
    unioned = lhs.select(*cols).unionByName(rhs.select(*cols))

    # right rows sort before left rows at equal time → inclusive backward
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *keys,
        *left_only,
        "__side",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__c_{c}")
            for c in carry
        ],
    )
    out = carried.filter(F.col("__side") == 1).drop("__side")
    for c in carry:
        out = out.withColumnRenamed(f"__c_{c}", c)
    return out


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_time: str,
    right_time: str,
    window_seconds: int,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """Interval/range join reduced to a count: for each left row, how many
    right rows share the key and fall in ``(left_time - window, left_time]``.

    Time-bucketed plan: both sides get a coarse bucket key
    ``floor(unix_micros(t) / window)``; a right row in range always lands
    in the left row's bucket or the one before, so the left side explodes
    into two probe buckets and the join runs as a pure equi-join on
    ``(keys…, bucket)`` with the exact range predicate evaluated inside
    the same join. Per-match fan-out is bounded by rows per (key, 2·window)
    — not per key, so one hot user with a year of history no longer
    produces a quadratic post-filtered blow-up. Left rows with no match
    survive the left join (count 0); a matching right row joins exactly
    one of the two probe buckets, so no double counting.
    """
    keys = [on] if isinstance(on, str) else list(on)
    w_us = window_seconds * 1_000_000
    lhs = left.withColumn(
        "__pb",
        F.explode(
            F.array(
                F.expr(f"unix_micros({left_time}) div {w_us}") - 1,
                F.expr(f"unix_micros({left_time}) div {w_us}"),
            )
        ),
    )
    rhs = right.withColumn("__b", F.expr(f"unix_micros({right_time}) div {w_us}"))
    lt, rt = F.col(f"l.{left_time}"), F.col(f"r.{right_time}")
    cond = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in keys]
    cond.append(F.col("l.__pb") == F.col("r.__b"))
    in_range = (rt <= lt) & (
        rt > lt - F.expr(f"INTERVAL {window_seconds} SECONDS")
    )
    joined = lhs.alias("l").join(rhs.alias("r"), cond + [in_range], "left")
    left_cols = [F.col(f"l.{c}") for c in left.columns]
    return joined.groupBy(*left_cols).agg(
        F.count(F.col(f"r.{right_time}")).alias(count_alias)
    )
