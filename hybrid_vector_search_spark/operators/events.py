"""Event-stream operators (batch form): tumbling windows, sessionization,
semi-structured props extraction.

The reference has no streaming/time-series surface (SURVEY.md §2.7) — these
are the training-pipeline extensions over the driver's ``events`` table
(event_id, ts, user_id, event_type, value, props JSON-string). Each operator
is pure DataFrame algebra so the same plan runs:

* batch — as registered in plans/registry.py with a DuckDB oracle;
* streaming — the identical ``tumbling_window_agg`` expression runs under
  ``readStream`` with a watermark (streaming/pipeline.py); sessionization's
  streaming twin is ``applyInPandasWithState`` (streaming/stateful.py).

Scale notes: the window agg is one shuffle on (window, event_type) with
map-side partial aggregation; sessionization shuffles once on ``user_id``
and both window functions reuse that single partitioning (Catalyst plans
one Exchange). ``props`` parsing is ``get_json_object`` — JVM-side, no
Python. At 100 TB, partition the events source by date so the window agg
prunes to the queried time range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hybrid_vector_search_spark.functions.portable import (
    grid_avg,
    grid_avg_sql,
    round_portable,
    round_portable_sql,
)

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def tumbling_window_agg(
    events: DataFrame, duration: str = "1 hour"
) -> DataFrame:
    """Per-(tumbling-window, event_type) counts and value sums.

    ``F.window`` aligns buckets to the epoch — identical bucketing to
    DuckDB ``time_bucket`` for whole-hour durations. Window start is
    rendered as a formatted string for engine-portable comparison.
    """
    return (
        events.groupBy(
            F.window("ts", duration).alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # value is a 2-decimal grid column: sums/averages land on
            # exact rounding ties — portable arithmetic, not ROUND
            round_portable(F.sum("value"), 2).alias("sum_value"),
            grid_avg(F.sum("value"), F.count(F.lit(1)), 2, 6).alias("avg_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format(F.col("w.start"), TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
            "n_users",
        )
    )


def tumbling_window_agg_sql(hours: int = 1) -> str:
    """DuckDB oracle for :func:`tumbling_window_agg`."""
    return f"""SELECT
  strftime(time_bucket(INTERVAL {hours} HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type,
  COUNT(*) AS n_events,
  {round_portable_sql('SUM(value)', 2)} AS sum_value,
  {grid_avg_sql('SUM(value)', 'COUNT(*)', 2, 6)} AS avg_value,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type"""


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Assign each event a per-user ``session_seq``: a new session starts
    when the gap since the previous event exceeds ``gap_minutes``.

    Two stacked window functions over the same (user_id | ts, event_id)
    ordering — Catalyst plans a single Exchange + Sort, then both lag and
    running-sum run in one window stage. ``event_id`` is the deterministic
    tiebreaker for equal timestamps.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = gap_minutes * 60
    is_new = F.when(
        F.lag("ts").over(w).isNull()
        | (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
            > gap_s
        ),
        1,
    ).otherwise(0)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("__is_new", is_new).withColumn(
        "session_seq", F.sum("__is_new").over(running).cast("long")
    ).drop("__is_new")


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-(user, session) stats: event count, span seconds, start/end."""
    s = sessionize(events, gap_minutes)
    return (
        s.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), TS_FMT).alias("session_start"),
            F.date_format(F.max("ts"), TS_FMT).alias("session_end"),
            (
                F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
            ).alias("span_sec"),
            round_portable(F.sum("value"), 2).alias("sum_value"),
        )
    )


def session_stats_sql(gap_minutes: int = 30) -> str:
    """DuckDB oracle for :func:`session_stats`.

    The gap comparison uses epoch-second granularity in both engines
    (Spark ``unix_timestamp`` truncates sub-second parts; mirrored here
    with ``date_trunc('second', ...)``).
    """
    return f"""WITH lagged AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR date_trunc('second', ts) - date_trunc('second', LAG(ts) OVER w)
              > INTERVAL {gap_minutes * 60} SECOND
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, value,
    CAST(SUM(is_new) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM lagged
)
SELECT user_id, session_seq,
  COUNT(*) AS n_events,
  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
  CAST(epoch(date_trunc('second', MAX(ts)))
     - epoch(date_trunc('second', MIN(ts))) AS BIGINT) AS span_sec,
  {round_portable_sql('SUM(value)', 2)} AS sum_value
FROM sess
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq"""


def props_profile(events: DataFrame) -> DataFrame:
    """Semi-structured extraction: pull ``$.k`` out of the ``props`` JSON
    string (JVM ``get_json_object`` — no Python, stays in codegen) and
    profile it per event_type."""
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.withColumn("__k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("__k").alias("n_with_k"),
            # integer-grid average: same portable-rounding hazard
            grid_avg(F.sum("__k"), F.count("__k"), 0, 6).alias("avg_k"),
            F.min("__k").alias("min_k"),
            F.max("__k").alias("max_k"),
        )
    )


def props_profile_sql() -> str:
    """DuckDB oracle for :func:`props_profile`."""
    return f"""SELECT event_type,
  COUNT(*) AS n_events,
  COUNT(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS n_with_k,
  {grid_avg_sql("SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))", "COUNT(CAST(json_extract_string(props, '$.k') AS INTEGER))", 0, 6)} AS avg_k,
  MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
  MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type"""


def funnel_counts(
    events: DataFrame, stages: tuple[str, ...] = ("view", "click", "purchase")
) -> DataFrame:
    """Ordered-funnel analysis: how many users performed stage 1, then
    stage 2 strictly after their first stage-1 event, then stage 3
    strictly after that, … — the product-analytics conversion funnel.

    Each stage is one groupBy (first qualifying timestamp per user)
    joined to the previous stage's table on user_id; survivors shrink
    monotonically, so later joins are against ever-smaller sides. Output
    is a single row of per-stage user counts.
    """
    prev: DataFrame | None = None
    counts = []
    for i, stage in enumerate(stages):
        ev = events.filter(F.col("event_type") == stage)
        if prev is not None:
            ev = ev.join(prev, "user_id").filter(F.col("ts") > F.col("__t"))
        cur = ev.groupBy("user_id").agg(F.min("ts").alias("__t"))
        counts.append(
            cur.agg(F.count(F.lit(1)).alias(f"n_{'_'.join(stages[: i + 1])}"))
        )
        prev = cur
    out = counts[0]
    for c in counts[1:]:
        out = out.crossJoin(c)
    return out


def funnel_counts_sql(
    stages: tuple[str, ...] = ("view", "click", "purchase")
) -> str:
    """DuckDB oracle for :func:`funnel_counts`."""
    ctes, prev = [], None
    for i, stage in enumerate(stages):
        name = f"s{i}"
        if prev is None:
            ctes.append(
                f"{name} AS (SELECT user_id, MIN(ts) AS t FROM events "
                f"WHERE event_type = '{stage}' GROUP BY user_id)"
            )
        else:
            ctes.append(
                f"{name} AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e "
                f"JOIN {prev} USING (user_id) "
                f"WHERE e.event_type = '{stage}' AND e.ts > {prev}.t "
                f"GROUP BY e.user_id)"
            )
        prev = name
    sels = ", ".join(
        f"(SELECT COUNT(*) FROM s{i}) AS n_{'_'.join(stages[: i + 1])}"
        for i in range(len(stages))
    )
    return f"WITH {', '.join(ctes)}\nSELECT {sels}"
