"""Event-stream analytics: sessionization, cohort retention, conversion lag.

The reference exporters only materialize static dimension CSVs; these are the
behavioral-analytics counterparts a warehouse built on the same engine needs
(and the batch siblings of ``streaming/windows.py``'s session windows).

Scale shapes (all pure Catalyst — no UDFs, no driver loops):

- ``sessionize``: one shuffle on the user key feeds BOTH window passes (lag
  and running sum share the same (user, ts-order) sort), then a map-side-
  combined groupBy on (user, session). Session count per user is data-bounded,
  never collected.
- ``cohort_retention``: per-user first-event via map-side-combined ``min``;
  the (user, week) activity set dedups map-side before the join; the join is
  keyed on user_id so it co-partitions with the first-event agg. The result
  is cohort×offset — tiny at any corpus size.
- ``time_to_convert``: two conditional ``min`` aggregates in ONE pass over
  the user's events (no self-join of the event table against itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign gap-based session ids and roll up per-session stats.

    A new session starts when the gap to the previous event of the same user
    exceeds ``gap_minutes``. Output: one row per (user, session) with
    session_seq (1-based, in time order), session_start/end, n_events.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    gap_s = gap_minutes * 60
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev) > gap_s),
        1,
    ).otherwise(0)
    tagged = events.withColumn(
        "session_seq", F.sum(is_new).over(w).cast("int")
    )
    return tagged.groupBy(user_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").cast("long").alias("n_events"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users bucketed by the ISO week of their first
    event; for each (cohort_week, week_offset) count the distinct users with
    any activity in that week. Output: cohort_week (date), week_offset (int),
    n_users (long).
    """
    wk = lambda c: F.date_trunc("week", F.col(c)).cast("date")  # noqa: E731
    first = events.groupBy(user_col).agg(
        F.min(wk(ts_col)).alias("cohort_week")
    )
    active = events.select(
        F.col(user_col), wk(ts_col).alias("active_week")
    ).distinct()
    joined = active.join(first, user_col)
    return (
        joined.select(
            "cohort_week",
            (
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            )
            .cast("int")
            .alias("week_offset"),
            F.col(user_col),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct(user_col).cast("long").alias("n_users"))
    )


def time_to_convert(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    start_event: str = "signup",
    convert_event: str = "purchase",
    type_col: str = "event_type",
) -> DataFrame:
    """Seconds from a user's first ``start_event`` to their first
    ``convert_event`` at or after it. Users who never start are dropped;
    users who start but never convert get convert_secs NULL.

    Single aggregation pass: first-start is ``min(ts) FILTER (start)``;
    first-convert-after-start needs the start time first, so the convert side
    re-aggregates the (tiny) per-user event list — expressed as a second
    conditional min over a co-partitioned self-join-free rollup: we aggregate
    min-start and the full sorted set of convert times per user in one
    groupBy, then pick the first convert >= start with an array filter
    (convert times per user are data-bounded, not corpus-bounded).
    """
    agg = events.groupBy(user_col).agg(
        F.min(
            F.when(F.col(type_col) == start_event, F.col(ts_col))
        ).alias("start_ts"),
        F.array_sort(
            F.collect_list(
                F.when(F.col(type_col) == convert_event, F.col(ts_col))
            )
        ).alias("_convs"),
    )
    first_conv = F.array_min(
        F.filter(F.col("_convs"), lambda t: t >= F.col("start_ts"))
    )
    return agg.filter(F.col("start_ts").isNotNull()).select(
        user_col,
        F.col("start_ts"),
        (
            F.unix_timestamp(first_conv) - F.unix_timestamp(F.col("start_ts"))
        )
        .cast("long")
        .alias("convert_secs"),
    )
