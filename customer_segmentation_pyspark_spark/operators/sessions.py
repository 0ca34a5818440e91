"""Sessionization: gap-based event sessions per user.

Batch implementation is pure window functions (lag -> gap flag -> running
sum as session id -> per-session aggregate) — two window passes over the
same (user_id, ts) partitioning, so Spark plans ONE shuffle and reuses the
sort. A streaming variant with the same semantics belongs to
applyInPandasWithState; the batch path is its oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Assign session ids: a new session starts when the gap from the
    previous event of the same user exceeds ``gap_minutes``."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col("event_id"))
    gap_sec = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    new_session = F.when(
        gap_sec.isNull() | (gap_sec > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Per-session aggregate: event count, duration, value sum."""
    s = sessionize(events, gap_minutes)
    return s.groupBy(
        F.col("user_id"), F.col("session_id").cast("long").alias("session_id")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))
        ).alias("duration_sec"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
