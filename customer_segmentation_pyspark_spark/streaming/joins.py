"""Stream-stream join: correlate two event streams within a time bound.

The canonical funnel query — e.g. each 'purchase' joined to the same
user's preceding 'click' within one hour. Both sides carry watermarks so
the join state is bounded: a buffered row can be evicted once the other
stream's watermark passes its join-window upper bound. The batch twin
(plain inner join with the same time-range predicate) is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _sides(events: DataFrame, left_type: str, right_type: str):
    left = events.filter(F.col("event_type") == left_type).select(
        F.col("user_id").alias("l_user"),
        F.col("event_id").alias("l_event_id"),
        F.col("ts").alias("l_ts"),
    )
    right = events.filter(F.col("event_type") == right_type).select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("r_event_id"),
        F.col("ts").alias("r_ts"),
    )
    return left, right


def _join_cond():
    return (
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 1 HOUR"))
    )


def batch_funnel_join(
    events: DataFrame, left_type: str = "click", right_type: str = "purchase"
) -> DataFrame:
    """Batch oracle: right events following a left event of the same user
    within 1 hour."""
    left, right = _sides(events, left_type, right_type)
    return left.join(right, _join_cond()).select(
        "l_user", "l_event_id", "r_event_id"
    )


def streaming_funnel_join(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    left_type: str = "click",
    right_type: str = "purchase",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join with watermarks on both sides; state for
    each side is evicted once the opposite watermark clears the 1-hour
    join window, keeping the state store bounded on unbounded streams."""
    stream = spark.readStream.schema(schema).format("parquet").load(source_dir)
    left, right = _sides(stream, left_type, right_type)
    left = left.withWatermark("l_ts", watermark)
    right = right.withWatermark("r_ts", watermark)
    return left.join(right, _join_cond()).select(
        "l_user", "l_event_id", "r_event_id"
    )
