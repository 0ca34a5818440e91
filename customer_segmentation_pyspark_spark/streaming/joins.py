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


def batch_funnel_join_outer(
    events: DataFrame, left_type: str = "click", right_type: str = "purchase"
) -> DataFrame:
    """Batch oracle for the left-outer funnel: every left event appears;
    unconverted ones carry a NULL r_event_id."""
    left, right = _sides(events, left_type, right_type)
    return left.join(right, _join_cond(), "left_outer").select(
        "l_user", "l_event_id", "r_event_id"
    )


def streaming_funnel_join_outer(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    left_type: str = "click",
    right_type: str = "purchase",
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stream-stream LEFT OUTER join with watermark timeout.

    Matches emit as they happen, exactly like the inner funnel. An
    unconverted left event is held in the state store until the GLOBAL
    watermark (the min over both sides' watermarks) clears its join-window
    upper bound (l_ts + 1 hour); only then can Spark prove no matching
    right row can still arrive, emit the row null-padded, and evict it.
    Two consequences callers must design for:

    - null emission is watermark-driven, so it happens in a LATER
      micro-batch than the data that proves the miss (the watermark used
      by batch N is computed from batch N-1's max event time). A bounded
      replay needs >=2 batches plus sentinel events on BOTH sides past
      max(l_ts) + 1h + watermark delay, or trailing lefts stay buffered
      forever and the stream under-reports vs the batch twin.
    - state stays bounded for the same reason the inner join's does: the
      time-range condition gives each buffered row a watermark eviction
      bound; no condition-free outer stream-stream join is allowed.

    max_files_per_trigger is a reader option (it bounds each micro-batch);
    bounded replays set it so the sentinel batch runs after the data batch.
    """
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load(source_dir)
    left, right = _sides(stream, left_type, right_type)
    left = left.withWatermark("l_ts", watermark)
    right = right.withWatermark("r_ts", watermark)
    return left.join(right, _join_cond(), "leftOuter").select(
        "l_user", "l_event_id", "r_event_id"
    )


_FULL_COLS = ["l_user", "l_event_id", "r_user", "r_event_id"]


def batch_funnel_join_full(
    events: DataFrame, left_type: str = "click", right_type: str = "purchase"
) -> DataFrame:
    """Batch oracle for the full-outer funnel: unconverted clicks carry a
    NULL right half, orphan purchases (no click in the preceding hour) a
    NULL left half."""
    left, right = _sides(events, left_type, right_type)
    return left.join(right, _join_cond(), "full_outer").select(*_FULL_COLS)


def streaming_funnel_join_full(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    left_type: str = "click",
    right_type: str = "purchase",
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stream-stream FULL OUTER join: both sides' misses surface
    null-padded once the global watermark clears their eviction bound
    (l_ts + 1h for buffered lefts, r_ts for buffered rights). Same
    watermark-lag caveats as the left-outer variant, on both sides."""
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load(source_dir)
    left, right = _sides(stream, left_type, right_type)
    left = left.withWatermark("l_ts", watermark)
    right = right.withWatermark("r_ts", watermark)
    return left.join(right, _join_cond(), "fullOuter").select(*_FULL_COLS)
