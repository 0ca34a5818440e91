"""Time-window aggregation — batch first, Structured Streaming second.

The reference has no streaming surface (SURVEY.md §2.11); the fixture
``events`` table (timestamped) motivates time-bucket aggregates. The same
windowed-aggregation logic is written once against a DataFrame and applies
unchanged to a ``readStream`` source — the batch path is the oracle for
the streaming path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tumbling_agg(
    events: DataFrame,
    window_len: str = "1 hour",
    ts_col: str = "ts",
    by: str | None = "event_type",
) -> DataFrame:
    """Tumbling event-time window aggregate (count + value stats).

    Batch semantics here; add ``withWatermark`` before this on a streaming
    DataFrame and the identical plan runs incrementally.
    """
    keys = [F.window(F.col(ts_col), window_len).alias("win")]
    if by:
        keys.append(F.col(by))
    return (
        events.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.unix_timestamp(F.col("win.start")).alias("bucket_start"),
            *([F.col(by)] if by else []),
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def sliding_agg(
    events: DataFrame,
    window_len: str = "2 hours",
    slide: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding event-time window counts."""
    return (
        events.groupBy(F.window(F.col(ts_col), window_len, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("win.start")).alias("bucket_start"),
            F.unix_timestamp(F.col("win.end")).alias("bucket_end"),
            "n_events",
        )
    )


def streaming_tumbling_counts(
    spark: SparkSession,
    source_dir: str,
    schema,
    window_len: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
):
    """Structured Streaming variant: file source -> watermark -> tumbling
    window counts. Returns the streaming DataFrame; caller attaches the
    sink (``writeStream``). Late rows beyond ``watermark`` are dropped and
    state is bounded — the property that keeps this runnable forever on a
    real event stream."""
    stream = (
        spark.readStream.schema(schema).format("parquet").load(source_dir)
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_len).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("bucket_start"), "event_type", "n_events"
        )
    )


def streaming_sliding_counts(
    spark: SparkSession,
    source_dir: str,
    schema,
    window_len: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "3 hours",
    ts_col: str = "ts",
):
    """Structured Streaming sliding windows: each event lands in
    window_len/slide overlapping windows; watermark bounds how long each
    open window's partial aggregate stays in the state store."""
    stream = (
        spark.readStream.schema(schema).format("parquet").load(source_dir)
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_len, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("bucket_start"),
            F.col("win.end").alias("bucket_end"),
            "n_events",
        )
    )
