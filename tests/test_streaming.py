"""Structured Streaming: the streaming tumbling-window aggregation must
reproduce its batch oracle (the same groupBy(window) plan) when the events
parquet is replayed as a file-source stream."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.sources import load_table
from customer_segmentation_pyspark_spark.streaming.windows import (
    streaming_tumbling_counts,
    tumbling_agg,
)
from tests.conftest import SF_SMOKE


def test_streaming_matches_batch(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    # materialize with a proper timestamp column for the file stream source
    src = str(tmp_path / "events_stream")
    ev.write.parquet(src)
    schema = ev.schema

    stream_df = streaming_tumbling_counts(
        spark, src, schema, window_len="1 hour", watermark="2 hours"
    )
    q = (
        stream_df.writeStream.format("memory")
        .queryName("tumbling_counts_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["bucket_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM tumbling_counts_test").collect()
    }
    expected = {
        (r["bucket_start"], r["event_type"]): r["n_events"]
        for r in tumbling_agg(ev, "1 hour", by="event_type")
        .withColumn(
            "bucket_start", F.timestamp_seconds(F.col("bucket_start"))
        )
        .collect()
    }
    assert got == expected


def test_streaming_sliding_matches_batch(spark, tmp_path):
    """Sliding (overlapping) windows incrementally == the batch
    sliding_agg plan over the same replayed events."""
    from customer_segmentation_pyspark_spark.streaming.windows import (
        sliding_agg,
        streaming_sliding_counts,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "events_sliding_stream")
    ev.write.parquet(src)

    stream_df = streaming_sliding_counts(
        spark, src, ev.schema, window_len="2 hours", slide="1 hour"
    )
    q = (
        stream_df.writeStream.format("memory")
        .queryName("sliding_counts_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["bucket_start"], r["bucket_end"]): r["n_events"]
        for r in spark.sql("SELECT * FROM sliding_counts_test").collect()
    }
    expected = {
        (r["bucket_start"], r["bucket_end"]): r["n_events"]
        for r in sliding_agg(ev, "2 hours", "1 hour")
        .withColumn("bucket_start", F.timestamp_seconds("bucket_start"))
        .withColumn("bucket_end", F.timestamp_seconds("bucket_end"))
        .collect()
    }
    assert got == expected
