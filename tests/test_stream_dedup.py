"""Streaming dedup: dropDuplicatesWithinWatermark removes re-deliveries
across micro-batches while keeping state bounded by the watermark — the
streaming-ingestion twin of the batch exact-dedup operator."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_streaming_dedup_within_watermark(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events").limit(200).cache()
    src = str(tmp_path / "src")
    # batch 1: the events; batch 2: the SAME events re-delivered (e.g. an
    # at-least-once source retrying)
    ev.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.2)
    ev.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("stream_dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql("SELECT event_id FROM stream_dedup_test").collect()
    ids = [r["event_id"] for r in got]
    assert len(ids) == len(set(ids)) == ev.count()
    ev.unpersist()
