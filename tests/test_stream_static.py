"""Stream-static joins: a live stream enriched against batch-computed
reference frames (the dimension/profile pattern) must produce exactly
the batch twin's rows — stateless append, no state store, static sides
re-resolved per micro-batch."""

from __future__ import annotations

import time

from customer_segmentation_pyspark_spark.sources import load_table
from customer_segmentation_pyspark_spark.streaming.enrich import (
    seasonal_anomaly_flags,
    seasonal_reference,
)
from tests.conftest import SF_SMOKE


def test_stream_static_anomaly_equals_batch(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events").limit(2000).cache()
    seasonal, stats = seasonal_reference(ev)
    seasonal = seasonal.cache()
    stats = stats.cache()

    batch = {
        (r["event_id"], r["z"], r["is_anomaly"])
        for r in seasonal_anomaly_flags(ev, seasonal, stats).collect()
    }

    src = str(tmp_path / "src")
    half = ev.filter("event_id % 2 = 0")
    other = ev.filter("event_id % 2 = 1")
    half.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.0)
    other.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src)
    )
    flags = seasonal_anomaly_flags(stream, seasonal, stats)
    q = (
        flags.writeStream.format("memory")
        .queryName("stream_static_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["event_id"], r["z"], r["is_anomaly"])
        for r in spark.sql("SELECT * FROM stream_static_test").collect()
    }
    assert got == batch
    ev.unpersist(); seasonal.unpersist(); stats.unpersist()
