"""Checkpoint recovery: a restarted stream (same checkpoint) processes
ONLY new input — no duplicates, no loss. The exactly-once file-sink
contract that makes incremental 100 TB ingestion idempotent."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.sources import load_table
from tests.conftest import SF_SMOKE


def _run_stream(spark, src, sink, ckpt, schema):
    q = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(src)
        .select("event_id", "user_id", "value")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_checkpoint_restart_processes_only_new_files(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events").cache()
    first = ev.filter(F.col("event_id") < 500)
    second = ev.filter(F.col("event_id") >= 500)

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    first.coalesce(1).write.mode("append").parquet(src)
    _run_stream(spark, src, sink, ckpt, ev.schema)
    got1 = spark.read.parquet(sink)
    assert got1.count() == first.count()

    time.sleep(1.1)  # distinct mtime for the file source
    second.coalesce(1).write.mode("append").parquet(src)
    _run_stream(spark, src, sink, ckpt, ev.schema)  # restart, same ckpt

    got2 = spark.read.parquet(sink)
    # every event exactly once across both runs
    assert got2.count() == ev.count()
    assert got2.select("event_id").distinct().count() == ev.count()
    ev.unpersist()
