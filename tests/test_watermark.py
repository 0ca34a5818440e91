"""Watermark semantics: in update mode, input older than (max event time -
watermark) must be DROPPED, not aggregated — the property that bounds
state at 100 TB stream scale."""

from __future__ import annotations

import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def _write(path, rows):
    pdf = pd.DataFrame(rows, columns=["ts", "event_type"])
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(pdf), path)


def test_late_rows_dropped_by_watermark(spark, tmp_path):
    src = tmp_path / "stream"
    src.mkdir()
    # batch 1: three events in hour 01, one at hour 10 (advances watermark
    # to 08:00 under a 2h watermark)
    _write(
        str(src / "a.parquet"),
        [
            ("2024-01-01 01:10:00", "x"),
            ("2024-01-01 01:20:00", "x"),
            ("2024-01-01 01:30:00", "x"),
            ("2024-01-01 10:00:00", "x"),
        ],
    )
    time.sleep(1.2)  # distinct mtime so the file source orders batches
    # batch 2: fresh event (watermark from batch 1 commits/propagates —
    # Structured Streaming applies a new watermark starting the NEXT batch)
    _write(str(src / "b.parquet"), [("2024-01-01 10:30:00", "x")])
    time.sleep(1.2)
    # batch 3: one LATE event in hour 01, far beyond the 08:00 watermark
    _write(str(src / "c.parquet"), [("2024-01-01 01:40:00", "x")])

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(src))
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").cast("string").alias("h"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("watermark_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("SELECT * FROM watermark_test").collect()
    by_hour = {}
    for r in rows:  # update mode: last emission per key wins
        by_hour.setdefault(r["h"], []).append(r["n"])
    # hour 01 was updated only by batch 1 (count 3); the late row in batch
    # 3 must NOT have produced a new update (neither 4 via surviving state
    # nor 1 via a resurrected window)
    assert by_hour["2024-01-01 01:00:00"] == [3]
    # hour 10 saw batches 1 and 2: 1 then cumulative 2
    assert by_hour["2024-01-01 10:00:00"][-1] == 2
