"""Streaming output modes: complete re-emits the whole aggregate table
per trigger; update emits only changed keys.  Both must converge to the
batch aggregate over the same files."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.sources import load_table
from tests.conftest import SF_SMOKE


def _agg(df):
    return df.groupBy("event_type").agg(F.count("*").alias("n"))


def _run(spark, src, mode, schema, name):
    q = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(src)
        .transform(_agg)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_complete_and_update_modes_match_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "event_type")
    ev.write.mode("overwrite").parquet(src)
    schema = "event_id bigint, event_type string"

    batch = {
        r["event_type"]: r["n"]
        for r in _agg(spark.read.schema(schema).parquet(src)).collect()
    }

    comp = _run(spark, src, "complete", schema, "m_complete")
    got_complete = {r["event_type"]: r["n"] for r in comp.collect()}
    assert got_complete == batch

    upd = _run(spark, src, "update", schema, "m_update")
    # update mode appends a row per changed key per trigger; the LAST
    # emission per key is the final value
    rows = upd.collect()
    last = {}
    for r in rows:  # memory sink preserves emission order
        last[r["event_type"]] = r["n"]
    assert last == batch
