"""Stream-stream funnel join must reproduce its batch oracle on a bounded
replay."""

from __future__ import annotations

from customer_segmentation_pyspark_spark.sources import load_table
from customer_segmentation_pyspark_spark.streaming.joins import (
    batch_funnel_join,
    streaming_funnel_join,
)
from tests.conftest import SF_SMOKE


def test_stream_stream_join_matches_batch(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "events_stream")
    ev.write.parquet(src)

    joined = streaming_funnel_join(spark, src, ev.schema)
    q = (
        joined.writeStream.format("memory")
        .queryName("funnel_join_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["l_user"], r["l_event_id"], r["r_event_id"])
        for r in spark.sql("SELECT * FROM funnel_join_test").collect()
    }
    expected = {
        (r["l_user"], r["l_event_id"], r["r_event_id"])
        for r in batch_funnel_join(ev).collect()
    }
    assert got == expected
    assert expected, "fixture should contain click->purchase funnels"
