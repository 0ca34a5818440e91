"""applyInPandasWithState sessionization must reproduce the batch window
implementation (its oracle) on a bounded replay."""

from __future__ import annotations

from customer_segmentation_pyspark_spark.operators.sessions import session_stats
from customer_segmentation_pyspark_spark.sources import load_table
from customer_segmentation_pyspark_spark.streaming.stateful import (
    streaming_sessionize,
)
from tests.conftest import SF_SMOKE


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "events_stream")
    ev.write.parquet(src)

    stream_df = streaming_sessionize(spark, src, ev.schema, gap_minutes=30)
    q = (
        stream_df.writeStream.format("memory")
        .queryName("stateful_sessions_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["user_id"], r["session_id"]): (
            r["n_events"], r["duration_sec"], round(r["sum_value"], 4),
        )
        for r in spark.sql("SELECT * FROM stateful_sessions_test").collect()
    }
    expected = {
        (r["user_id"], r["session_id"]): (
            r["n_events"], r["duration_sec"], r["sum_value"],
        )
        for r in session_stats(ev, gap_minutes=30).collect()
    }
    assert got == expected
