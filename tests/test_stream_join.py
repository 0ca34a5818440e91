"""Stream-stream funnel join must reproduce its batch oracle on a bounded
replay."""

from __future__ import annotations

import datetime

from customer_segmentation_pyspark_spark.sources import load_table
from customer_segmentation_pyspark_spark.streaming.joins import (
    batch_funnel_join,
    batch_funnel_join_full,
    batch_funnel_join_outer,
    streaming_funnel_join,
    streaming_funnel_join_full,
    streaming_funnel_join_outer,
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


SENTINEL_ID = -1


def _events_with_sentinels(spark, tmp_path):
    """Events parquet dir plus one sentinel click+purchase far past
    max(ts) + 1h join window + 2h watermark delay; both sides' watermarks
    (the global watermark is their min) then clear every real row's
    eviction bound. Sentinels land in their own file so maxFilesPerTrigger=1
    makes them a later micro-batch — the one whose advanced watermark can
    flush buffered unmatched rows."""
    ev = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "events_stream")
    ev.write.parquet(src)

    far = datetime.datetime(2024, 6, 1)
    sentinels = spark.createDataFrame(
        [
            (SENTINEL_ID, far, SENTINEL_ID, "click", 0.0, None),
            (SENTINEL_ID, far, SENTINEL_ID, "purchase", 0.0, None),
        ],
        schema=ev.schema,
    )
    sentinels.coalesce(1).write.mode("append").parquet(src)
    return ev, src


def test_stream_stream_left_outer_join_matches_batch(spark, tmp_path):
    """Left-outer funnel: unconverted clicks must surface null-padded once
    the watermark clears their join window.

    Null emission is watermark-driven and lags one micro-batch, so the
    replay (a) appends sentinel click+purchase events far past
    max(ts) + 1h window + 2h watermark delay to push BOTH sides' watermarks
    (the global watermark is their min), and (b) forces one file per
    trigger so a later batch exists in which the advanced watermark can
    flush the buffered unmatched lefts.
    """
    ev, src = _events_with_sentinels(spark, tmp_path)

    joined = streaming_funnel_join_outer(
        spark, src, ev.schema, max_files_per_trigger=1
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("funnel_outer_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["l_user"], r["l_event_id"], r["r_event_id"])
        for r in spark.sql(
            f"SELECT * FROM funnel_outer_test WHERE l_event_id != {SENTINEL_ID}"
        ).collect()
    }
    expected = {
        (r["l_user"], r["l_event_id"], r["r_event_id"])
        for r in batch_funnel_join_outer(ev).collect()
    }
    assert got == expected
    unmatched = {t for t in expected if t[2] is None}
    assert unmatched, "fixture should contain unconverted clicks"
    assert expected - unmatched, "fixture should contain converted clicks"


def test_stream_stream_full_outer_join_matches_batch(spark, tmp_path):
    """Full-outer funnel: unconverted clicks AND orphan purchases both
    surface null-padded after the watermark clears their eviction bound."""
    ev, src = _events_with_sentinels(spark, tmp_path)

    joined = streaming_funnel_join_full(
        spark, src, ev.schema, max_files_per_trigger=1
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("funnel_full_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    def key(r):
        return (r["l_user"], r["l_event_id"], r["r_user"], r["r_event_id"])

    got = {
        key(r)
        for r in spark.sql("SELECT * FROM funnel_full_test").collect()
        if SENTINEL_ID not in (r["l_event_id"], r["r_event_id"])
    }
    expected = {key(r) for r in batch_funnel_join_full(ev).collect()}
    assert got == expected
    assert {t for t in expected if t[3] is None}, "want unconverted clicks"
    assert {t for t in expected if t[1] is None}, "want orphan purchases"
