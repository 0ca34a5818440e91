"""Time travel: versioned parquet tables with atomic pointer commits —
historical reads are stable, a torn commit is invisible, stranded
staging is cleaned."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.sources import load_table
from customer_segmentation_pyspark_spark.sources.versioned import (
    latest_version,
    read_table,
    versions,
    write_version,
)
from tests.conftest import SF_SMOKE


def test_time_travel_reads_each_version(spark, tmp_path):
    t = str(tmp_path / "tbl")
    d = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang")
    assert write_version(d.limit(10), t) == 1
    assert write_version(d.limit(25), t) == 2
    assert write_version(d.limit(40), t) == 3
    assert versions(t) == [1, 2, 3]
    assert read_table(spark, t).count() == 40          # latest
    assert read_table(spark, t, version=1).count() == 10
    assert read_table(spark, t, version=2).count() == 25


def test_torn_commit_is_invisible_and_cleaned(spark, tmp_path):
    """Simulate a crash after the snapshot lands but before the pointer
    flips: readers still see the old version; the next successful write
    cleans the stranded staging dir and commits on top."""
    t = str(tmp_path / "tbl")
    d = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    write_version(d.limit(5), t)
    # crash simulation: snapshot written to staging, no rename/pointer
    staging = os.path.join(t, ".staging-deadbeef")
    d.limit(99).write.mode("overwrite").parquet(staging)
    assert latest_version(t) == 1
    assert read_table(spark, t).count() == 5
    assert versions(t) == [1]
    # a FRESH staging dir could be a concurrent writer's in-flight
    # commit (ADVICE r03) — the next write must spare it...
    write_version(d.limit(6), t)
    assert os.path.isdir(staging)
    # ...and clean it only once it is older than the grace window
    import time

    from customer_segmentation_pyspark_spark.sources import versioned

    old = time.time() - versioned.STAGING_GRACE_SEC - 60
    os.utime(staging, (old, old))
    write_version(d.limit(7), t)
    assert not [p for p in os.listdir(t) if p.startswith(".staging-")]
    assert read_table(spark, t).count() == 7
    # the old version remains readable (immutability)
    assert read_table(spark, t, version=1).count() == 5


def test_streaming_materialized_view_with_history(spark, tmp_path):
    """foreachBatch + versioned tables = an incrementally refreshed
    materialized view whose refresh HISTORY is time-travelable: each
    micro-batch commits the updated aggregate as a new version; v1 is
    the batch-1 state, the latest version equals the full batch
    aggregate; a reader mid-refresh only ever sees a committed
    version."""
    import time

    from customer_segmentation_pyspark_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events").limit(1000).cache()
    src = str(tmp_path / "src")
    tbl = str(tmp_path / "mv")
    first = ev.filter("event_id % 2 = 0")
    second = ev.filter("event_id % 2 = 1")
    first.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.0)
    second.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src)
    )
    agg = stream.groupBy("event_type").count()

    def refresh(batch_df, batch_id):
        write_version(batch_df, tbl)

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(refresh)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert latest_version(tbl) >= 2
    expect_all = {
        (r["event_type"], r["count"])
        for r in ev.groupBy("event_type").count().collect()
    }
    got_latest = {
        (r["event_type"], r["count"])
        for r in read_table(spark, tbl).collect()
    }
    assert got_latest == expect_all
    expect_v1 = {
        (r["event_type"], r["count"])
        for r in first.groupBy("event_type").count().collect()
    }
    got_v1 = {
        (r["event_type"], r["count"])
        for r in read_table(spark, tbl, version=1).collect()
    }
    assert got_v1 == expect_v1
    ev.unpersist()


def test_merge_on_read_deletes_and_compaction(spark, tmp_path):
    """Tombstone overlay: deletes are O(keys) appends, reads anti-join
    them out (idempotent for already-dead keys), and compaction folds
    them into the base with identical survivors."""
    from customer_segmentation_pyspark_spark.sources import load_table
    from customer_segmentation_pyspark_spark.sources.versioned import (
        compact_deletes,
        delete_keys,
        read_with_deletes,
        write_base,
    )
    from tests.conftest import SF_SMOKE

    t = str(tmp_path / "mor")
    d = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang")
    write_base(d, t)
    n = d.count()

    doomed1 = d.filter("doc_id % 10 = 0").select("doc_id")
    delete_keys(doomed1, t, "doc_id")
    after1 = read_with_deletes(spark, t, "doc_id")
    assert after1.count() == n - doomed1.count()
    assert after1.filter("doc_id % 10 = 0").count() == 0

    # second delete wave overlaps the first (idempotent) + new keys
    doomed2 = d.filter("doc_id % 5 = 0").select("doc_id")
    delete_keys(doomed2, t, "doc_id")
    after2 = read_with_deletes(spark, t, "doc_id")
    expect = d.filter("doc_id % 5 != 0 and doc_id % 10 != 0").count()
    assert after2.count() == expect

    survivors_before = {r["doc_id"] for r in after2.collect()}
    compact_deletes(spark, t, "doc_id")
    after3 = read_with_deletes(spark, t, "doc_id")
    assert {r["doc_id"] for r in after3.collect()} == survivors_before
    import os

    assert not os.path.isdir(os.path.join(t, "_deletes"))
