"""Streaming MERGE sink: a change stream maintained into a keyed snapshot
via foreachBatch equals the batch latest-per-key merge over the same
change log — and replaying the stream from scratch is idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from customer_segmentation_pyspark_spark.streaming.merge import (
    latest_per_key,
    merge_into_snapshot,
    streaming_upsert,
)

SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("val", DoubleType()),
        StructField("seq", LongType()),
    ]
)


def _write_wave(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _expected(spark, all_rows):
    log = spark.createDataFrame(all_rows, SCHEMA)
    return {
        r["k"]: r["val"] for r in latest_per_key(log, "k", "seq").collect()
    }


def _snapshot_dict(spark, snap):
    return {
        r["k"]: r["val"] for r in spark.read.parquet(snap).collect()
    }


def test_streaming_upsert_equals_batch_merge(spark, tmp_path):
    src = str(tmp_path / "changes")
    snap = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")
    wave1 = [(1, 10.0, 1), (2, 20.0, 2), (1, 11.0, 3)]  # k=1 updated twice
    wave2 = [(2, 21.0, 4), (3, 30.0, 5)]  # update + insert

    _write_wave(spark, src, wave1)
    q = (
        spark.readStream.schema(SCHEMA).format("parquet").load(src)
    )
    sq = streaming_upsert(spark, q, snap, ckpt, key="k", seq="seq")
    sq.awaitTermination(120)
    assert _snapshot_dict(spark, snap) == _expected(spark, wave1)

    _write_wave(spark, src, wave2)
    q2 = spark.readStream.schema(SCHEMA).format("parquet").load(src)
    sq2 = streaming_upsert(spark, q2, snap, ckpt, key="k", seq="seq")
    sq2.awaitTermination(120)
    # checkpoint means wave1 files are NOT re-read; snapshot reflects all
    assert _snapshot_dict(spark, snap) == _expected(spark, wave1 + wave2)
    assert _snapshot_dict(spark, snap) == {1: 11.0, 2: 21.0, 3: 30.0}


def test_merge_step_is_idempotent(spark, tmp_path):
    snap = str(tmp_path / "snap")
    changes = spark.createDataFrame(
        [(1, 5.0, 1), (2, 6.0, 2), (2, 7.0, 3)], SCHEMA
    )
    merge_into_snapshot(spark, snap, changes, "k", "seq")
    once = _snapshot_dict(spark, snap)
    merge_into_snapshot(spark, snap, changes, "k", "seq")
    assert _snapshot_dict(spark, snap) == once == {1: 5.0, 2: 7.0}


def test_merge_preserves_untouched_keys(spark, tmp_path):
    snap = str(tmp_path / "snap")
    merge_into_snapshot(
        spark,
        snap,
        spark.createDataFrame([(1, 1.0, 1), (2, 2.0, 2)], SCHEMA),
        "k",
        "seq",
    )
    merge_into_snapshot(
        spark, snap, spark.createDataFrame([(2, 9.0, 3)], SCHEMA), "k", "seq"
    )
    got = _snapshot_dict(spark, snap)
    assert got == {1: 1.0, 2: 9.0}
    # seq column survives the merge for future idempotent replays
    cols = set(spark.read.parquet(snap).columns)
    assert cols == {"k", "val", "seq"}


def test_merge_recovers_from_crash_between_swap_renames(spark, tmp_path):
    """Simulate a crash in the swap gap: the snapshot directory has been
    renamed to .old-* but the new one was not renamed in (tmp stranded
    too). The next merge must adopt the stranded base and the replayed
    batch must rebuild the full state — previously-merged keys are NOT
    lost (this was the failure mode: rebuilding from the delta alone)."""
    import os
    import shutil

    snap = str(tmp_path / "snap")
    merge_into_snapshot(
        spark,
        snap,
        spark.createDataFrame([(1, 1.0, 1), (2, 2.0, 2)], SCHEMA),
        "k",
        "seq",
    )
    # crash mid-swap during the NEXT merge: base stranded at .old-*, new
    # version stranded at .tmp-*, nothing at snap
    os.rename(snap, snap + ".old-deadbeef")
    shutil.copytree(snap + ".old-deadbeef", snap + ".tmp-deadbeef")
    assert not os.path.exists(snap)
    # restart: foreachBatch replays the same batch
    merge_into_snapshot(
        spark, snap, spark.createDataFrame([(2, 9.0, 3)], SCHEMA), "k", "seq"
    )
    assert _snapshot_dict(spark, snap) == {1: 1.0, 2: 9.0}
    # recovery consumed the stranded dirs
    assert not os.path.exists(snap + ".old-deadbeef")
    assert not os.path.exists(snap + ".tmp-deadbeef")


def test_compact_table_recovers_from_crash(spark, tmp_path):
    """compact_table shares the crash-safe swap: a stranded .old-* with a
    missing table directory is adopted at the next open instead of
    crashing or losing the table."""
    import os

    from customer_segmentation_pyspark_spark.sources.sinks import (
        compact_table,
    )

    path = str(tmp_path / "t")
    spark.range(100).repartition(8).write.parquet(path)
    os.rename(path, path + ".old-cafe0000")
    n_files = compact_table(spark, path, target_files=2)
    assert n_files == 2
    assert spark.read.parquet(path).count() == 100
    assert not os.path.exists(path + ".old-cafe0000")
