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


def _file_stats(table_dir):
    """(relpath -> (size, mtime_ns)) for every data file under committed
    p-* part dirs — byte-identity evidence for untouched partitions."""
    import os

    stats = {}
    for root, _dirs, files in os.walk(table_dir):
        for f in files:
            full = os.path.join(root, f)
            rel = os.path.relpath(full, table_dir)
            if rel.startswith("p-"):
                st = os.stat(full)
                stats[rel] = (st.st_size, st.st_mtime_ns)
    return stats


def _psnap_dict(spark, table_dir):
    from customer_segmentation_pyspark_spark.streaming.merge import (
        read_partitioned_snapshot,
    )

    return {
        r["k"]: r["val"]
        for r in read_partitioned_snapshot(spark, table_dir).collect()
    }


def test_partitioned_merge_rewrites_only_touched_partitions(
    spark, tmp_path
):
    """VERDICT r02 #2 'done' bar: after a 1-key batch, untouched
    partitions' files are byte-identical (same immutable dirs, same
    size+mtime — never rewritten), and the merge result matches the
    full-rewrite twin."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
    )

    table = str(tmp_path / "ptable")
    wave1 = [(k, float(k * 10), k) for k in range(1, 201)]
    merge_into_partitioned_snapshot(
        spark,
        table,
        spark.createDataFrame(wave1, SCHEMA),
        key="k",
        seq="seq",
        num_partitions=8,
    )
    man1 = versioned.read_manifest(table)
    assert man1["num_partitions"] == 8
    stats1 = _file_stats(table)

    # 1-key update
    wave2 = [(7, 777.0, 1000)]
    merge_into_partitioned_snapshot(
        spark,
        table,
        spark.createDataFrame(wave2, SCHEMA),
        key="k",
        seq="seq",
    )
    man2 = versioned.read_manifest(table)

    changed = [
        p for p in man1["parts"] if man1["parts"][p] != man2["parts"][p]
    ]
    assert len(changed) == 1, f"exactly one partition rewritten: {changed}"
    untouched_dirs = {
        man1["parts"][p] for p in man1["parts"] if p not in changed
    }
    assert untouched_dirs == {
        man2["parts"][p] for p in man2["parts"] if p not in changed
    }
    stats2 = _file_stats(table)
    for rel, st in stats1.items():
        if rel.split("/")[0] in untouched_dirs:
            assert stats2[rel] == st, f"untouched file rewritten: {rel}"

    got = _psnap_dict(spark, table)
    assert got == _expected(spark, wave1 + wave2)


def test_partitioned_merge_matches_cow_twin_and_time_travel(
    spark, tmp_path
):
    """Three batches through the partitioned merge equal the full-rewrite
    merge over the same change log; every committed version remains
    readable (time travel) and replaying the last batch is idempotent."""
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )

    table = str(tmp_path / "ptable")
    waves = [
        [(1, 10.0, 1), (2, 20.0, 2), (1, 11.0, 3)],
        [(2, 21.0, 4), (3, 30.0, 5)],
        [(1, 12.0, 6), (4, 40.0, 7), (2, 22.0, 8)],
    ]
    seen = []
    per_version = []
    for w in waves:
        seen.extend(w)
        merge_into_partitioned_snapshot(
            spark,
            table,
            spark.createDataFrame(w, SCHEMA),
            key="k",
            seq="seq",
            num_partitions=4,
        )
        per_version.append(_expected(spark, list(seen)))

    assert _psnap_dict(spark, table) == per_version[-1]
    for v, expected in enumerate(per_version, start=1):
        got_v = {
            r["k"]: r["val"]
            for r in read_partitioned_snapshot(spark, table, v).collect()
        }
        assert got_v == expected, f"version {v} drifted"

    # idempotent replay of the final batch
    merge_into_partitioned_snapshot(
        spark,
        table,
        spark.createDataFrame(waves[-1], SCHEMA),
        key="k",
        seq="seq",
    )
    assert _psnap_dict(spark, table) == per_version[-1]


def test_streaming_partitioned_upsert_equals_batch(spark, tmp_path):
    from customer_segmentation_pyspark_spark.streaming.merge import (
        streaming_partitioned_upsert,
    )

    src = str(tmp_path / "changes")
    table = str(tmp_path / "ptable")
    wave1 = [(1, 10.0, 1), (2, 20.0, 2), (1, 11.0, 3)]
    wave2 = [(2, 21.0, 4), (3, 30.0, 5)]
    _write_wave(spark, src, wave1)
    _write_wave(spark, src, wave2)
    stream = spark.readStream.schema(SCHEMA).format("parquet").load(src)
    q = streaming_partitioned_upsert(
        spark,
        stream,
        table,
        str(tmp_path / "ckpt"),
        key="k",
        seq="seq",
        num_partitions=4,
    )
    assert q.awaitTermination(120)
    assert _psnap_dict(spark, table) == _expected(spark, wave1 + wave2)


def test_partitioned_merge_gc_cleans_stranded_parts(spark, tmp_path):
    """A crash between part writes and the pointer flip leaves stranded
    p-* dirs; the next merge GCs them without touching any dir a
    committed manifest references."""
    import os

    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
    )

    table = str(tmp_path / "ptable")
    merge_into_partitioned_snapshot(
        spark,
        table,
        spark.createDataFrame([(1, 1.0, 1), (2, 2.0, 2)], SCHEMA),
        key="k",
        seq="seq",
        num_partitions=4,
    )
    # simulate the crash debris — backdated past the grace window
    # (a FRESH unreferenced dir may be a concurrent merge in flight
    # and must be spared; see fresh_spared below)
    import time

    stranded = os.path.join(table, "p-deadbeefcafe")
    os.makedirs(stranded)
    with open(os.path.join(stranded, "junk.parquet"), "w") as f:
        f.write("x")
    old = time.time() - versioned.STAGING_GRACE_SEC - 60
    os.utime(stranded, (old, old))
    fresh_spared = os.path.join(table, "p-freshfresh01")
    os.makedirs(fresh_spared)
    before = set(versioned.read_manifest(table)["parts"].values())

    merge_into_partitioned_snapshot(
        spark,
        table,
        spark.createDataFrame([(3, 3.0, 3)], SCHEMA),
        key="k",
        seq="seq",
    )
    assert not os.path.exists(stranded)
    assert os.path.isdir(fresh_spared)  # in-flight-looking dir spared
    for d in before:  # referenced by v1 -> still present (time travel)
        assert os.path.isdir(os.path.join(table, d))
    assert _psnap_dict(spark, table) == {1: 1.0, 2: 2.0, 3: 3.0}


def test_partitioned_merge_rejects_null_keys(spark, tmp_path):
    """NULL merge keys never match in the full-outer join (silent row
    accumulation) and would write a hive default partition — refuse
    loudly instead."""
    import pytest

    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
    )

    bad = spark.createDataFrame([(None, 1.0, 1), (2, 2.0, 2)], SCHEMA)
    with pytest.raises(ValueError, match="NULL"):
        merge_into_partitioned_snapshot(
            spark,
            str(tmp_path / "t"),
            bad,
            key="k",
            seq="seq",
            num_partitions=4,
        )


def test_partitioned_merge_random_batches_match_model(spark, tmp_path):
    """Property check: for random batch sequences, the partitioned merge
    equals the obvious replay model (highest seq per key wins) AND the
    full-rewrite COW merge, at every prefix."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
    )

    run = [0]

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.tuples(
                    st.integers(min_value=0, max_value=15),
                    st.floats(
                        min_value=-1e6,
                        max_value=1e6,
                        allow_nan=False,
                        allow_subnormal=False,
                    ),
                ),
                min_size=1,
                max_size=6,
            ),
            min_size=1,
            max_size=3,
        )
    )
    def check(batches):
        run[0] += 1
        table = str(tmp_path / f"t{run[0]}")
        model = {}
        seq = 0
        for batch in batches:
            rows = []
            for k, v in batch:
                seq += 1
                rows.append((k, v, seq))
                model[k] = v  # later seq wins; within-batch later too
            merge_into_partitioned_snapshot(
                spark,
                table,
                spark.createDataFrame(rows, SCHEMA),
                key="k",
                seq="seq",
                num_partitions=4,
            )
            assert _psnap_dict(spark, table) == model
    check()


def test_merge_schema_evolution_cow(spark, tmp_path):
    """r04: a delta batch carrying a NEW column evolves the snapshot
    (value on upserted keys, typed NULL elsewhere), and a later batch
    LACKING a base column leaves that column's values intact on the
    keys it updates — Delta/Iceberg add-column mergeSchema semantics."""
    snap = str(tmp_path / "snap")
    merge_into_snapshot(
        spark,
        snap,
        spark.createDataFrame([(1, 1.0, 1), (2, 2.0, 1)], SCHEMA),
        key="k",
        seq="seq",
    )
    # batch 2 adds a quality column and inserts a new key
    evolved = spark.createDataFrame(
        [(2, 2.5, 2, 0.9), (3, 3.0, 2, 0.4)],
        "k long, val double, seq long, quality double",
    )
    merge_into_snapshot(spark, snap, evolved, key="k", seq="seq")
    got = {
        r["k"]: (r["val"], r["quality"])
        for r in spark.read.parquet(snap).collect()
    }
    assert got == {1: (1.0, None), 2: (2.5, 0.9), 3: (3.0, 0.4)}
    # batch 3 updates k=2 WITHOUT the quality column -> value kept
    merge_into_snapshot(
        spark,
        snap,
        spark.createDataFrame([(2, 2.75, 3)], SCHEMA),
        key="k",
        seq="seq",
    )
    got = {
        r["k"]: (r["val"], r["quality"])
        for r in spark.read.parquet(snap).collect()
    }
    assert got == {1: (1.0, None), 2: (2.75, 0.9), 3: (3.0, 0.4)}


def test_merge_schema_evolution_partitioned_untouched_parts_intact(
    spark, tmp_path
):
    """r04: schema evolution through the partition-pruned MERGE —
    untouched partitions are NOT rewritten (their files stay
    byte-identical, metadata-only evolution) and read back with typed
    NULLs for the new column via the mergeSchema snapshot read."""
    import os

    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )

    table = str(tmp_path / "ptable")
    merge_into_partitioned_snapshot(
        spark,
        table,
        spark.createDataFrame(
            [(k, float(k), 1) for k in range(1, 9)], SCHEMA
        ),
        key="k",
        seq="seq",
        num_partitions=4,
    )
    before_parts = dict(versioned.read_manifest(table)["parts"])
    stat_before = {
        p: sorted(os.listdir(os.path.join(table, d)))
        for p, d in before_parts.items()
    }
    # evolve ONE key with a new column
    merge_into_partitioned_snapshot(
        spark,
        table,
        spark.createDataFrame(
            [(3, 3.5, 2, 0.7)],
            "k long, val double, seq long, quality double",
        ),
        key="k",
        seq="seq",
    )
    after_parts = dict(versioned.read_manifest(table)["parts"])
    changed = [p for p in before_parts if before_parts[p] != after_parts[p]]
    assert len(changed) == 1  # only key 3's partition rewritten
    for p, d in before_parts.items():
        if p not in changed:
            assert after_parts[p] == d
            assert sorted(
                os.listdir(os.path.join(table, d))
            ) == stat_before[p]
    got = {
        r["k"]: (r["val"], r["quality"])
        for r in read_partitioned_snapshot(spark, table).collect()
    }
    expect = {k: (float(k), None) for k in range(1, 9)}
    expect[3] = (3.5, 0.7)
    assert got == expect
    # time travel: v1 still reads with the ORIGINAL schema
    v1 = read_partitioned_snapshot(spark, table, version=1)
    assert "quality" not in v1.columns
    assert v1.count() == 8


def test_compact_partitioned_snapshot_and_expire_versions(spark, tmp_path):
    """r04 lakehouse maintenance pair: OPTIMIZE (per-partition file
    compaction into fresh immutable dirs, one manifest commit,
    content bit-preserved, untouched partitions byte-identical) and
    retention (expire_versions keeps the newest N manifests; the
    now-unreferenced pre-compaction dirs become GC-able; expired
    versions raise; latest unaffected)."""
    import os

    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        compact_partitioned_snapshot,
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )

    table = str(tmp_path / "ptable")
    for seq in (1, 2, 3):
        merge_into_partitioned_snapshot(
            spark,
            table,
            spark.createDataFrame(
                [(k, float(k * seq), seq) for k in range(1, 33)], SCHEMA
            ),
            key="k",
            seq="seq",
            num_partitions=4,
        )
    before = _psnap_dict(spark, table)

    def n_files(d):
        return sum(
            1 for f in os.listdir(os.path.join(table, d))
            if f.endswith(".parquet")
        )

    # stage the small-files condition directly: rewrite one partition's
    # dir as 3 files (same rows) and commit that manifest — at scale
    # multi-task partition writes produce this shape organically
    man0 = versioned.read_manifest(table)
    pid0 = sorted(man0["parts"])[0]
    split_dir = "p-splitsplit01"
    spark.read.parquet(
        os.path.join(table, man0["parts"][pid0])
    ).repartition(3).write.parquet(os.path.join(table, split_dir))
    parts = dict(man0["parts"])
    parts[pid0] = split_dir
    versioned.commit_manifest(
        table,
        {"num_partitions": man0["num_partitions"], "parts": parts},
    )
    man_before = versioned.read_manifest(table)
    assert n_files(split_dir) == 3
    assert _psnap_dict(spark, table) == before

    rewritten = compact_partitioned_snapshot(spark, table, target_files=1)
    assert rewritten  # at least one partition was oversized
    man_after = versioned.read_manifest(table)
    for pid in man_after["parts"]:
        assert n_files(man_after["parts"][pid]) == 1
        if pid not in rewritten:  # untouched dirs reused as-is
            assert man_after["parts"][pid] == man_before["parts"][pid]
    assert _psnap_dict(spark, table) == before  # content bit-preserved
    # pre-compaction version still time-travels (old dirs referenced)
    v3 = versioned.latest_version(table) - 1
    assert {
        r["k"]: r["val"]
        for r in read_partitioned_snapshot(spark, table, version=v3).collect()
    } == before

    # retention: keep only the newest manifest; old part dirs collected
    n_latest = versioned.latest_version(table)
    expired = versioned.expire_versions(table, keep_last=1, grace_sec=0)
    assert expired == list(range(1, n_latest))
    assert _psnap_dict(spark, table) == before  # latest unaffected
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_partitioned_snapshot(spark, table, version=1)
    live = set(versioned.read_manifest(table)["parts"].values())
    on_disk = {e for e in os.listdir(table) if e.startswith("p-")}
    assert on_disk == live  # every unreferenced pre-compaction dir GC'd
    # versions() only lists still-readable versions after retention
    assert versioned.versions(table) == [n_latest]


def test_expire_versions_plain_snapshot_table(spark, tmp_path):
    """expire_versions on a write_version-style table: old v{N} dirs are
    deleted, the survivors still read, keep_last guards the latest."""
    import pytest as _pytest

    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.sources.tables import (
        load_table,
    )
    from tests.conftest import SF_SMOKE

    t = str(tmp_path / "tbl")
    d = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    for n in (5, 10, 15):
        versioned.write_version(d.limit(n), t)
    assert versioned.expire_versions(t, keep_last=2, grace_sec=0) == [1]
    assert versioned.read_table(spark, t).count() == 15
    assert versioned.read_table(spark, t, version=2).count() == 10
    with _pytest.raises(Exception):
        versioned.read_table(spark, t, version=1).count()
    with _pytest.raises(ValueError):
        versioned.expire_versions(t, keep_last=0)
    # contract: versions() lists only still-readable versions
    assert versioned.versions(t) == [2, 3]
    # default grace: v2 was written seconds ago, inside the retention
    # horizon -> spared this pass (an in-flight reader survives)
    assert versioned.expire_versions(t, keep_last=1) == []
    assert versioned.read_table(spark, t, version=2).count() == 10
    assert versioned.expire_versions(t, keep_last=1, grace_sec=0) == [2]
    assert versioned.versions(t) == [3]


def test_cluster_partitioned_snapshot_sorts_for_skipping(spark, tmp_path):
    """r04 Z-ORDER-lite: clustering rewrite preserves content exactly
    and leaves every data file internally sorted on the cluster column
    (first-page min == file min, last == max ordering) so min/max
    stats prune selective predicates; a fresh merge afterwards still
    works (manifest intact)."""
    import os

    import pyarrow.parquet as pq

    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        cluster_partitioned_snapshot,
        merge_into_partitioned_snapshot,
    )

    table = str(tmp_path / "ptable")
    rows = [(k, float((k * 37) % 100), 1) for k in range(1, 201)]
    merge_into_partitioned_snapshot(
        spark,
        table,
        spark.createDataFrame(rows, SCHEMA),
        key="k",
        seq="seq",
        num_partitions=4,
    )
    before = _psnap_dict(spark, table)
    rewritten = cluster_partitioned_snapshot(spark, table, ["val"])
    assert sorted(rewritten) == sorted(
        versioned.read_manifest(table)["parts"]
    )
    assert _psnap_dict(spark, table) == before  # content preserved
    # every file's val column is internally sorted -> stats useful
    man = versioned.read_manifest(table)
    for d in man["parts"].values():
        full = os.path.join(table, d)
        for f in os.listdir(full):
            if not f.endswith(".parquet"):
                continue
            vals = pq.read_table(os.path.join(full, f), columns=["val"])[
                "val"
            ].to_pylist()
            assert vals == sorted(vals)
    # the table still merges after the rewrite
    merge_into_partitioned_snapshot(
        spark,
        table,
        spark.createDataFrame([(1, 999.0, 2)], SCHEMA),
        key="k",
        seq="seq",
    )
    before[1] = 999.0
    assert _psnap_dict(spark, table) == before


def test_maintenance_commit_is_merge_concurrency_safe(spark, tmp_path):
    """A merge landing between a maintenance rewrite and its commit must
    WIN the conflicted partition: _commit_rewrites re-validates against
    the latest manifest, lands only non-conflicted rewrites, and drops
    the stale one (dest dir stranded for GC) instead of silently
    reverting the merged data — the Delta OPTIMIZE conflict rule. Also
    pins commit_manifest's exclusive version allocation: a version
    number claimed by a (crashed) concurrent committer is never reused."""
    import os

    from pyspark.sql import functions as F

    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        _commit_rewrites,
        merge_into_partitioned_snapshot,
    )

    table = str(tmp_path / "ptable")
    merge_into_partitioned_snapshot(
        spark,
        table,
        spark.createDataFrame(
            [(k, float(k), 1) for k in range(1, 33)], SCHEMA
        ),
        key="k",
        seq="seq",
        num_partitions=4,
    )
    before = _psnap_dict(spark, table)
    man = versioned.read_manifest(table)
    # key -> partition id, to aim the concurrent merge at one partition
    key_pid = {
        r["k"]: str(r["p"])
        # k long: xxhash64 is type-sensitive, must match SCHEMA's LongType
        for r in spark.createDataFrame([(k,) for k in range(1, 33)], "k long")
        .select("k", F.pmod(F.xxhash64("k"), F.lit(4)).cast("int").alias("p"))
        .collect()
    }
    pids = sorted(man["parts"])
    conflicted, clean = pids[0], pids[1]
    hot_key = next(k for k, p in key_pid.items() if p == conflicted)

    # maintenance pass stages rewrites of BOTH partitions but has not
    # committed yet (the window the OCC validation covers)
    rewrites = {}
    for pid in (conflicted, clean):
        src = man["parts"][pid]
        df = spark.read.parquet(os.path.join(table, src))
        dest = f"p-{pid}-staged-occ"
        df.coalesce(1).write.parquet(os.path.join(table, dest))
        rewrites[pid] = (src, dest)

    # a merge lands in between, rewriting the conflicted partition
    merge_into_partitioned_snapshot(
        spark,
        table,
        spark.createDataFrame([(hot_key, 12345.0, 2)], SCHEMA),
        key="k",
        seq="seq",
    )

    landed = _commit_rewrites(table, rewrites)
    assert landed == [clean]  # the conflicted rewrite was dropped
    expected = dict(before)
    expected[hot_key] = 12345.0
    assert _psnap_dict(spark, table) == expected  # merge data preserved
    live = versioned.read_manifest(table)["parts"]
    assert live[clean] == rewrites[clean][1]
    assert live[conflicted] != rewrites[conflicted][1]
    # the stale dest dir is debris -> GC collects it once out of grace
    stale_dest = rewrites[conflicted][1]
    assert os.path.isdir(os.path.join(table, stale_dest))
    assert stale_dest in versioned.gc_unreferenced_parts(table, grace_sec=0)

    # exclusive version allocation: a stranded higher manifest (crashed
    # committer that never flipped the pointer) is skipped, not reused
    n = versioned.latest_version(table)
    stranded = os.path.join(table, f"manifest-v{n + 1}.json")
    with open(stranded, "w") as f:
        f.write("{}")
    got = versioned.commit_manifest(
        table, versioned.read_manifest(table)
    )
    assert got == n + 2
    assert versioned.latest_version(table) == n + 2


def test_snapshot_point_lookup_prunes_to_key_partitions(spark, tmp_path):
    """r04.5 key-based partition pruning: a point lookup recomputes the
    keys' partition ids with the merge's own hash expression and scans
    only those dirs — O(|keys|) of P — while returning exactly the rows
    a full-scan filter would."""
    from customer_segmentation_pyspark_spark.streaming.merge import (
        _snapshot_read_plan,
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )

    table = str(tmp_path / "ptable")
    merge_into_partitioned_snapshot(
        spark,
        table,
        spark.createDataFrame(
            [(k, float(k * 3), 1) for k in range(1, 65)], SCHEMA
        ),
        key="k",
        seq="seq",
        num_partitions=8,
    )
    keys = [5, 17]
    man, kept_pids, kept_dirs = _snapshot_read_plan(
        spark, table, None, None, keys
    )
    assert 1 <= len(kept_pids) <= 2  # the two keys' partitions only
    got = {
        r["k"]: r["val"]
        for r in read_partitioned_snapshot(
            spark, table, key_in=keys
        ).collect()
    }
    assert got == {5: 15.0, 17: 51.0}
    # a key in a pruned partition can never leak into the result
    full = _psnap_dict(spark, table)
    assert all(full[k] == got[k] for k in keys)


def test_snapshot_stats_pruning_skips_disjoint_dirs(spark, tmp_path):
    """r04.5 manifest stats skipping: dirs whose footer min/max are
    provably disjoint from the where-range are never read; pruned and
    unpruned reads return identical rows; unknown ops refuse."""
    import os

    import pytest as _pytest

    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        _snapshot_read_plan,
        read_partitioned_snapshot,
    )

    table = str(tmp_path / "stable")
    os.makedirs(table)
    parts, stats = {}, {}
    # four dirs with disjoint val ranges — the naturally-clustered shape
    # (batch/tenant/date correlated) where dir-level stats pay off
    for i in range(4):
        rows = [(k, float(i * 100 + k), 1) for k in range(10)]
        d = f"p-range{i}"
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            os.path.join(table, d)
        )
        parts[str(i)] = d
        stats[str(i)] = versioned.collect_dir_stats(os.path.join(table, d))
    assert stats["2"]["val"] == [200.0, 209.0]  # footer stats are real
    versioned.commit_manifest(
        table,
        {"num_partitions": 4, "key": "k", "parts": parts, "stats": stats},
    )

    _, kept, _ = _snapshot_read_plan(
        spark, table, None, [("val", ">=", 290.0)], None
    )
    assert kept == ["3"]  # three of four dirs proven disjoint
    pruned = read_partitioned_snapshot(
        spark, table, where=[("val", ">=", 290.0)]
    )
    unpruned = read_partitioned_snapshot(spark, table).filter(
        F.col("val") >= 290.0
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, unpruned.collect())
    )
    # everything pruned: schema intact, zero rows
    none = read_partitioned_snapshot(spark, table, where=[("val", ">", 1e9)])
    assert none.columns == ["k", "val", "seq"] and none.count() == 0
    # equality + string guard: incompatible type never prunes wrongly
    _, kept_eq, _ = _snapshot_read_plan(
        spark, table, None, [("val", "=", 105.0)], None
    )
    assert kept_eq == ["1"]
    with _pytest.raises(ValueError, match="unsupported where op"):
        read_partitioned_snapshot(spark, table, where=[("val", "!=", 1.0)])


def test_stats_follow_merge_and_maintenance(spark, tmp_path):
    """Stats are written by the merge itself (footer-derived, per
    touched partition) and refreshed when compaction/clustering rewrite
    a dir, so pruning decisions never consult a stale directory."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        cluster_partitioned_snapshot,
        merge_into_partitioned_snapshot,
    )

    table = str(tmp_path / "ptable")
    merge_into_partitioned_snapshot(
        spark,
        table,
        spark.createDataFrame(
            [(k, float(k), 1) for k in range(1, 33)], SCHEMA
        ),
        key="k",
        seq="seq",
        num_partitions=4,
    )
    man = versioned.read_manifest(table)
    assert man["key"] == "k"
    assert set(man["stats"]) == set(man["parts"])
    for pid in man["parts"]:
        mn, mx = man["stats"][pid]["k"]
        assert 1 <= mn <= mx <= 32
    # an update wave refreshes only the touched partition's stats entry
    merge_into_partitioned_snapshot(
        spark,
        table,
        spark.createDataFrame([(7, 7777.0, 2)], SCHEMA),
        key="k",
        seq="seq",
    )
    man2 = versioned.read_manifest(table)
    touched = [p for p in man2["parts"] if man2["parts"][p] != man["parts"][p]]
    assert len(touched) == 1
    assert man2["stats"][touched[0]]["val"][1] == 7777.0
    for p in man2["parts"]:
        if p != touched[0]:
            assert man2["stats"][p] == man["stats"][p]
    # maintenance rewrite recomputes stats for the fresh dirs
    cluster_partitioned_snapshot(spark, table, ["val"])
    man3 = versioned.read_manifest(table)
    assert set(man3["stats"]) == set(man3["parts"])
    assert man3["stats"][touched[0]]["val"][1] == 7777.0


def test_change_feed_matches_python_diff(spark, tmp_path):
    """read_snapshot_changes emits the Delta-CDF row set: inserts for
    new keys, pre/post images for changed keys, nothing for untouched
    keys — equal to a Python diff of the two snapshots; same-version
    feed is empty; tables without a recorded key refuse."""
    import pytest as _pytest

    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_snapshot_changes,
    )

    table = str(tmp_path / "ptable")
    merge_into_partitioned_snapshot(
        spark,
        table,
        spark.createDataFrame(
            [(k, float(k), 1) for k in range(1, 21)], SCHEMA
        ),
        key="k",
        seq="seq",
        num_partitions=4,
    )
    v1 = versioned.latest_version(table)
    snap1 = _psnap_dict(spark, table)
    wave = [(k, float(k * 100), 2) for k in (3, 8)] + [
        (101, 101.0, 2), (102, 102.0, 2)
    ]
    merge_into_partitioned_snapshot(
        spark, table, spark.createDataFrame(wave, SCHEMA), key="k", seq="seq"
    )
    snap2 = _psnap_dict(spark, table)

    feed = read_snapshot_changes(spark, table, v1).collect()
    got = {(r["k"], r["_change_type"]): r["val"] for r in feed}
    expected = {}
    for k in set(snap1) | set(snap2):
        if k not in snap1:
            expected[(k, "insert")] = snap2[k]
        elif k not in snap2:
            expected[(k, "delete")] = snap1[k]
        elif snap1[k] != snap2[k]:
            expected[(k, "update_preimage")] = snap1[k]
            expected[(k, "update_postimage")] = snap2[k]
    assert got == expected
    assert {"insert", "update_preimage", "update_postimage"} == {
        t for _, t in got
    }
    # same-version feed: empty but correctly shaped
    same = read_snapshot_changes(spark, table, v1, v1)
    assert same.columns == ["k", "val", "seq", "_change_type"]
    assert same.count() == 0
    # a pre-key-field manifest refuses with guidance
    man = versioned.read_manifest(table)
    legacy = {k: v for k, v in man.items() if k != "key"}
    versioned.commit_manifest(table, legacy)
    with _pytest.raises(ValueError, match="re-merge"):
        read_snapshot_changes(
            spark, table, versioned.latest_version(table)
        )


def test_partitions_in_projection(spark, tmp_path):
    """r07: partitions_in is an explicit partition projection — rows of
    exactly the named hash partitions, no other dirs listed; [] yields
    an empty frame with the table schema."""
    from customer_segmentation_pyspark_spark.streaming.merge import (
        _part_expr,
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )

    d = str(tmp_path / "t")
    merge_into_partitioned_snapshot(
        spark,
        d,
        spark.createDataFrame(
            [(i, f"v{i}", 0) for i in range(40)], "k long, v string, s long"
        ),
        key="k",
        seq="s",
        num_partitions=8,
    )
    full = read_partitioned_snapshot(spark, d)
    by_pid = {
        r["k"]: r["p"]
        for r in full.select("k", _part_expr("k", 8).alias("p")).collect()
    }
    want = {k for k, p in by_pid.items() if p in (2, 5)}
    got_df = read_partitioned_snapshot(spark, d, partitions_in=[2, 5])
    got = {r["k"] for r in got_df.collect()}
    assert got == want
    assert set(got_df.inputFiles()) < set(full.inputFiles())
    empty = read_partitioned_snapshot(spark, d, partitions_in=[])
    assert empty.count() == 0
    assert empty.columns == full.columns


def test_staged_merge_leaves_no_trace_on_empty_or_refused_batches(
    spark, tmp_path
):
    """r10 staged single-execution merge: the delta is staged to a
    .staging-* dir BEFORE the NULL-key / empty-batch decisions, so these
    paths must clean up after themselves — an empty batch on a
    nonexistent table leaves no directory at all (the old flow returned
    before creating one), a NULL-keyed batch raises and leaves no trace
    on a fresh table, and a successful merge leaves no .staging-*
    debris behind."""
    import os

    import pytest

    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        merge_mor_into_partitioned_snapshot,
    )

    t = str(tmp_path / "t")
    empty = spark.createDataFrame([], SCHEMA)
    merge_into_partitioned_snapshot(
        spark, t, empty, key="k", seq="seq", num_partitions=4
    )
    assert not os.path.exists(t)  # empty seed batch: no trace
    merge_mor_into_partitioned_snapshot(
        spark, t, empty, key="k", seq="seq", num_partitions=4
    )
    assert not os.path.exists(t)

    bad = spark.createDataFrame([(None, 1.0, 1), (2, 2.0, 2)], SCHEMA)
    with pytest.raises(ValueError, match="NULL"):
        merge_into_partitioned_snapshot(
            spark, t, bad, key="k", seq="seq", num_partitions=4
        )
    assert not os.path.exists(t)  # refused seed: no trace
    with pytest.raises(ValueError, match="NULL"):
        merge_mor_into_partitioned_snapshot(
            spark, t, bad, key="k", seq="seq", num_partitions=4
        )
    assert not os.path.exists(t)

    good = spark.createDataFrame(
        [(1, 1.0, 1), (2, 2.0, 1), (3, None, 1)], SCHEMA
    )
    merge_into_partitioned_snapshot(
        spark, t, good, key="k", seq="seq", num_partitions=4
    )
    assert _psnap_dict(spark, t) == {1: 1.0, 2: 2.0, 3: None}
    # a NULL-keyed or empty INCREMENTAL batch must not disturb the table
    with pytest.raises(ValueError, match="NULL"):
        merge_into_partitioned_snapshot(
            spark, t, bad, key="k", seq="seq", num_partitions=4
        )
    merge_into_partitioned_snapshot(
        spark, t, empty, key="k", seq="seq", num_partitions=4
    )
    assert _psnap_dict(spark, t) == {1: 1.0, 2: 2.0, 3: None}
    assert not [
        d for d in os.listdir(t) if d.startswith(".staging-")
    ]  # no staging debris after any of the paths above


def test_staged_seed_fast_path_equals_incremental_result(spark, tmp_path):
    """r10: the seed fast path (staged dirs adopted by rename, no merge
    join) must produce the same state as seeding via an incremental
    merge over a pre-created table — including latest-wins dedup and
    tombstones of absent keys inside the seed batch itself."""
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
    )

    rows = [
        (1, 1.0, 0, "U"),
        (1, 9.0, 1, "U"),  # latest-wins inside the seed
        (2, 2.0, 0, "U"),
        (2, None, 1, "D"),  # insert-then-delete nets to nothing
        (3, None, 0, "D"),  # tombstone of an absent key: no-op
        (4, 4.0, 0, "U"),
    ]
    sch = "k long, val double, seq long, op string"

    fast = str(tmp_path / "fast")
    merge_into_partitioned_snapshot(
        spark,
        fast,
        spark.createDataFrame(rows, sch),
        key="k",
        seq="seq",
        num_partitions=4,
        delete_when="op = 'D'",
        marker_cols=("op",),
    )
    slow = str(tmp_path / "slow")
    # pre-create the table so the second merge takes the join path
    merge_into_partitioned_snapshot(
        spark,
        slow,
        spark.createDataFrame([(1, 0.5, -1, "U")], sch),
        key="k",
        seq="seq",
        num_partitions=4,
        delete_when="op = 'D'",
        marker_cols=("op",),
    )
    merge_into_partitioned_snapshot(
        spark,
        slow,
        spark.createDataFrame(rows, sch),
        key="k",
        seq="seq",
        num_partitions=4,
        delete_when="op = 'D'",
        marker_cols=("op",),
    )
    assert _psnap_dict(spark, fast) == {1: 9.0, 4: 4.0}
    assert _psnap_dict(spark, slow) == {1: 9.0, 4: 4.0}


def test_merge_debug_guard_catches_lying_unique_keys_caller(
    spark, tmp_path, monkeypatch
):
    """r11 (VERDICT #7): assume_unique_keys skips the dedup window, so a
    caller that lies lands duplicate key rows silently. With
    SPARK_GRAFT_MERGE_DEBUG=1 the merge probes the already-staged delta
    for duplicate keys (one bounded extra job) and refuses BEFORE
    anything commits — on both the CoW and MoR paths; a truthful batch
    passes under the same flag."""
    import pytest

    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        merge_mor_into_partitioned_snapshot,
    )

    monkeypatch.setenv("SPARK_GRAFT_MERGE_DEBUG", "1")
    dup = spark.createDataFrame([(1, 1.0, 1), (1, 2.0, 2), (2, 2.0, 1)], SCHEMA)
    t = str(tmp_path / "cow")
    with pytest.raises(ValueError, match="assume_unique_keys violated"):
        merge_into_partitioned_snapshot(
            spark, t, dup, key="k", seq="seq", num_partitions=4,
            assume_unique_keys=True,
        )
    assert versioned.latest_version(t) == 0  # nothing committed
    m = str(tmp_path / "mor")
    with pytest.raises(ValueError, match="assume_unique_keys violated"):
        merge_mor_into_partitioned_snapshot(
            spark, m, dup, key="k", seq="seq", num_partitions=4,
            assume_unique_keys=True,
        )
    assert versioned.latest_version(m) == 0

    good = spark.createDataFrame([(1, 1.0, 1), (2, 2.0, 1)], SCHEMA)
    merge_into_partitioned_snapshot(
        spark, t, good, key="k", seq="seq", num_partitions=4,
        assume_unique_keys=True,
    )
    assert _psnap_dict(spark, t) == {1: 1.0, 2: 2.0}
    # without the flag the guard adds nothing (documented hazard: the
    # duplicate batch lands) — only the commit count proves no extra
    # refusal path fires
    monkeypatch.delenv("SPARK_GRAFT_MERGE_DEBUG")
    merge_into_partitioned_snapshot(
        spark, t, good, key="k", seq="seq", num_partitions=4,
        assume_unique_keys=True,
    )
    assert _psnap_dict(spark, t) == {1: 1.0, 2: 2.0}


def test_pre_commit_check_rides_staged_observation(spark, tmp_path):
    """r11 (VERDICT #4): pre_commit_check aggregates ride the staged
    write's Observation — the validator sees the reduced delta's
    metrics, a raising validator aborts with no commit and no trace on
    a fresh table, and a passing one commits normally."""
    import os

    import pytest

    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
    )

    t = str(tmp_path / "t")
    seen = {}

    def _refuse(vals):
        seen.update(vals)
        if vals["mx"] > 5:
            raise ValueError("contract violated")

    batch = spark.createDataFrame([(1, 1.0, 3), (2, 2.0, 9)], SCHEMA)
    with pytest.raises(ValueError, match="contract violated"):
        merge_into_partitioned_snapshot(
            spark, t, batch, key="k", seq="seq", num_partitions=4,
            pre_commit_check=({"mx": F.max("seq")}, _refuse),
        )
    assert seen["mx"] == 9  # metrics delivered from the staged write
    assert not os.path.exists(t)  # refused seed: no trace
    ok = spark.createDataFrame([(1, 1.0, 3), (2, 2.0, 5)], SCHEMA)
    merge_into_partitioned_snapshot(
        spark, t, ok, key="k", seq="seq", num_partitions=4,
        pre_commit_check=({"mx": F.max("seq")}, _refuse),
    )
    assert versioned.latest_version(t) == 1
    assert _psnap_dict(spark, t) == {1: 1.0, 2: 2.0}
    # a refused INCREMENTAL batch must leave the committed state alone
    with pytest.raises(ValueError, match="contract violated"):
        merge_into_partitioned_snapshot(
            spark, t, batch, key="k", seq="seq", num_partitions=4,
            pre_commit_check=({"mx": F.max("seq")}, _refuse),
        )
    assert versioned.latest_version(t) == 1
    assert _psnap_dict(spark, t) == {1: 1.0, 2: 2.0}


def test_refused_merge_never_deletes_concurrent_first_commit(
    spark, tmp_path, monkeypatch
):
    """r10 ADVICE: dir_existed is sampled before the staging job; a
    concurrent FIRST merge can create and commit the table inside that
    window, and the old refusal cleanup rmtree'd the whole table dir —
    destroying the other writer's committed partitions and manifests.
    Simulated deterministically by committing a concurrent merge from
    inside the refused merge's staging write; the refusal must leave
    that commit fully readable."""
    import pyspark.sql.readwriter as rw
    import pytest

    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
    )

    t = str(tmp_path / "t")
    orig = rw.DataFrameWriter.parquet
    state = {"fired": False}

    def hooked(self, path, *a, **kw):
        if not state["fired"] and ".staging-" in str(path):
            state["fired"] = True  # guard before recursing
            good = spark.createDataFrame([(7, 7.0, 1)], SCHEMA)
            merge_into_partitioned_snapshot(
                spark, t, good, key="k", seq="seq", num_partitions=4
            )
        return orig(self, path, *a, **kw)

    monkeypatch.setattr(rw.DataFrameWriter, "parquet", hooked)
    bad = spark.createDataFrame([(None, 1.0, 1)], SCHEMA)
    with pytest.raises(ValueError, match="NULL"):
        merge_into_partitioned_snapshot(
            spark, t, bad, key="k", seq="seq", num_partitions=4
        )
    monkeypatch.undo()
    assert state["fired"]
    assert versioned.latest_version(t) >= 1  # the concurrent commit lives
    assert _psnap_dict(spark, t) == {7: 7.0}


def test_clustered_dedup_matches_keyed_window(spark, tmp_path):
    """r11 (VERDICT #5): the dir-clustered latest-per-key window
    (exchange keyed by __part instead of the key) must reproduce the
    keyed window's results exactly — multiple versions per key, deletes,
    NULL values, keys colliding into the same hash partition — on both
    CoW and MoR paths."""
    import random

    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        merge_mor_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )

    rng = random.Random(11)
    rows, seqs = [], {}
    for _ in range(400):
        k = rng.randrange(40)
        s = seqs[k] = seqs.get(k, 0) + 1
        op = "D" if rng.random() < 0.2 else "U"
        rows.append(
            (k, None if rng.random() < 0.1 else float(rng.randrange(100)),
             s, op)
        )
    sch = "k long, val double, seq long, op string"
    # python model: latest row per key by seq; a latest-row delete
    # drops the key (latest-wins classification, _split_deletes)
    final = {}
    by_key = {}
    for r in rows:
        cur = by_key.get(r[0])
        if cur is None or r[2] > cur[2]:
            by_key[r[0]] = r
    for k, (kk, v, s, op) in by_key.items():
        if op != "D":
            final[k] = v

    for merge_fn, name in (
        (merge_into_partitioned_snapshot, "cow"),
        (merge_mor_into_partitioned_snapshot, "mor"),
    ):
        t = str(tmp_path / name)
        merge_fn(
            spark, t, spark.createDataFrame(rows, sch),
            key="k", seq="seq", num_partitions=4,
            delete_when="op = 'D'", marker_cols=("op",),
        )
        got = {
            r["k"]: r["val"]
            for r in read_partitioned_snapshot(spark, t).collect()
        }
        assert got == final, name
