"""Secondary column index (r07): CDF-maintained value→partition map
for non-key point lookups — pruned reads, staleness escape hatch,
superset semantics, replay idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.streaming.colindex import (
    _colidx_dir,
    read_by_column_value,
    sync_column_index,
)
from customer_segmentation_pyspark_spark.streaming.merge import (
    merge_into_partitioned_snapshot,
    read_partitioned_snapshot,
)


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _mk(spark, d, rows, n_parts=8):
    merge_into_partitioned_snapshot(
        spark,
        d,
        spark.createDataFrame(
            rows, "k long, cat string, v double, seq long"
        ),
        key="k",
        seq="seq",
        num_partitions=n_parts,
    )


def test_indexed_lookup_equals_filter_and_prunes(spark, tmp_path):
    from customer_segmentation_pyspark_spark.streaming.merge import (
        _part_expr,
    )

    d = str(tmp_path / "t")
    # rare values: ~3 rows per tag over 8 partitions, so a looked-up
    # tag maps to a few partitions and pruning is observable
    _mk(spark, d, [(i, f"c{i % 67}", float(i), 0) for i in range(200)])
    sync_column_index(spark, d, "cat", num_partitions=4)
    got = read_by_column_value(spark, d, "cat", ["c3", "c7"])
    full = read_partitioned_snapshot(spark, d)
    want = full.filter(F.col("cat").isin(["c3", "c7"]))
    assert _rows(got, "k", "cat", "v") == _rows(want, "k", "cat", "v")
    # strict pruning: only the partitions holding c3/c7 rows are read
    dep_keys = [i for i in range(200) if i % 67 in (3, 7)]
    dep_pids = {
        r["p"]
        for r in spark.createDataFrame([(k,) for k in dep_keys], "k long")
        .select(_part_expr("k", 8).alias("p"))
        .collect()
    }
    assert len(dep_pids) < 8
    allowed = set(
        read_partitioned_snapshot(
            spark, d, partitions_in=sorted(dep_pids)
        ).inputFiles()
    )
    got_files = set(got.inputFiles())
    full_files = set(full.inputFiles())
    assert got_files and got_files <= allowed < full_files


def test_stale_index_reads_are_exact(spark, tmp_path):
    """Rows merged AFTER the last index sync must still be found — the
    read unions the partitions whose dirs changed since the indexed
    version (no re-sync required)."""
    d = str(tmp_path / "t")
    _mk(spark, d, [(i, f"c{i % 5}", float(i), 0) for i in range(60)])
    sync_column_index(spark, d, "cat", num_partitions=4)
    # post-sync wave: new value 'zz', a retarget to c1, a delete-less
    # update — none indexed yet
    _mk(spark, d, [(1000, "zz", 1.0, 1), (3, "c1", 33.0, 1)])
    for vals in (["zz"], ["c1"], ["zz", "c0"]):
        got = read_by_column_value(spark, d, "cat", vals)
        want = read_partitioned_snapshot(spark, d).filter(
            F.col("cat").isin(vals)
        )
        assert _rows(got, "k", "cat", "v") == _rows(want, "k", "cat", "v")
    # after the sync the fresh value is indexed and still correct
    sync_column_index(spark, d, "cat")
    got = read_by_column_value(spark, d, "cat", ["zz"])
    assert _rows(got, "k") == [(1000,)]


def test_index_superset_after_deletes(spark, tmp_path):
    d = str(tmp_path / "t")
    _mk(spark, d, [(i, f"c{i % 3}", float(i), 0) for i in range(30)])
    sync_column_index(spark, d, "cat", num_partitions=4)
    # delete every c2 row (value leaves the table, entry stays — the
    # superset rule: extra IO, never wrong rows)
    dels = spark.createDataFrame(
        [(i, "c2", float(i), 1, "D") for i in range(30) if i % 3 == 2],
        "k long, cat string, v double, seq long, op string",
    )
    merge_into_partitioned_snapshot(
        spark, d, dels, key="k", seq="seq",
        delete_when="op = 'D'", marker_cols=("op",),
    )
    sync_column_index(spark, d, "cat")
    got = read_by_column_value(spark, d, "cat", ["c2"])
    assert got.count() == 0


def test_sync_replay_is_idempotent(spark, tmp_path):
    import os

    from customer_segmentation_pyspark_spark.streaming.views import (
        SRC_VERSION_FILE,
    )

    d = str(tmp_path / "t")
    _mk(spark, d, [(i, f"c{i % 4}", float(i), 0) for i in range(40)])
    sync_column_index(spark, d, "cat", num_partitions=4)
    _mk(spark, d, [(500, "c9", 5.0, 1)])
    sync_column_index(spark, d, "cat")
    want = _rows(
        read_partitioned_snapshot(spark, _colidx_dir(d, "cat")),
        "cat",
        "parts",
    )
    # simulated crash: marker rolled back to the pre-wave cursor, the
    # retry re-folds the same CDF slice onto the already-merged index
    with open(os.path.join(_colidx_dir(d, "cat"), SRC_VERSION_FILE),
              "w") as f:
        f.write("1")
    sync_column_index(spark, d, "cat")
    got = _rows(
        read_partitioned_snapshot(spark, _colidx_dir(d, "cat")),
        "cat",
        "parts",
    )
    assert got == want


def test_unindexed_column_falls_back(spark, tmp_path):
    d = str(tmp_path / "t")
    _mk(spark, d, [(i, f"c{i % 3}", float(i), 0) for i in range(30)])
    got = read_by_column_value(spark, d, "cat", ["c1"])
    want = read_partitioned_snapshot(spark, d).filter(
        F.col("cat") == "c1"
    )
    assert _rows(got, "k", "cat", "v") == _rows(want, "k", "cat", "v")


def test_large_delta_sync_avoids_wave_sized_in_list(
    spark, tmp_path, monkeypatch
):
    """r08 (VERDICT #3): a CDC batch touching more distinct values than
    `_COLIDX_POINT_READ_MAX` must look up prior entries with a
    semi-join against the index subtable, never a driver collect +
    wave-sized key_in IN-list — and stay exact."""
    from customer_segmentation_pyspark_spark.streaming import colindex
    from customer_segmentation_pyspark_spark.streaming import merge

    d = str(tmp_path / "t")
    _mk(spark, d, [(i, f"c{i}", float(i), 0) for i in range(150)])
    sync_column_index(spark, d, "cat", num_partitions=4)

    real = merge.read_partitioned_snapshot
    key_in_sizes = []

    def spy(spark_, table_dir, **kw):
        if kw.get("key_in") is not None:
            key_in_sizes.append(len(list(kw["key_in"])))
        return real(spark_, table_dir, **kw)

    monkeypatch.setattr(merge, "read_partitioned_snapshot", spy)
    # a wave retargeting >64 distinct values
    _mk(spark, d, [(i, f"c{i + 1000}", float(i), 1) for i in range(100)])
    sync_column_index(spark, d, "cat", num_partitions=4)
    assert all(
        n <= colindex._COLIDX_POINT_READ_MAX for n in key_in_sizes
    ), key_in_sizes
    # and a small wave still takes the point-read fast path
    key_in_sizes.clear()
    _mk(spark, d, [(0, "tiny", 0.0, 2)])
    sync_column_index(spark, d, "cat", num_partitions=4)
    assert key_in_sizes and max(key_in_sizes) <= 64
    got = read_by_column_value(spark, d, "cat", ["c1005", "tiny"])
    want = read_partitioned_snapshot(spark, d).filter(
        F.col("cat").isin(["c1005", "tiny"])
    )
    assert _rows(got, "k", "cat", "v") == _rows(want, "k", "cat", "v")


def test_lookup_pins_version_against_concurrent_commit(
    spark, tmp_path, monkeypatch
):
    """r08 (ADVICE): the final pruned read must be PINNED to the version
    the changed-partition escape hatch was computed against — a commit
    landing between latest_version() and the read adds rows the pid
    set does not cover, and an unpinned read would return a mixed
    (non-snapshot) result. Pinned, the lookup returns exactly the
    pre-commit state."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming import colindex

    d = str(tmp_path / "t")
    _mk(spark, d, [(i, f"c{i % 5}", float(i), 0) for i in range(40)])
    sync_column_index(spark, d, "cat", num_partitions=4)
    want = _rows(
        read_partitioned_snapshot(spark, d).filter(F.col("cat") == "c3"),
        "k", "cat", "v",
    )

    real = versioned.latest_version
    fired = {"done": False}

    def racing(table_dir):
        v = real(table_dir)
        if table_dir == d and not fired["done"]:
            fired["done"] = True
            # a foreign commit lands right after the version resolve
            _mk(spark, d, [(1000, "c3", 999.0, 1)])
        return v

    monkeypatch.setattr(versioned, "latest_version", racing)
    got = read_by_column_value(spark, d, "cat", ["c3"])
    assert _rows(got, "k", "cat", "v") == want  # the pinned snapshot


def test_lookup_degrades_when_indexed_manifest_expired(spark, tmp_path):
    """r08 (ADVICE): once the indexed version's manifest is gone
    (retention GC), the changed-partition escape hatch cannot be
    computed — the lookup must degrade to the full filtered scan, not
    crash with FileNotFoundError."""
    import os

    d = str(tmp_path / "t")
    _mk(spark, d, [(i, f"c{i % 5}", float(i), 0) for i in range(40)])
    sync_column_index(spark, d, "cat", num_partitions=4)
    _mk(spark, d, [(500, "c3", 1.0, 1)])  # a post-sync wave (cur > v_idx)
    # expire the indexed version's manifest
    v_idx = 1
    os.remove(os.path.join(d, f"manifest-v{v_idx}.json"))
    got = read_by_column_value(spark, d, "cat", ["c3"])
    want = read_partitioned_snapshot(spark, d).filter(
        F.col("cat") == "c3"
    )
    assert _rows(got, "k", "cat", "v") == _rows(want, "k", "cat", "v")


def test_colindex_vacuum_shrinks_and_stays_exact(spark, tmp_path):
    """r08 (VERDICT #4): after churn (deletes + value retargets) the
    superset map accretes partitions and whole rows no current data
    justifies; vacuum re-derives exact entries and deletes vanished
    values' rows, post-vacuum lookups open strictly fewer files, and
    exactness is preserved — including through a LATER wave (the
    version marker advanced to the vacuum's derivation version, so the
    escape hatch still guards post-vacuum commits)."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.colindex import (
        vacuum_column_index,
    )
    from customer_segmentation_pyspark_spark.streaming.views import (
        view_src_version,
    )

    d = str(tmp_path / "t")
    _mk(spark, d, [(i, f"c{i % 5}", float(i), 0) for i in range(80)])
    sync_column_index(spark, d, "cat", num_partitions=4)
    # churn: retarget every c1 row to c9 (c1 vanishes entirely), and
    # delete ALL c2 rows except k=42 — c2's true footprint collapses
    # to one partition while its superset entry keeps them all
    merge_into_partitioned_snapshot(
        spark, d,
        spark.createDataFrame(
            [(i, "c9", float(i), 1) for i in range(80) if i % 5 == 1],
            "k long, cat string, v double, seq long",
        ),
        key="k", seq="seq",
    )
    merge_into_partitioned_snapshot(
        spark, d,
        spark.createDataFrame(
            [(i, "c2", None, 2, "D")
             for i in range(80) if i % 5 == 2 and i != 42],
            "k long, cat string, v double, seq long, op string",
        ),
        key="k", seq="seq", delete_when="op = 'D'", marker_cols=("op",),
    )
    sync_column_index(spark, d, "cat", num_partitions=4)
    idx = _colidx_dir(d, "cat")
    pre_vals = {r[0] for r in read_partitioned_snapshot(spark, idx)
                .select("cat").collect()}
    assert "c1" in pre_vals  # superset bloat is really there
    pre_files = set(read_by_column_value(spark, d, "cat", ["c2"])
                    .inputFiles())

    vacuum_column_index(spark, d, "cat")

    post_vals = {r[0] for r in read_partitioned_snapshot(spark, idx)
                 .select("cat").collect()}
    assert "c1" not in post_vals and "c2" in post_vals
    assert view_src_version(idx) == versioned.latest_version(d)
    import os as _os
    from customer_segmentation_pyspark_spark.streaming.colindex import (
        _vacuum_marker_path,
    )
    assert not _os.path.exists(_vacuum_marker_path(idx))
    post_files = set(read_by_column_value(spark, d, "cat", ["c2"])
                     .inputFiles())
    assert post_files < pre_files  # strictly fewer dirs opened
    # exactness now and through a post-vacuum wave the index hasn't seen
    for probe in (["c9"], ["c0", "c3"], ["c1"], ["c2"]):
        got = read_by_column_value(spark, d, "cat", probe)
        want = read_partitioned_snapshot(spark, d).filter(
            F.col("cat").isin(probe)
        )
        assert _rows(got, "k", "cat") == _rows(want, "k", "cat")
    merge_into_partitioned_snapshot(
        spark, d,
        spark.createDataFrame([(500, "c9", 1.0, 3)],
                              "k long, cat string, v double, seq long"),
        key="k", seq="seq",
    )
    got = read_by_column_value(spark, d, "cat", ["c9"])
    assert (500, "c9") in _rows(got, "k", "cat")


def test_colindex_vacuum_crash_sync_rebuilds(spark, tmp_path):
    """A crashed vacuum leaves the in-progress marker; the next sync
    must rebuild from the full snapshot instead of folding
    incrementally (a fold's marker advance could stamp coverage over a
    mid-flight clip), keep the marker in place, and clamp its version
    stamp to the sweep's derivation version. Reads stay exact the
    whole time — including against a deliberately CLIPPED entry, the
    worst partial state a dying sweep can leave."""
    import os as _os

    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.colindex import (
        _vacuum_marker_path,
    )
    from customer_segmentation_pyspark_spark.streaming.views import (
        view_src_version,
    )

    d = str(tmp_path / "t")
    _mk(spark, d, [(i, f"c{i % 5}", float(i), 0) for i in range(40)])
    sync_column_index(spark, d, "cat", num_partitions=4)
    idx = _colidx_dir(d, "cat")
    v_derive = versioned.latest_version(d)
    # simulate a sweep that died mid-clip: marker dropped, then c3's
    # entry clipped to an empty partition set (the worst wrong state)
    with open(_vacuum_marker_path(idx), "w") as f:
        f.write(str(v_derive))
    merge_into_partitioned_snapshot(
        spark, idx,
        spark.createDataFrame(
            [("c3", [], 99)], "cat string, parts array<int>, __seq long"
        ),
        key="cat", seq="__seq", collect_stats=False,
    )
    # a wave lands AFTER the crash; the next sync must rebuild
    merge_into_partitioned_snapshot(
        spark, d,
        spark.createDataFrame([(100, "c3", 7.0, 1)],
                              "k long, cat string, v double, seq long"),
        key="k", seq="seq",
    )
    sync_column_index(spark, d, "cat", num_partitions=4)
    assert _os.path.exists(_vacuum_marker_path(idx))  # sync keeps it
    assert view_src_version(idx) <= v_derive  # stamp clamped
    got = read_by_column_value(spark, d, "cat", ["c3"])
    want = read_partitioned_snapshot(spark, d).filter(F.col("cat") == "c3")
    assert _rows(got, "k", "cat") == _rows(want, "k", "cat")
    assert (100, "c3") in _rows(got, "k", "cat")
    # a completing vacuum clears the marker and restores fast syncs
    from customer_segmentation_pyspark_spark.streaming.colindex import (
        vacuum_column_index,
    )
    vacuum_column_index(spark, d, "cat")
    assert not _os.path.exists(_vacuum_marker_path(idx))
    assert view_src_version(idx) == versioned.latest_version(d)


def test_range_lookup_equals_filter_and_prunes(spark, tmp_path):
    """r08 (VERDICT #5): a selective range on a range-indexed non-key
    column opens only the overlapping buckets' partitions (asserted on
    inputFiles) and equals the full filtered scan — including while
    STALE (a post-sync wave rides the changed-partition escape
    hatch)."""
    d = str(tmp_path / "t")
    _mk(spark, d, [(k, f"c{k % 7}", float(k), 0) for k in range(200)])
    from customer_segmentation_pyspark_spark.streaming.colindex import (
        read_by_column_range,
        sync_range_index,
    )

    sync_range_index(spark, d, "v", bucket_width=5.0, num_partitions=4)
    got = read_by_column_range(spark, d, "v", 10.0, 12.0)
    full = read_partitioned_snapshot(spark, d)
    want = full.filter(F.col("v").between(10.0, 12.0))
    assert _rows(got, "k", "v") == _rows(want, "k", "v")
    assert set(got.inputFiles()) < set(full.inputFiles())  # really pruned
    # stale read: a wave the index never saw adds an in-range row AND
    # moves one out of range — both must be reflected (exactness)
    merge_into_partitioned_snapshot(
        spark, d,
        spark.createDataFrame(
            [(500, "cx", 11.5, 1), (11, "c4", 999.0, 1)],
            "k long, cat string, v double, seq long",
        ),
        key="k", seq="seq",
    )
    got2 = read_by_column_range(spark, d, "v", 10.0, 12.0)
    want2 = read_partitioned_snapshot(spark, d).filter(
        F.col("v").between(10.0, 12.0)
    )
    rows2 = _rows(got2, "k", "v")
    assert rows2 == _rows(want2, "k", "v")
    assert (500, 11.5) in rows2 and (11, 999.0) not in rows2
    # catching up restores pruning over the new rows too
    sync_range_index(spark, d, "v", num_partitions=4)
    got3 = read_by_column_range(spark, d, "v", 10.0, 12.0)
    assert _rows(got3, "k", "v") == rows2
    assert set(got3.inputFiles()) < set(
        read_partitioned_snapshot(spark, d).inputFiles()
    )


def test_range_index_width_is_sticky(spark, tmp_path):
    """The bucket width persists at creation: a later sync passing a
    DIFFERENT width must refuse (rebuild, not sync), and a sync with
    no width inherits."""
    import pytest

    d = str(tmp_path / "t")
    _mk(spark, d, [(k, "c", float(k), 0) for k in range(20)])
    from customer_segmentation_pyspark_spark.streaming.colindex import (
        sync_range_index,
    )

    with pytest.raises(ValueError):
        sync_range_index(spark, d, "v")  # first sync needs a width
    sync_range_index(spark, d, "v", bucket_width=2.0, num_partitions=4)
    with pytest.raises(ValueError):
        sync_range_index(spark, d, "v", bucket_width=3.0)
    merge_into_partitioned_snapshot(
        spark, d,
        spark.createDataFrame([(100, "c", -7.5, 1)],
                              "k long, cat string, v double, seq long"),
        key="k", seq="seq",
    )
    assert sync_range_index(spark, d, "v") == 2  # width inherited
    from customer_segmentation_pyspark_spark.streaming.colindex import (
        read_by_column_range,
    )
    got = read_by_column_range(spark, d, "v", -8.0, -7.0)
    assert _rows(got, "k", "v") == [(100, -7.5)]  # negative buckets work


def test_range_lookup_without_index_falls_back(spark, tmp_path):
    d = str(tmp_path / "t")
    _mk(spark, d, [(k, "c", float(k), 0) for k in range(30)])
    from customer_segmentation_pyspark_spark.streaming.colindex import (
        read_by_column_range,
    )

    got = read_by_column_range(spark, d, "v", 5.0, 8.0)
    assert _rows(got, "k", "v") == [(k, float(k)) for k in (5, 6, 7, 8)]


def test_range_index_vacuum_shrinks_and_stays_exact(spark, tmp_path):
    """r08: buckets whose values all left the table lose their rows,
    surviving buckets shrink to their true partition footprint, and
    range reads stay exact through the sweep + a later wave."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.colindex import (
        _colrng_dir,
        read_by_column_range,
        sync_range_index,
        vacuum_range_index,
    )
    from customer_segmentation_pyspark_spark.streaming.views import (
        view_src_version,
    )

    d = str(tmp_path / "t")
    _mk(spark, d, [(k, "c", float(k), 0) for k in range(120)])
    sync_range_index(spark, d, "v", bucket_width=10.0, num_partitions=4)
    # move every value in [50, 60) up by 1000 except one; delete all
    # of [60, 70)
    merge_into_partitioned_snapshot(
        spark, d,
        spark.createDataFrame(
            [(k, "c", float(k) + 1000.0, 1) for k in range(50, 60)
             if k != 55],
            "k long, cat string, v double, seq long",
        ),
        key="k", seq="seq",
    )
    merge_into_partitioned_snapshot(
        spark, d,
        spark.createDataFrame(
            [(k, "c", None, 2, "D") for k in range(60, 70)],
            "k long, cat string, v double, seq long, op string",
        ),
        key="k", seq="seq", delete_when="op = 'D'", marker_cols=("op",),
    )
    sync_range_index(spark, d, "v", num_partitions=4)
    idx = _colrng_dir(d, "v")
    pre_bkts = {r[0] for r in read_partitioned_snapshot(spark, idx)
                .select("__bkt").collect()}
    assert 6 in pre_bkts  # [60,70) bloat: emptied but still mapped
    pre_files = set(read_by_column_range(spark, d, "v", 50.0, 59.0)
                    .inputFiles())
    vacuum_range_index(spark, d, "v")
    post_bkts = {r[0] for r in read_partitioned_snapshot(spark, idx)
                 .select("__bkt").collect()}
    assert 6 not in post_bkts and 5 in post_bkts
    assert view_src_version(idx) == versioned.latest_version(d)
    post_files = set(read_by_column_range(spark, d, "v", 50.0, 59.0)
                     .inputFiles())
    assert post_files < pre_files  # bucket 5 shrank to one row's dir
    for lo, hi in ((50.0, 59.0), (60.0, 69.0), (0.0, 5.0)):
        got = read_by_column_range(spark, d, "v", lo, hi)
        want = read_partitioned_snapshot(spark, d).filter(
            F.col("v").between(lo, hi)
        )
        assert _rows(got, "k", "v") == _rows(want, "k", "v")
    # post-vacuum wave rides the escape hatch
    merge_into_partitioned_snapshot(
        spark, d,
        spark.createDataFrame([(700, "c", 52.5, 3)],
                              "k long, cat string, v double, seq long"),
        key="k", seq="seq",
    )
    got = read_by_column_range(spark, d, "v", 50.0, 59.0)
    assert (700, 52.5) in _rows(got, "k", "v")
