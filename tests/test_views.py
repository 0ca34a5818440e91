"""Incremental COUNT/SUM view maintenance (r05): signed CDF
contributions must track a full recompute through inserts, updates,
deletes, NULL values, and groups shrinking to zero."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from customer_segmentation_pyspark_spark.sources import versioned
from customer_segmentation_pyspark_spark.streaming.merge import (
    merge_into_partitioned_snapshot,
    read_partitioned_snapshot,
    read_snapshot_changes,
)
from customer_segmentation_pyspark_spark.streaming.views import (
    seed_count_sum_view,
    update_count_sum_view,
)

SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("grp", StringType()),
        StructField("val", DoubleType()),
        StructField("seq", LongType()),
        StructField("op", StringType()),
    ]
)

WAVES = [
    # seed state: two groups, one NULL value (counts the row, adds 0)
    [(1, "a", 10.0, 0, "U"), (2, "a", None, 0, "U"), (3, "b", 5.0, 0, "U"),
     (4, "b", 7.0, 0, "U"), (5, "c", 1.0, 0, "U")],
    # update (a:1 value change), no-op update (b:3 same value — pre and
    # post must cancel), delete the whole c group, move a key across
    # groups (b:4 -> a)
    [(1, "a", 20.0, 1, "U"), (3, "b", 5.0, 1, "U"),
     (5, "c", None, 1, "D"), (4, "a", 7.0, 1, "U")],
    # NULL update on a:1 — the merge's coalesce KEEPS the old 20.0
    # (only seq changes, so the CDF emits a canceling pre/post pair or
    # nothing at all for val) — plus a brand-new group
    [(1, "a", None, 2, "U"), (6, "d", 3.0, 2, "U")],
]


def _recompute(df):
    return {
        r["grp"]: (r["n"], r["t"])
        for r in df.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce("val", F.lit(0))).cast("long").alias("t"),
        )
        .collect()
    }


def test_view_tracks_recompute_through_waves(spark, tmp_path):
    table = str(tmp_path / "t")
    view = str(tmp_path / "v")
    vs = []
    for wave in WAVES:
        merge_into_partitioned_snapshot(
            spark, table, spark.createDataFrame(wave, SCHEMA),
            "k", "seq", num_partitions=4,
            delete_when="op = 'D'", marker_cols=("op",),
        )
        vs.append(versioned.latest_version(table))
    seed_count_sum_view(
        spark, view,
        read_partitioned_snapshot(spark, table, version=vs[0]),
        "grp", F.col("val"),
    )
    for a, b in zip(vs, vs[1:]):
        update_count_sum_view(
            spark, view,
            read_snapshot_changes(spark, table, a, b),
            "grp", F.col("val"),
        )
        got = {
            r["grp"]: (r["n_rows"], r["total"])
            for r in spark.read.parquet(view).collect()
        }
        exp = _recompute(read_partitioned_snapshot(spark, table, version=b))
        assert got == exp, (b, got, exp)
    # the emptied group 'c' left the view entirely
    assert "c" not in got and got["d"] == (1, 3)
    # group 'a' absorbed the moved key; the NULL update kept 20.0
    assert got["a"] == (3, 27)  # rows 1(20.0 kept), 2(NULL->0), 4(7.0)


def test_seed_rebuild_equals_incremental(spark, tmp_path):
    """Rebuilding from the final snapshot equals the incrementally
    maintained view — the recovery path the module docstring points
    to when exactly-once application is in doubt."""
    table = str(tmp_path / "t")
    v_inc = str(tmp_path / "vi")
    v_seed = str(tmp_path / "vs")
    vs = []
    for wave in WAVES:
        merge_into_partitioned_snapshot(
            spark, table, spark.createDataFrame(wave, SCHEMA),
            "k", "seq", num_partitions=4,
            delete_when="op = 'D'", marker_cols=("op",),
        )
        vs.append(versioned.latest_version(table))
    seed_count_sum_view(
        spark, v_inc,
        read_partitioned_snapshot(spark, table, version=vs[0]),
        "grp", F.col("val"),
    )
    for a, b in zip(vs, vs[1:]):
        update_count_sum_view(
            spark, v_inc, read_snapshot_changes(spark, table, a, b),
            "grp", F.col("val"),
        )
    seed_count_sum_view(
        spark, v_seed, read_partitioned_snapshot(spark, table),
        "grp", F.col("val"),
    )
    rows = lambda p: sorted(  # noqa: E731
        (r["grp"], r["n_rows"], r["total"])
        for r in spark.read.parquet(p).collect()
    )
    assert rows(v_inc) == rows(v_seed)


def test_sync_view_exactly_once_marker(spark, tmp_path):
    """sync_view_to_snapshot: seeds on first call, folds only the CDF
    since the recorded version, no-ops when current (the replayed-call
    case), and catches up across multiple versions in one fold."""
    from customer_segmentation_pyspark_spark.streaming.views import (
        sync_view_to_snapshot,
        view_src_version,
    )

    table = str(tmp_path / "t")
    view = str(tmp_path / "v")
    merge_into_partitioned_snapshot(
        spark, table, spark.createDataFrame(WAVES[0], SCHEMA),
        "k", "seq", num_partitions=4,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    assert sync_view_to_snapshot(spark, table, view, "grp", F.col("val")) == 1
    assert view_src_version(view) == 1
    # replay (crash-retry shape): no-op, nothing double-counted
    assert sync_view_to_snapshot(spark, table, view, "grp", F.col("val")) == 1
    v1_rows = sorted(
        (r["grp"], r["n_rows"], r["total"])
        for r in spark.read.parquet(view).collect()
    )
    assert sorted(
        (g, n, t) for g, (n, t) in _recompute(
            read_partitioned_snapshot(spark, table)
        ).items()
    ) == v1_rows
    # two more waves land before the next sync: one fold catches up
    for wave in WAVES[1:]:
        merge_into_partitioned_snapshot(
            spark, table, spark.createDataFrame(wave, SCHEMA),
            "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
        )
    assert sync_view_to_snapshot(spark, table, view, "grp", F.col("val")) == 3
    got = {
        r["grp"]: (r["n_rows"], r["total"])
        for r in spark.read.parquet(view).collect()
    }
    assert got == _recompute(read_partitioned_snapshot(spark, table))
    # and replaying the final sync is again a no-op
    assert sync_view_to_snapshot(spark, table, view, "grp", F.col("val")) == 3
    assert got == {
        r["grp"]: (r["n_rows"], r["total"])
        for r in spark.read.parquet(view).collect()
    }


def test_null_group_merges_not_duplicated(spark, tmp_path):
    """A NULL group present in both the view and the delta must merge
    into ONE row (r06, ADVICE: plain equality never matches NULL, which
    left two NULL-group rows with split counters)."""
    view_dir = str(tmp_path / "v")
    seed = spark.createDataFrame(
        [(1, None, 10.0), (2, "a", 5.0)],
        "k long, grp string, val double",
    )
    seed_count_sum_view(spark, view_dir, seed, "grp", F.col("val"))
    cdf = spark.createDataFrame(
        [(3, None, 7.0, "insert"), (4, "a", 1.0, "insert")],
        "k long, grp string, val double, _change_type string",
    )
    update_count_sum_view(spark, view_dir, cdf, "grp", F.col("val"))
    rows = {
        r["grp"]: (r["n_rows"], r["total"])
        for r in spark.read.parquet(view_dir).collect()
    }
    assert len(rows) == 2
    assert rows[None] == (2, 17)  # one merged NULL-group row
    assert rows["a"] == (2, 6)


def test_join_view_fuzzed_interleaving(spark, tmp_path):
    """r06 (VERDICT #4): after a seeded random interleaving of fact
    waves, dim waves, syncs, and map vacuums (r08: the GC must compose
    with every interleaving), the incrementally maintained join view
    equals the full-recompute join of the two final states — including
    NULLed attributes from dim deletes and re-targeted join keys."""
    import random

    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )
    from customer_segmentation_pyspark_spark.streaming.views import (
        sync_join_view_to_snapshots,
        vacuum_jvmap,
    )

    rng = random.Random(42)
    fact_dir = str(tmp_path / "fact")
    dim_dir = str(tmp_path / "dim")
    view_dir = str(tmp_path / "view")

    def fact_wave(seq, rows):
        return spark.createDataFrame(
            rows, "fk long, jk long, amt double, seq long, op string"
        )

    def dim_wave(seq, rows):
        return spark.createDataFrame(
            rows, "jk long, attr string, dseq long, dop string"
        )

    # seeds
    merge_into_partitioned_snapshot(
        spark, fact_dir,
        fact_wave(0, [(f, f % 7, float(f), 0, "U") for f in range(40)]),
        key="fk", seq="seq", num_partitions=4,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    merge_into_partitioned_snapshot(
        spark, dim_dir,
        dim_wave(0, [(j, f"a{j}", 0, "U") for j in range(7)]),
        key="jk", seq="dseq", num_partitions=4,
        delete_when="dop = 'D'", marker_cols=("dop",),
    )
    sync_join_view_to_snapshots(spark, fact_dir, dim_dir, view_dir, "jk",
                                num_partitions=4)

    seq = 0
    for step in range(12):
        seq += 1
        roll = rng.random()
        if roll < 0.45:  # fact wave: updates, join-key retargets, dels
            rows = []
            for _ in range(rng.randint(1, 6)):
                f = rng.randrange(50)
                op = "D" if rng.random() < 0.25 else "U"
                rows.append(
                    (f, rng.randrange(9), float(rng.randint(0, 99)),
                     seq, op)
                )
            merge_into_partitioned_snapshot(
                spark, fact_dir, fact_wave(seq, rows), key="fk",
                seq="seq", delete_when="op = 'D'", marker_cols=("op",),
            )
        elif roll < 0.8:  # dim wave: attr changes, dim deletes/inserts
            rows = []
            for _ in range(rng.randint(1, 3)):
                j = rng.randrange(9)
                op = "D" if rng.random() < 0.3 else "U"
                rows.append((j, f"a{j}s{seq}", seq, op))
            merge_into_partitioned_snapshot(
                spark, dim_dir, dim_wave(seq, rows), key="jk",
                seq="dseq", delete_when="dop = 'D'",
                marker_cols=("dop",),
            )
        elif roll < 0.88:  # map GC at an arbitrary point (r08)
            vacuum_jvmap(spark, view_dir)
        else:
            sync_join_view_to_snapshots(
                spark, fact_dir, dim_dir, view_dir, "jk",
                num_partitions=4,
            )
    sync_join_view_to_snapshots(spark, fact_dir, dim_dir, view_dir, "jk",
                                num_partitions=4)

    got = {
        (r["fk"], r["jk"], r["amt"], r["attr"])
        for r in read_partitioned_snapshot(spark, view_dir)
        .select("fk", "jk", "amt", "attr")
        .collect()
    }
    fact = read_partitioned_snapshot(spark, fact_dir)
    dim = read_partitioned_snapshot(spark, dim_dir)
    want = {
        (r["fk"], r["jk"], r["amt"], r["attr"])
        for r in fact.join(dim.select("jk", "attr"), "jk", "left")
        .select("fk", "jk", "amt", "attr")
        .collect()
    }
    assert got == want


def test_join_view_update_set_all_nulls_deleted_dim(spark, tmp_path):
    """A dim delete must NULL the attributes it contributed — the
    per-column coalesce would silently resurrect them (the reason the
    view merges with UPDATE SET * semantics)."""
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )
    from customer_segmentation_pyspark_spark.streaming.views import (
        sync_join_view_to_snapshots,
    )

    fact_dir, dim_dir, view_dir = (
        str(tmp_path / d) for d in ("f", "d", "v")
    )
    merge_into_partitioned_snapshot(
        spark, fact_dir,
        spark.createDataFrame(
            [(1, 10, 5.0, 0, "U")],
            "fk long, jk long, amt double, seq long, op string",
        ),
        key="fk", seq="seq", num_partitions=2,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    merge_into_partitioned_snapshot(
        spark, dim_dir,
        spark.createDataFrame(
            [(10, "gold", 0, "U")],
            "jk long, attr string, dseq long, dop string",
        ),
        key="jk", seq="dseq", num_partitions=2,
        delete_when="dop = 'D'", marker_cols=("dop",),
    )
    sync_join_view_to_snapshots(spark, fact_dir, dim_dir, view_dir, "jk",
                                num_partitions=2)
    merge_into_partitioned_snapshot(
        spark, dim_dir,
        spark.createDataFrame(
            [(10, None, 1, "D")],
            "jk long, attr string, dseq long, dop string",
        ),
        key="jk", seq="dseq", delete_when="dop = 'D'",
        marker_cols=("dop",),
    )
    sync_join_view_to_snapshots(spark, fact_dir, dim_dir, view_dir, "jk",
                                num_partitions=2)
    row = read_partitioned_snapshot(spark, view_dir).collect()[0]
    assert row["fk"] == 1 and row["attr"] is None


def test_minmax_view_rescans_only_on_extremum_delete(spark, tmp_path):
    """MIN/MAX is not self-maintainable: deleting a group's extremum
    must trigger the scoped rescan (exact new extremum), while a
    non-extremum delete stays on the cheap path; tracked vs full
    recompute through waves either way."""
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )
    from customer_segmentation_pyspark_spark.streaming.views import (
        sync_minmax_view_to_snapshot,
    )

    table = str(tmp_path / "t")
    view = str(tmp_path / "v")

    def wave(rows):
        return spark.createDataFrame(
            rows, "k long, grp string, val long, seq long, op string"
        )

    def merge(rows):
        merge_into_partitioned_snapshot(
            spark, table, wave(rows), key="k", seq="seq",
            num_partitions=4, delete_when="op = 'D'",
            marker_cols=("op",),
        )

    def check():
        sync_minmax_view_to_snapshot(
            spark, table, view, "grp", F.col("val")
        )
        got = {
            r["grp"]: (r["n_rows"], r["vmin"], r["vmax"])
            for r in spark.read.parquet(view).collect()
        }
        want = {
            r["grp"]: (r["n"], r["lo"], r["hi"])
            for r in read_partitioned_snapshot(spark, table)
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.min("val").alias("lo"),
                F.max("val").alias("hi"),
            )
            .collect()
        }
        assert got == want, (got, want)

    merge([(i, "a" if i < 5 else "b", i * 10, 0, "U") for i in range(10)])
    check()  # seed: a={0..40}, b={50..90}
    merge([(4, "a", None, 1, "D")])  # delete a's MAX (40) -> rescan
    check()
    merge([(6, "b", 65, 2, "U")])  # mid-range update: cheap path
    check()
    merge([(0, "a", None, 3, "D"), (11, "b", 95, 3, "U")])  # min del + new max
    check()
    merge([(i, "a", None, 4, "D") for i in (1, 2, 3)])  # group empties
    check()
    assert "a" not in {
        r["grp"] for r in spark.read.parquet(view).collect()
    }


def test_join_view_dim_wave_after_fact_schema_evolution(spark, tmp_path):
    """r07 (ADVICE): a fact merge that ADDS a column followed by a dim
    wave (both unsynced) used to crash the sync — the dim-invalidation
    path selected the fact table's CURRENT columns from a view that
    predates the evolution. The intersection+typed-NULL padding must
    let the sync land, with the view equal to the full recompute."""
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )
    from customer_segmentation_pyspark_spark.streaming.views import (
        sync_join_view_to_snapshots,
    )

    fact_dir = str(tmp_path / "fact")
    dim_dir = str(tmp_path / "dim")
    view_dir = str(tmp_path / "view")
    merge_into_partitioned_snapshot(
        spark, fact_dir,
        spark.createDataFrame(
            [(f, f % 3, float(f), 0) for f in range(12)],
            "fk long, jk long, amt double, seq long",
        ),
        key="fk", seq="seq", num_partitions=4,
    )
    merge_into_partitioned_snapshot(
        spark, dim_dir,
        spark.createDataFrame(
            [(j, f"a{j}", 0) for j in range(3)],
            "jk long, attr string, dseq long",
        ),
        key="jk", seq="dseq", num_partitions=4,
    )
    sync_join_view_to_snapshots(spark, fact_dir, dim_dir, view_dir, "jk",
                                num_partitions=4)
    # fact wave ADDS a column the view has never seen...
    merge_into_partitioned_snapshot(
        spark, fact_dir,
        spark.createDataFrame(
            [(3, 1, 30.0, 1, "new3")],
            "fk long, jk long, amt double, seq long, extra string",
        ),
        key="fk", seq="seq",
    )
    # ...and a dim wave lands before the next sync
    merge_into_partitioned_snapshot(
        spark, dim_dir,
        spark.createDataFrame(
            [(0, "a0-v2", 1)], "jk long, attr string, dseq long"
        ),
        key="jk", seq="dseq",
    )
    sync_join_view_to_snapshots(spark, fact_dir, dim_dir, view_dir, "jk",
                                num_partitions=4)
    got = {
        tuple(r)
        for r in read_partitioned_snapshot(spark, view_dir)
        .select("fk", "jk", "amt", "extra", "attr")
        .collect()
    }
    fact = read_partitioned_snapshot(spark, fact_dir)
    dim = read_partitioned_snapshot(spark, dim_dir)
    want = {
        tuple(r)
        for r in fact.join(dim.select("jk", "attr"), "jk", "left")
        .select("fk", "jk", "amt", "extra", "attr")
        .collect()
    }
    assert got == want


def test_dim_wave_reads_only_dependent_partitions(spark, tmp_path):
    """r07 (VERDICT #1 done-criterion): a 1-key dim wave must read only
    the view partitions that contain its dependents — asserted on
    inputFiles() of the invalidation read — and the synced view still
    equals the full recompute."""
    from customer_segmentation_pyspark_spark.streaming.merge import (
        _part_expr,
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )
    from customer_segmentation_pyspark_spark.streaming.views import (
        _invalidated_view_read,
        sync_join_view_to_snapshots,
    )

    fact_dir = str(tmp_path / "fact")
    dim_dir = str(tmp_path / "dim")
    view_dir = str(tmp_path / "view")
    n_parts = 8
    merge_into_partitioned_snapshot(
        spark, fact_dir,
        spark.createDataFrame(
            [(f, f % 8, float(f), 0) for f in range(64)],
            "fk long, jk long, amt double, seq long",
        ),
        key="fk", seq="seq", num_partitions=n_parts,
    )
    merge_into_partitioned_snapshot(
        spark, dim_dir,
        spark.createDataFrame(
            [(j, f"a{j}", 0) for j in range(8)],
            "jk long, attr string, dseq long",
        ),
        key="jk", seq="dseq", num_partitions=4,
    )
    sync_join_view_to_snapshots(spark, fact_dir, dim_dir, view_dir, "jk",
                                num_partitions=n_parts)
    # ONE dim key changes
    merge_into_partitioned_snapshot(
        spark, dim_dir,
        spark.createDataFrame([(3, "a3-v2", 1)],
                              "jk long, attr string, dseq long"),
        key="jk", seq="dseq",
    )
    # dependent fact keys of jk=3 and the view partitions they hash to
    dep_fks = [f for f in range(64) if f % 8 == 3]
    dep_pids = {
        r["p"]
        for r in spark.createDataFrame([(f,) for f in dep_fks], "fk long")
        .select(_part_expr("fk", n_parts).alias("p"))
        .collect()
    }
    assert len(dep_pids) < n_parts  # the scenario actually prunes
    pruned = _invalidated_view_read(
        spark, view_dir, "jk", spark.createDataFrame([(3,)], "jk long")
    )
    full = read_partitioned_snapshot(spark, view_dir)
    pruned_files = set(pruned.inputFiles())
    full_files = set(full.inputFiles())
    assert pruned_files and pruned_files < full_files
    allowed = set(
        read_partitioned_snapshot(
            spark, view_dir, partitions_in=sorted(dep_pids)
        ).inputFiles()
    )
    assert pruned_files <= allowed
    # every dependent row is present in the pruned read
    assert pruned.filter(F.col("jk") == 3).count() == len(dep_fks)
    # and the sync itself stays correct
    sync_join_view_to_snapshots(spark, fact_dir, dim_dir, view_dir, "jk",
                                num_partitions=n_parts)
    got = {
        tuple(r)
        for r in read_partitioned_snapshot(spark, view_dir)
        .select("fk", "jk", "amt", "attr").collect()
    }
    fact = read_partitioned_snapshot(spark, fact_dir)
    dim = read_partitioned_snapshot(spark, dim_dir)
    want = {
        tuple(r)
        for r in fact.join(dim.select("jk", "attr"), "jk", "left")
        .select("fk", "jk", "amt", "attr").collect()
    }
    assert got == want


def test_jvmap_backfills_for_pre_map_view(spark, tmp_path):
    """A view seeded without the inverted map (pre-r07 engine state,
    simulated by deleting the map subtable) must backfill it on the
    next sync and stay correct — fact-wave map merges before the
    backfill must NOT create a partial map."""
    import shutil

    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )
    from customer_segmentation_pyspark_spark.streaming.views import (
        _jvmap_dir,
        sync_join_view_to_snapshots,
    )

    fact_dir = str(tmp_path / "fact")
    dim_dir = str(tmp_path / "dim")
    view_dir = str(tmp_path / "view")
    merge_into_partitioned_snapshot(
        spark, fact_dir,
        spark.createDataFrame(
            [(f, f % 5, float(f), 0) for f in range(30)],
            "fk long, jk long, amt double, seq long",
        ),
        key="fk", seq="seq", num_partitions=4,
    )
    merge_into_partitioned_snapshot(
        spark, dim_dir,
        spark.createDataFrame(
            [(j, f"a{j}", 0) for j in range(5)],
            "jk long, attr string, dseq long",
        ),
        key="jk", seq="dseq", num_partitions=4,
    )
    sync_join_view_to_snapshots(spark, fact_dir, dim_dir, view_dir, "jk")
    shutil.rmtree(_jvmap_dir(view_dir))  # simulate pre-map view
    # a fact wave AND a dim wave land before the next sync
    merge_into_partitioned_snapshot(
        spark, fact_dir,
        spark.createDataFrame([(100, 2, 5.0, 1)],
                              "fk long, jk long, amt double, seq long"),
        key="fk", seq="seq",
    )
    merge_into_partitioned_snapshot(
        spark, dim_dir,
        spark.createDataFrame([(4, "a4-v2", 1)],
                              "jk long, attr string, dseq long"),
        key="jk", seq="dseq",
    )
    sync_join_view_to_snapshots(spark, fact_dir, dim_dir, view_dir, "jk")
    # map exists again and a later 1-key dim wave routes through it
    merge_into_partitioned_snapshot(
        spark, dim_dir,
        spark.createDataFrame([(2, "a2-v2", 2)],
                              "jk long, attr string, dseq long"),
        key="jk", seq="dseq",
    )
    sync_join_view_to_snapshots(spark, fact_dir, dim_dir, view_dir, "jk")
    got = {
        tuple(r)
        for r in read_partitioned_snapshot(spark, view_dir)
        .select("fk", "jk", "amt", "attr").collect()
    }
    fact = read_partitioned_snapshot(spark, fact_dir)
    dim = read_partitioned_snapshot(spark, dim_dir)
    want = {
        tuple(r)
        for r in fact.join(dim.select("jk", "attr"), "jk", "left")
        .select("fk", "jk", "amt", "attr").collect()
    }
    assert got == want


def test_distinct_view_tracks_recompute_through_waves(spark, tmp_path):
    """r07: the support-multiset COUNT-DISTINCT view — deletes that
    remove a group's LAST copy of a value drop n_distinct exactly;
    NULL values count rows but never distincts (SQL semantics)."""
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )
    from customer_segmentation_pyspark_spark.streaming.views import (
        read_distinct_view,
        sync_distinct_view_to_snapshot,
    )

    d = str(tmp_path / "t")
    view = str(tmp_path / "view")
    waves = [
        # (k, g, v, seq, op)
        [(1, "a", "x", 0, "U"), (2, "a", "x", 0, "U"),
         (3, "a", "y", 0, "U"), (4, "b", None, 0, "U"),
         (5, "b", "z", 0, "U")],
        # delete ONE of a's two x rows (n_distinct unchanged) and b's
        # only z row (n_distinct drops)
        [(1, "a", "x", 1, "D"), (5, "b", "z", 1, "D")],
        # retarget 3 from y to x: y leaves, x multiplicity back to 2
        [(3, "a", "x", 2, "U"), (6, "b", "w", 2, "U")],
    ]
    for w in waves:
        merge_into_partitioned_snapshot(
            spark, d,
            spark.createDataFrame(
                w, "k long, g string, v string, seq long, op string"
            ),
            key="k", seq="seq", num_partitions=4,
            delete_when="op = 'D'", marker_cols=("op",),
        )
        sync_distinct_view_to_snapshot(
            spark, d, view, "g", F.col("v")
        )
        got = {
            (r["__g"], r["n_distinct"], r["n_rows"])
            for r in read_distinct_view(spark, view).collect()
        }
        live = read_partitioned_snapshot(spark, d)
        want = {
            (r["g"], r["nd"], r["n"])
            for r in live.groupBy("g")
            .agg(
                F.count_distinct("v").cast("long").alias("nd"),
                F.count(F.lit(1)).cast("long").alias("n"),
            )
            .collect()
        }
        assert got == want, (got, want)


def test_distinct_view_exactly_once_marker(spark, tmp_path):
    import os

    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
    )
    from customer_segmentation_pyspark_spark.streaming.views import (
        SRC_VERSION_FILE,
        read_distinct_view,
        sync_distinct_view_to_snapshot,
    )

    d = str(tmp_path / "t")
    view = str(tmp_path / "view")
    merge_into_partitioned_snapshot(
        spark, d,
        spark.createDataFrame(
            [(i, "g", f"v{i % 3}", 0) for i in range(9)],
            "k long, g string, v string, seq long",
        ),
        key="k", seq="seq", num_partitions=4,
    )
    sync_distinct_view_to_snapshot(spark, d, view, "g", F.col("v"))
    merge_into_partitioned_snapshot(
        spark, d,
        spark.createDataFrame([(100, "g", "v9", 1)],
                              "k long, g string, v string, seq long"),
        key="k", seq="seq",
    )
    sync_distinct_view_to_snapshot(spark, d, view, "g", F.col("v"))
    want = sorted(map(tuple, read_distinct_view(spark, view).collect()))
    # replay the same slice (crashed-marker simulation): additive fold
    # must NOT double-apply thanks to the cursor
    sync_distinct_view_to_snapshot(spark, d, view, "g", F.col("v"))
    got = sorted(map(tuple, read_distinct_view(spark, view).collect()))
    assert got == want


def test_join_view_seed_over_emptied_fact_then_growth(spark, tmp_path):
    """r08 (ADVICE): seeding the join view while the fact table is
    EMPTY (all rows deleted) writes the cursors but commits no view
    manifest — the next sync, after the fact grows, must re-seed
    instead of subscripting the None manifest (TypeError)."""
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )
    from customer_segmentation_pyspark_spark.streaming.views import (
        sync_join_view_to_snapshots,
    )

    fact_dir = str(tmp_path / "fact")
    dim_dir = str(tmp_path / "dim")
    view_dir = str(tmp_path / "view")
    merge_into_partitioned_snapshot(
        spark, fact_dir,
        spark.createDataFrame(
            [(f, f % 3, float(f), 0, "U") for f in range(6)],
            "fk long, jk long, amt double, seq long, op string",
        ),
        key="fk", seq="seq", num_partitions=4,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    merge_into_partitioned_snapshot(
        spark, fact_dir,
        spark.createDataFrame(
            [(f, f % 3, float(f), 1, "D") for f in range(6)],
            "fk long, jk long, amt double, seq long, op string",
        ),
        key="fk", seq="seq",
        delete_when="op = 'D'", marker_cols=("op",),
    )
    merge_into_partitioned_snapshot(
        spark, dim_dir,
        spark.createDataFrame(
            [(j, f"a{j}", 0) for j in range(3)],
            "jk long, attr string, dseq long",
        ),
        key="jk", seq="dseq", num_partitions=4,
    )
    # seed over the emptied fact: cursors land, nothing commits
    sync_join_view_to_snapshots(spark, fact_dir, dim_dir, view_dir, "jk",
                                num_partitions=4)
    # the fact grows back; the next sync must re-seed, not crash
    merge_into_partitioned_snapshot(
        spark, fact_dir,
        spark.createDataFrame(
            [(f, f % 3, float(f) * 2, 2, "U") for f in range(4)],
            "fk long, jk long, amt double, seq long, op string",
        ),
        key="fk", seq="seq",
        delete_when="op = 'D'", marker_cols=("op",),
    )
    sync_join_view_to_snapshots(spark, fact_dir, dim_dir, view_dir, "jk",
                                num_partitions=4)
    got = {
        tuple(r)
        for r in read_partitioned_snapshot(spark, view_dir)
        .select("fk", "jk", "amt", "attr").collect()
    }
    fact = read_partitioned_snapshot(spark, fact_dir)
    dim = read_partitioned_snapshot(spark, dim_dir)
    want = {
        tuple(r)
        for r in fact.join(dim.select("jk", "attr"), "jk", "left")
        .select("fk", "jk", "amt", "attr").collect()
    }
    assert got == want
    # and a further incremental wave keeps tracking
    merge_into_partitioned_snapshot(
        spark, dim_dir,
        spark.createDataFrame([(1, "a1-v2", 1)],
                              "jk long, attr string, dseq long"),
        key="jk", seq="dseq",
    )
    sync_join_view_to_snapshots(spark, fact_dir, dim_dir, view_dir, "jk",
                                num_partitions=4)
    assert (
        read_partitioned_snapshot(spark, view_dir)
        .filter(F.col("jk") == 1).select("attr").distinct().collect()
        [0][0] == "a1-v2"
    )


def test_jvmap_lazy_fact_waves_commit_nothing(spark, tmp_path):
    """r08 (VERDICT #6): fact waves commit NOTHING to the inverted map
    — the map's fact-version marker plus the dim-wave escape hatch
    keep a stale map exact. A fact-only sync must leave the map table
    at its seed version; the next dim wave must still re-enrich the
    lagged dependents (whose join value the committed map has never
    seen), fold the whole lag in ONE map merge, and advance the
    marker."""
    from customer_segmentation_pyspark_spark.streaming.views import (
        _jvmap_dir,
        sync_join_view_to_snapshots,
        view_src_version,
    )

    fact_dir = str(tmp_path / "fact")
    dim_dir = str(tmp_path / "dim")
    view_dir = str(tmp_path / "view")
    merge_into_partitioned_snapshot(
        spark, fact_dir,
        spark.createDataFrame(
            [(f, f % 4, float(f), 0) for f in range(32)],
            "fk long, jk long, amt double, seq long",
        ),
        key="fk", seq="seq", num_partitions=8,
    )
    merge_into_partitioned_snapshot(
        spark, dim_dir,
        spark.createDataFrame(
            [(j, f"a{j}", 0) for j in range(4)],
            "jk long, attr string, dseq long",
        ),
        key="jk", seq="dseq", num_partitions=4,
    )
    sync_join_view_to_snapshots(spark, fact_dir, dim_dir, view_dir, "jk",
                                num_partitions=8)
    jm = _jvmap_dir(view_dir)
    v_map_seed = versioned.latest_version(jm)
    m_seed = view_src_version(jm)
    assert v_map_seed >= 1 and m_seed == versioned.latest_version(fact_dir)

    # fact-only wave: new keys under a BRAND-NEW join value (jk=9) the
    # committed map has never seen
    merge_into_partitioned_snapshot(
        spark, fact_dir,
        spark.createDataFrame(
            [(100 + i, 9, 9.0 + i, 1) for i in range(6)],
            "fk long, jk long, amt double, seq long",
        ),
        key="fk", seq="seq",
    )
    sync_join_view_to_snapshots(spark, fact_dir, dim_dir, view_dir, "jk",
                                num_partitions=8)
    assert versioned.latest_version(jm) == v_map_seed  # nothing committed
    assert view_src_version(jm) == m_seed              # marker untouched

    # dim wave introduces jk=9: the map knows nothing about its
    # dependents — only the escape hatch (fact CDF since the marker)
    # can route the re-enrichment; a broken hatch leaves attr NULL
    merge_into_partitioned_snapshot(
        spark, dim_dir,
        spark.createDataFrame([(9, "a9", 1)],
                              "jk long, attr string, dseq long"),
        key="jk", seq="dseq",
    )
    sync_join_view_to_snapshots(spark, fact_dir, dim_dir, view_dir, "jk",
                                num_partitions=8)
    got = {
        tuple(r)
        for r in read_partitioned_snapshot(spark, view_dir)
        .select("fk", "jk", "amt", "attr").collect()
    }
    fact = read_partitioned_snapshot(spark, fact_dir)
    dim = read_partitioned_snapshot(spark, dim_dir)
    want = {
        tuple(r)
        for r in fact.join(dim.select("jk", "attr"), "jk", "left")
        .select("fk", "jk", "amt", "attr").collect()
    }
    assert got == want
    assert {r[3] for r in got if r[1] == 9} == {"a9"}  # hatch routed them
    # the catch-up folded the lag in ONE merge and advanced the marker
    assert versioned.latest_version(jm) == v_map_seed + 1
    assert view_src_version(jm) == versioned.latest_version(fact_dir)


def test_jvmap_vacuum_shrinks_and_stays_exact(spark, tmp_path):
    """r08 (VERDICT #4): fact deletes and join-key retargets bloat the
    superset map; vacuum re-derives exact entries from the committed
    view and deletes vanished values' rows — post-vacuum dim-wave
    reads open strictly fewer files, the view still tracks the full
    recompute through later waves, and a concurrent-era fact wave
    (newer than the vacuum's derivation cursor) rides the escape
    hatch."""
    from customer_segmentation_pyspark_spark.streaming.views import (
        _invalidated_view_read,
        _jvmap_dir,
        _jvmap_vacuum_marker_path,
        sync_join_view_to_snapshots,
        vacuum_jvmap,
        view_src_version,
    )

    fact_dir = str(tmp_path / "fact")
    dim_dir = str(tmp_path / "dim")
    view_dir = str(tmp_path / "view")
    merge_into_partitioned_snapshot(
        spark, fact_dir,
        spark.createDataFrame(
            [(f, f % 4, float(f), 0, "U") for f in range(64)],
            "fk long, jk long, amt double, seq long, op string",
        ),
        key="fk", seq="seq", num_partitions=8,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    merge_into_partitioned_snapshot(
        spark, dim_dir,
        spark.createDataFrame(
            [(j, f"a{j}", 0) for j in range(4)],
            "jk long, attr string, dseq long",
        ),
        key="jk", seq="dseq", num_partitions=4,
    )
    sync_join_view_to_snapshots(spark, fact_dir, dim_dir, view_dir, "jk",
                                num_partitions=8)
    # churn: every jk=2 fact row except fk=2 deleted, so jk=2's true
    # dependent footprint collapses to one partition; jk=3 retargets
    # wholesale to jk=5 (jk=3 loses all dependents)
    merge_into_partitioned_snapshot(
        spark, fact_dir,
        spark.createDataFrame(
            [(f, 2, None, 1, "D") for f in range(64)
             if f % 4 == 2 and f != 2]
            + [(f, 5, float(f), 1, "U") for f in range(64) if f % 4 == 3],
            "fk long, jk long, amt double, seq long, op string",
        ),
        key="fk", seq="seq", delete_when="op = 'D'", marker_cols=("op",),
    )
    # a dim wave forces the catch-up so the map actually absorbed the
    # churn (superset bloat, not just marker lag)
    merge_into_partitioned_snapshot(
        spark, dim_dir,
        spark.createDataFrame([(5, "a5", 1)],
                              "jk long, attr string, dseq long"),
        key="jk", seq="dseq",
    )
    sync_join_view_to_snapshots(spark, fact_dir, dim_dir, view_dir, "jk",
                                num_partitions=8)
    jm = _jvmap_dir(view_dir)
    pre_vals = {r[0] for r in read_partitioned_snapshot(spark, jm)
                .select("jk").collect()}
    assert 3 in pre_vals  # bloat: jk=3 has no dependents left
    jv2 = spark.createDataFrame([(2,)], "jk long")
    pre_files = set(
        _invalidated_view_read(spark, view_dir, "jk", jv2).inputFiles()
    )

    vacuum_jvmap(spark, view_dir)

    import os as _os
    assert not _os.path.exists(_jvmap_vacuum_marker_path(view_dir))
    post_vals = {r[0] for r in read_partitioned_snapshot(spark, jm)
                 .select("jk").collect()}
    assert 3 not in post_vals and 2 in post_vals
    post_files = set(
        _invalidated_view_read(spark, view_dir, "jk", jv2).inputFiles()
    )
    assert post_files < pre_files  # strictly fewer view dirs opened
    # post-vacuum fact wave (newer than the derivation cursor) then a
    # dim wave: the escape hatch must route the new dependents
    merge_into_partitioned_snapshot(
        spark, fact_dir,
        spark.createDataFrame([(900, 7, 9.0, 2, "U")],
                              "fk long, jk long, amt double, seq long, op string"),
        key="fk", seq="seq", delete_when="op = 'D'", marker_cols=("op",),
    )
    sync_join_view_to_snapshots(spark, fact_dir, dim_dir, view_dir, "jk",
                                num_partitions=8)
    merge_into_partitioned_snapshot(
        spark, dim_dir,
        spark.createDataFrame([(7, "a7", 2)],
                              "jk long, attr string, dseq long"),
        key="jk", seq="dseq",
    )
    sync_join_view_to_snapshots(spark, fact_dir, dim_dir, view_dir, "jk",
                                num_partitions=8)
    got = {
        tuple(r)
        for r in read_partitioned_snapshot(spark, view_dir)
        .select("fk", "jk", "amt", "attr").collect()
    }
    fact = read_partitioned_snapshot(spark, fact_dir)
    dim = read_partitioned_snapshot(spark, dim_dir)
    want = {
        tuple(r)
        for r in fact.join(dim.select("jk", "attr"), "jk", "left")
        .select("fk", "jk", "amt", "attr").collect()
    }
    assert got == want
    assert (900, 7, 9.0, "a7") in got
    assert view_src_version(jm) is not None


def test_jvmap_vacuum_crash_sync_heals(spark, tmp_path):
    """A crashed vacuum leaves the in-progress marker (and possibly a
    clipped entry — the worst partial state); the next dim-wave sync
    must rebuild exact entries instead of folding, clamp its marker
    stamp to the sweep's derivation cursor, keep the sweep marker in
    place, and still produce the recompute-equal view."""
    import os as _os

    from customer_segmentation_pyspark_spark.streaming.views import (
        _jvmap_dir,
        _jvmap_vacuum_marker_path,
        sync_join_view_to_snapshots,
        vacuum_jvmap,
        view_src_version,
    )

    fact_dir = str(tmp_path / "fact")
    dim_dir = str(tmp_path / "dim")
    view_dir = str(tmp_path / "view")
    merge_into_partitioned_snapshot(
        spark, fact_dir,
        spark.createDataFrame(
            [(f, f % 4, float(f), 0) for f in range(32)],
            "fk long, jk long, amt double, seq long",
        ),
        key="fk", seq="seq", num_partitions=8,
    )
    merge_into_partitioned_snapshot(
        spark, dim_dir,
        spark.createDataFrame(
            [(j, f"a{j}", 0) for j in range(4)],
            "jk long, attr string, dseq long",
        ),
        key="jk", seq="dseq", num_partitions=4,
    )
    sync_join_view_to_snapshots(spark, fact_dir, dim_dir, view_dir, "jk",
                                num_partitions=8)
    jm = _jvmap_dir(view_dir)
    # simulate the dying sweep: marker dropped, jk=1's entry clipped
    # to an empty partition set
    with open(_jvmap_vacuum_marker_path(view_dir), "w") as f:
        f.write("1")
    merge_into_partitioned_snapshot(
        spark, jm,
        spark.createDataFrame([(1, [], 99)],
                              "jk long, parts array<int>, __seq long"),
        key="jk", seq="__seq", collect_stats=False,
    )
    # dim wave touching the clipped value: the frozen-sync heal must
    # rebuild the entry before the invalidation read routes on it
    merge_into_partitioned_snapshot(
        spark, dim_dir,
        spark.createDataFrame([(1, "a1-v2", 1)],
                              "jk long, attr string, dseq long"),
        key="jk", seq="dseq",
    )
    sync_join_view_to_snapshots(spark, fact_dir, dim_dir, view_dir, "jk",
                                num_partitions=8)
    assert _os.path.exists(_jvmap_vacuum_marker_path(view_dir))
    assert view_src_version(jm) <= 1  # stamp clamped to derivation
    got = {
        tuple(r)
        for r in read_partitioned_snapshot(spark, view_dir)
        .select("fk", "jk", "amt", "attr").collect()
    }
    fact = read_partitioned_snapshot(spark, fact_dir)
    dim = read_partitioned_snapshot(spark, dim_dir)
    want = {
        tuple(r)
        for r in fact.join(dim.select("jk", "attr"), "jk", "left")
        .select("fk", "jk", "amt", "attr").collect()
    }
    assert got == want
    assert {r[3] for r in got if r[1] == 1} == {"a1-v2"}
    # a completing vacuum clears the marker and unfreezes syncs
    vacuum_jvmap(spark, view_dir)
    assert not _os.path.exists(_jvmap_vacuum_marker_path(view_dir))


# ---------------------------------------------------------------------------
# Incremental TOP-K view (r08)
# ---------------------------------------------------------------------------


def _topk_recompute(spark, table, k):
    from pyspark.sql.window import Window

    snap = read_partitioned_snapshot(spark, table)
    sup = (
        snap.filter(F.col("val").isNotNull())
        .groupBy("grp", "val")
        .agg(F.count(F.lit(1)).cast("long").alias("mult"))
    )
    w = Window.partitionBy("grp").orderBy(F.col("val").desc())
    return {
        (r["grp"], r["rnk"]): (r["val"], r["mult"])
        for r in sup.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .collect()
    }


def test_topk_view_tracks_recompute_through_waves(spark, tmp_path):
    """Every decision branch of the buffered top-k state against a full
    recompute: above-frontier entry + trim, below-frontier discard,
    multiplicity folds, underflow rescan, complete-group shrink below
    k without rescan, group emptying, NULL values, value updates."""
    from customer_segmentation_pyspark_spark.streaming.views import (
        read_topk_view,
        sync_topk_view_to_snapshot,
    )

    table = str(tmp_path / "t")
    view = str(tmp_path / "v")
    K, SLACK = 3, 2  # cap = 5

    def merge(rows):
        merge_into_partitioned_snapshot(
            spark,
            table,
            spark.createDataFrame(
                rows, "k long, grp string, val long, seq long, op string"
            ),
            key="k",
            seq="seq",
            num_partitions=4,
            delete_when="op = 'D'",
            marker_cols=("op",),
        )

    def check():
        sync_topk_view_to_snapshot(
            spark, table, view, "grp", F.col("val"), k=K, slack=SLACK
        )
        got = {
            (r["__g"], r["__rank"]): (r["__v"], r["__mult"])
            for r in read_topk_view(spark, view).collect()
        }
        want = _topk_recompute(spark, table, K)
        assert got == want, (got, want)

    def buffer_vals(grp):
        return {
            r["__v"]
            for r in spark.read.parquet(view).filter(
                F.col("__g") == grp
            ).collect()
        }

    # a: 8 distinct values (one duplicated), buffer truncates to cap=5
    # (incomplete, frontier 40); b: 2 values (complete); NULL ignored
    merge(
        [(i, "a", (i + 1) * 10, 0, "U") for i in range(8)]
        + [(100, "a", 60, 0, "U")]  # dup of 60 -> mult 2
        + [(200, "b", 7, 0, "U"), (201, "b", 9, 0, "U")]
        + [(300, "a", None, 0, "U")]
    )
    check()

    # below-frontier insert: must be DISCARDED from the buffer (not
    # just absent from the top-k read) and never trigger a rescan
    merge([(301, "a", 5, 1, "U")])
    check()
    assert 5 not in buffer_vals("a")

    # above-frontier entry + trim: 75 enters, 40 falls off the buffer
    merge([(302, "a", 75, 2, "U")])
    check()
    assert 75 in buffer_vals("a") and 40 not in buffer_vals("a")

    # duplicate-multiplicity fold: deleting ONE copy of 60 keeps it
    merge([(100, "a", None, 3, "D")])
    check()
    assert 60 in buffer_vals("a")

    # underflow rescan: kill 80, 75, 70 -> incomplete buffer drops to
    # {60, 50} < k; the scoped rescan rebuilds the top-cap from the
    # snapshot — 40/30/20 re-enter, values the incremental path had
    # already truncated away and could never resurrect on its own
    merge([(7, "a", None, 4, "D"), (302, "a", None, 4, "D"),
           (6, "a", None, 4, "D")])
    check()
    assert buffer_vals("a") == {60, 50, 40, 30, 20}

    # complete group shrinking below k: b loses one of two values —
    # no rescan possible or needed, top-k just exposes the survivor
    merge([(200, "b", None, 5, "D")])
    check()

    # value UPDATE (pre-image decrements old value, post enters new)
    merge([(5, "a", 999, 6, "U")])
    check()

    # group empties entirely -> vanishes from the view
    merge([(201, "b", None, 7, "D")])
    check()
    assert "b" not in {
        r["__g"] for r in spark.read.parquet(view).collect()
    }


def test_topk_view_k_is_sticky_and_marker_exactly_once(spark, tmp_path):
    """k persists at creation (a different k later raises — rebuild
    contract), and a no-op sync with no new source version leaves the
    view bytes untouched."""
    import glob
    import os

    import pytest

    from customer_segmentation_pyspark_spark.streaming.views import (
        sync_topk_view_to_snapshot,
        topk_view_meta,
    )

    table = str(tmp_path / "t")
    view = str(tmp_path / "v")
    merge_into_partitioned_snapshot(
        spark,
        table,
        spark.createDataFrame(
            [(i, "g", i, 0, "U") for i in range(10)],
            "k long, grp string, val long, seq long, op string",
        ),
        key="k",
        seq="seq",
        num_partitions=2,
        delete_when="op = 'D'",
        marker_cols=("op",),
    )
    v = sync_topk_view_to_snapshot(
        spark, table, view, "grp", F.col("val"), k=4, slack=1
    )
    assert topk_view_meta(view) == (4, 1)
    with pytest.raises(ValueError, match="rebuild"):
        sync_topk_view_to_snapshot(
            spark, table, view, "grp", F.col("val"), k=5
        )
    stamp = {
        p: os.path.getmtime(p) for p in glob.glob(f"{view}/*.parquet")
    }
    assert (
        sync_topk_view_to_snapshot(spark, table, view, "grp", F.col("val"))
        == v
    )
    assert stamp == {
        p: os.path.getmtime(p) for p in glob.glob(f"{view}/*.parquet")
    }


def test_ivm_cascade_view_on_view_fuzz(spark, tmp_path):
    """r08 capstone #15: view-on-view IVM — a COUNT/SUM gold view is
    maintained from the silver JOIN view's OWN change feed (the silver
    view is an ordinary versioned MERGE table, so its CDF is already
    exact). Gold lags silver arbitrarily through a seeded interleaving
    of fact waves, dim waves, silver syncs, and gold syncs, folding
    multi-version CDF slices on catch-up; after the final syncs the
    gold aggregate equals the full recompute from the two SOURCE
    tables — attribute-group moves from dim re-enrichment included."""
    import random

    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )
    from customer_segmentation_pyspark_spark.streaming.views import (
        sync_join_view_to_snapshots,
        sync_view_to_snapshot,
    )

    rng = random.Random(7)
    fact_dir = str(tmp_path / "fact")
    dim_dir = str(tmp_path / "dim")
    silver = str(tmp_path / "silver")
    gold = str(tmp_path / "gold")

    def fact_wave(rows):
        return spark.createDataFrame(
            rows, "fk long, jk long, amt long, seq long, op string"
        )

    def dim_wave(rows):
        return spark.createDataFrame(
            rows, "jk long, attr string, dseq long, dop string"
        )

    merge_into_partitioned_snapshot(
        spark, fact_dir,
        fact_wave([(f, f % 7, f * 3, 0, "U") for f in range(40)]),
        key="fk", seq="seq", num_partitions=4,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    merge_into_partitioned_snapshot(
        spark, dim_dir,
        dim_wave([(j, f"a{j % 3}", 0, "U") for j in range(7)]),
        key="jk", seq="dseq", num_partitions=4,
        delete_when="dop = 'D'", marker_cols=("dop",),
    )

    def sync_silver():
        sync_join_view_to_snapshots(
            spark, fact_dir, dim_dir, silver, "jk", num_partitions=4
        )

    def sync_gold():
        sync_view_to_snapshot(spark, silver, gold, "attr", F.col("amt"))

    sync_silver()
    sync_gold()

    seq = 0
    for _ in range(14):
        seq += 1
        roll = rng.random()
        if roll < 0.4:  # fact wave
            rows = [
                (
                    rng.randrange(50),
                    rng.randrange(9),
                    rng.randint(0, 99),
                    seq,
                    "D" if rng.random() < 0.25 else "U",
                )
                for _ in range(rng.randint(1, 6))
            ]
            merge_into_partitioned_snapshot(
                spark, fact_dir, fact_wave(rows), key="fk",
                seq="seq", delete_when="op = 'D'", marker_cols=("op",),
            )
        elif roll < 0.65:  # dim wave: attr regroup, deletes, inserts
            rows = [
                (
                    rng.randrange(9),
                    f"a{rng.randrange(4)}",
                    seq,
                    "D" if rng.random() < 0.3 else "U",
                )
                for _ in range(rng.randint(1, 3))
            ]
            merge_into_partitioned_snapshot(
                spark, dim_dir, dim_wave(rows), key="jk",
                seq="dseq", delete_when="dop = 'D'",
                marker_cols=("dop",),
            )
        elif roll < 0.85:
            sync_silver()
        else:
            sync_gold()  # may fold several silver versions at once
    sync_silver()
    sync_gold()

    got = {
        (r["attr"], r["n_rows"], r["total"])
        for r in spark.read.parquet(gold).collect()
    }
    fact = read_partitioned_snapshot(spark, fact_dir)
    dim = read_partitioned_snapshot(spark, dim_dir)
    want = {
        (r["attr"], r["n"], r["t"])
        for r in fact.join(dim.select("jk", "attr"), "jk", "left")
        .groupBy("attr")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.coalesce("amt", F.lit(0))).cast("long").alias("t"),
        )
        .collect()
    }
    assert got == want, (got, want)


def test_topk_view_clean_path_never_touches_source(spark, tmp_path):
    """Locality contract: a slice that dirties nothing (buffered-value
    folds, above-frontier entries, below-frontier discards) must not
    read the source snapshot at all. Proven functionally: the update is
    handed an EMPTY frame as ``current_snapshot`` — if any group
    wrongly took the rescan path its rows would vanish, failing the
    recompute equality."""
    from customer_segmentation_pyspark_spark.streaming.views import (
        read_topk_view,
        seed_topk_view,
        update_topk_view,
    )

    seed = spark.createDataFrame(
        [(i, "g", (i + 1) * 10) for i in range(8)]
        + [(100, "h", 1), (101, "h", 2)],
        "k long, grp string, val long",
    )
    view = str(tmp_path / "v")
    seed_topk_view(spark, view, seed, "grp", F.col("val"), k=3, slack=2)
    # fold on a buffered value (+1 copy of 80), enter above frontier
    # (85), discard below frontier (g: 5), new group (n: 42), delete a
    # NON-frontier-exhausting copy (one of the two h values survives as
    # a complete group)
    cdf = spark.createDataFrame(
        [
            (1, "g", 80, "insert"),
            (2, "g", 85, "insert"),
            (3, "g", 5, "insert"),
            (4, "n", 42, "insert"),
            (101, "h", 2, "delete"),
        ],
        "k long, grp string, val long, _change_type string",
    )
    empty = spark.createDataFrame([], seed.schema)
    update_topk_view(spark, view, cdf, "grp", F.col("val"), empty)
    got = {
        (r["__g"], r["__rank"]): (r["__v"], r["__mult"])
        for r in read_topk_view(spark, view).collect()
    }
    assert got == {
        ("g", 1): (85, 1),
        ("g", 2): (80, 2),
        ("g", 3): (70, 1),
        ("h", 1): (1, 1),
        ("n", 1): (42, 1),
    }, got


# ---------------------------------------------------------------------------
# Incremental QUANTILE view (r08)
# ---------------------------------------------------------------------------


def test_quantile_view_tracks_recompute_through_waves(spark, tmp_path):
    """The bucketized support folds signed contributions exactly — the
    incrementally maintained view equals a fresh seed from the final
    snapshot after every wave (inserts, updates moving values across
    buckets, deletes emptying buckets, NULLs excluded), and the rank
    arithmetic picks the documented bucket on a hand-checked case."""
    from customer_segmentation_pyspark_spark.streaming.views import (
        read_quantile_view,
        seed_quantile_view,
        sync_quantile_view_to_snapshot,
    )

    table = str(tmp_path / "t")
    view = str(tmp_path / "v")

    def merge(rows):
        merge_into_partitioned_snapshot(
            spark,
            table,
            spark.createDataFrame(
                rows, "k long, grp string, val long, seq long, op string"
            ),
            key="k",
            seq="seq",
            num_partitions=4,
            delete_when="op = 'D'",
            marker_cols=("op",),
        )

    def check():
        sync_quantile_view_to_snapshot(
            spark, table, view, "grp", F.col("val"), width=10.0
        )
        got = sorted(
            (r["__g"], r["pct"], r["q_lo"], r["n_rows"])
            for r in read_quantile_view(
                spark, view, percents=[25, 50, 90, 99]
            ).collect()
        )
        fresh = str(tmp_path / "fresh")
        seed_quantile_view(
            spark, fresh,
            read_partitioned_snapshot(spark, table),
            "grp", F.col("val"), width=10.0,
        )
        want = sorted(
            (r["__g"], r["pct"], r["q_lo"], r["n_rows"])
            for r in read_quantile_view(
                spark, fresh, percents=[25, 50, 90, 99]
            ).collect()
        )
        assert got == want, (got, want)
        return dict(
            ((g, p), (q, n)) for g, p, q, n in got
        )

    # a: values 0..99 (one per unit of 1), buckets 0..9 x10 rows; the
    # 50th percentile: idx = ceil(100*50/100) = 50 -> cum hits 50 at
    # bucket 4 (rows 40..49 are ranks 41..50) -> q_lo = 40.0
    merge([(i, "a", i, 0, "U") for i in range(100)]
          + [(500, "b", None, 0, "U"), (501, "b", 7, 0, "U")])
    got = check()
    assert got[("a", 50)] == (40.0, 100)
    assert got[("a", 99)] == (90.0, 100)  # idx 99 -> bucket 9
    assert got[("b", 50)] == (0.0, 1)     # NULL excluded from n

    # delete the whole top bucket (90..99) and update 10 values from
    # bucket 0 into bucket 5 — cross-bucket moves + an emptied bucket
    merge([(i, "a", None, 1, "D") for i in range(90, 100)]
          + [(i, "a", 55, 1, "U") for i in range(10)])
    got = check()
    assert got[("a", 99)] == (80.0, 90)

    # group b gains rows; group a partially drains
    merge([(600 + i, "b", i * 3, 2, "U") for i in range(20)]
          + [(i, "a", None, 2, "D") for i in range(10, 40)])
    check()


def test_quantile_view_width_sticky(spark, tmp_path):
    import pytest

    from customer_segmentation_pyspark_spark.streaming.views import (
        quantile_view_width,
        sync_quantile_view_to_snapshot,
    )

    table = str(tmp_path / "t")
    view = str(tmp_path / "v")
    merge_into_partitioned_snapshot(
        spark,
        table,
        spark.createDataFrame(
            [(i, "g", i, 0, "U") for i in range(10)],
            "k long, grp string, val long, seq long, op string",
        ),
        key="k",
        seq="seq",
        num_partitions=2,
        delete_when="op = 'D'",
        marker_cols=("op",),
    )
    sync_quantile_view_to_snapshot(
        spark, table, view, "grp", F.col("val"), width=5.0
    )
    assert quantile_view_width(view) == 5.0
    with pytest.raises(ValueError, match="rebuild"):
        sync_quantile_view_to_snapshot(
            spark, table, view, "grp", F.col("val"), width=2.0
        )
    # width omitted after creation: fine (meta carries it)
    assert (
        sync_quantile_view_to_snapshot(spark, table, view, "grp", F.col("val"))
        == 1
    )


# ---------------------------------------------------------------------------
# MERGE-backed COUNT/SUM view (r08)
# ---------------------------------------------------------------------------


def _agg_merge_recompute(spark, table):
    return {
        r["grp"]: (r["n"], r["t"])
        for r in read_partitioned_snapshot(spark, table)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.coalesce("val", F.lit(0))).cast("long").alias("t"),
        )
        .collect()
    }


def test_agg_merge_view_tracks_recompute_and_replays_convergently(
    spark, tmp_path
):
    """The merge-backed view folds every wave exactly (NULL groups and
    values, group emptying included) — and re-folding the SAME slice
    after a simulated crash (cursor rewound past a landed merge) is a
    no-op thanks to the per-group __applied witness: the additive fold
    can never double-count."""
    import os as _os

    from customer_segmentation_pyspark_spark.streaming.views import (
        SRC_VERSION_FILE,
        read_agg_merge_view,
        sync_agg_merge_view,
    )

    table = str(tmp_path / "t")
    view = str(tmp_path / "v")
    versions = []
    for wave in WAVES:
        merge_into_partitioned_snapshot(
            spark, table, spark.createDataFrame(wave, SCHEMA),
            "k", "seq", num_partitions=4,
            delete_when="op = 'D'", marker_cols=("op",),
        )
        versions.append(versioned.latest_version(table))
        sync_agg_merge_view(
            spark, table, view, "grp", F.col("val"), num_partitions=4
        )
        got = {
            r["grp"]: (r["n_rows"], r["total"])
            for r in read_agg_merge_view(spark, view).collect()
        }
        assert got == _agg_merge_recompute(spark, table), got
    # group 'c' emptied -> tombstoned out of the view
    assert "c" not in got

    # crash simulation: the last sync's merge LANDED but the cursor
    # write was lost — rewind the marker and replay the slice
    with open(_os.path.join(view, SRC_VERSION_FILE), "w") as f:
        f.write(str(versions[-2]))
    assert (
        sync_agg_merge_view(spark, table, view, "grp", F.col("val"))
        == versions[-1]
    )
    replayed = {
        r["grp"]: (r["n_rows"], r["total"])
        for r in read_agg_merge_view(spark, view).collect()
    }
    assert replayed == got, (replayed, got)


def test_agg_merge_view_semi_join_fallback_matches_point_read(
    spark, tmp_path
):
    """Past the point-read bound the sync must switch to the semi-join
    read (never a wave-sized IN-list) with identical results; NULL
    groups route through the surrogate on both paths."""
    from customer_segmentation_pyspark_spark.streaming.views import (
        read_agg_merge_view,
        sync_agg_merge_view,
    )

    table = str(tmp_path / "t")
    v_point = str(tmp_path / "vp")
    v_semi = str(tmp_path / "vs")
    base = [(i, f"g{i % 20}" if i % 7 else None, float(i), 0, "U")
            for i in range(100)]
    wave = [(i, f"g{i % 20}" if i % 7 else None, float(i * 2), 1, "U")
            for i in range(0, 100, 2)] + [
        (i, None, None, 1, "D") for i in range(1, 100, 9)
    ]
    for rows in (base,):
        merge_into_partitioned_snapshot(
            spark, table, spark.createDataFrame(rows, SCHEMA),
            "k", "seq", num_partitions=4,
            delete_when="op = 'D'", marker_cols=("op",),
        )
    for v in (v_point, v_semi):
        sync_agg_merge_view(
            spark, table, v, "grp", F.col("val"), num_partitions=4
        )
    merge_into_partitioned_snapshot(
        spark, table, spark.createDataFrame(wave, SCHEMA),
        "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
    )
    sync_agg_merge_view(
        spark, table, v_point, "grp", F.col("val"),
        point_read_max_groups=64,
    )
    sync_agg_merge_view(
        spark, table, v_semi, "grp", F.col("val"),
        point_read_max_groups=2,  # force the fallback
    )
    nskey = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    rows = lambda d: sorted(  # noqa: E731
        ((r["grp"], r["n_rows"], r["total"])
         for r in read_agg_merge_view(spark, d).collect()),
        key=nskey,
    )
    want = sorted(
        ((g, n, t) for g, (n, t) in
         _agg_merge_recompute(spark, table).items()),
        key=nskey,
    )
    assert rows(v_point) == want
    assert rows(v_semi) == want


def test_agg_merge_view_seed_over_empty_source_then_growth(spark, tmp_path):
    """A seed over a table whose snapshot is EMPTY (all rows deleted)
    commits no view manifest; the next sync must re-seed instead of
    reading a manifest-less dir (the r07 join-view None-manifest
    lesson, applied to the merge-backed view)."""
    from customer_segmentation_pyspark_spark.streaming.views import (
        read_agg_merge_view,
        sync_agg_merge_view,
    )

    table = str(tmp_path / "t")
    view = str(tmp_path / "v")
    merge_into_partitioned_snapshot(
        spark, table,
        spark.createDataFrame([(1, "a", 5.0, 0, "U")], SCHEMA),
        "k", "seq", num_partitions=2,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    merge_into_partitioned_snapshot(
        spark, table,
        spark.createDataFrame([(1, "a", None, 1, "D")], SCHEMA),
        "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
    )
    sync_agg_merge_view(
        spark, table, view, "grp", F.col("val"), num_partitions=2
    )  # empty seed: cursor written, nothing committed
    merge_into_partitioned_snapshot(
        spark, table,
        spark.createDataFrame(
            [(2, "b", 3.0, 2, "U"), (3, "b", 4.0, 2, "U")], SCHEMA
        ),
        "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
    )
    sync_agg_merge_view(spark, table, view, "grp", F.col("val"))
    got = {
        r["grp"]: (r["n_rows"], r["total"])
        for r in read_agg_merge_view(spark, view).collect()
    }
    assert got == {"b": (2, 7)}, got


def test_swap_view_seed_over_emptied_source_is_empty_not_crash(
    spark, tmp_path
):
    """Seeding ANY swap-style view over a table whose snapshot is
    currently empty (manifest present, zero part dirs) must produce an
    empty view at that cursor — not raise — and the next sync folds
    growth normally (r08: _snapshot_or_empty applied uniformly to all
    sync drivers' snapshot reads)."""
    from customer_segmentation_pyspark_spark.streaming.views import (
        sync_view_to_snapshot,
    )

    table = str(tmp_path / "t")
    view = str(tmp_path / "v")
    merge_into_partitioned_snapshot(
        spark, table,
        spark.createDataFrame([(1, "a", 5.0, 0, "U")], SCHEMA),
        "k", "seq", num_partitions=2,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    merge_into_partitioned_snapshot(
        spark, table,
        spark.createDataFrame([(1, "a", None, 1, "D")], SCHEMA),
        "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
    )
    assert sync_view_to_snapshot(spark, table, view, "grp", F.col("val")) == 2
    assert spark.read.parquet(view).count() == 0
    merge_into_partitioned_snapshot(
        spark, table,
        spark.createDataFrame([(2, "b", 3.0, 2, "U")], SCHEMA),
        "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
    )
    assert sync_view_to_snapshot(spark, table, view, "grp", F.col("val")) == 3
    got = {
        r["grp"]: (r["n_rows"], r["total"])
        for r in spark.read.parquet(view).collect()
    }
    assert got == {"b": (1, 3)}, got


def test_ivm_cascade_deep_fuzz_all_levels_lag(spark, tmp_path):
    """Depth-3 fuzz: silver (join view), gold (MERGE-backed per-key
    aggregate), and platinum (swap-style distribution over gold's CDF)
    each sync at independent random points — every level lags every
    other arbitrarily and folds multi-version slices on catch-up;
    after the final sync chain, platinum equals the full recompute
    from the two source tables."""
    import random

    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )
    from customer_segmentation_pyspark_spark.streaming.views import (
        sync_agg_merge_view,
        sync_join_view_to_snapshots,
        sync_view_to_snapshot,
    )

    rng = random.Random(11)
    fact_dir = str(tmp_path / "fact")
    dim_dir = str(tmp_path / "dim")
    silver = str(tmp_path / "silver")
    gold = str(tmp_path / "gold")
    plat = str(tmp_path / "plat")

    def fw(rows):
        return spark.createDataFrame(
            rows, "fk long, jk long, amt long, seq long, op string"
        )

    def dw(rows):
        return spark.createDataFrame(
            rows, "jk long, attr string, dseq long, dop string"
        )

    merge_into_partitioned_snapshot(
        spark, fact_dir, fw([(f, f % 5, f, 0, "U") for f in range(30)]),
        key="fk", seq="seq", num_partitions=4,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    merge_into_partitioned_snapshot(
        spark, dim_dir, dw([(j, f"a{j % 2}", 0, "U") for j in range(5)]),
        key="jk", seq="dseq", num_partitions=4,
        delete_when="dop = 'D'", marker_cols=("dop",),
    )

    def s_silver():
        sync_join_view_to_snapshots(
            spark, fact_dir, dim_dir, silver, "jk", num_partitions=4
        )

    def s_gold():
        sync_agg_merge_view(
            spark, silver, gold, "jk",
            F.when(F.col("attr").isNotNull(), F.col("amt")).otherwise(
                F.lit(0)
            ),
            num_partitions=4, n_col="n_facts", sum_col="amt_sum",
        )

    def s_plat():
        sync_view_to_snapshot(
            spark, gold, plat, "n_facts", F.col("amt_sum")
        )

    s_silver(); s_gold(); s_plat()
    seq = 0
    for _ in range(16):
        seq += 1
        roll = rng.random()
        if roll < 0.35:
            rows = [
                (rng.randrange(40), rng.randrange(6),
                 rng.randint(0, 50), seq,
                 "D" if rng.random() < 0.25 else "U")
                for _ in range(rng.randint(1, 5))
            ]
            merge_into_partitioned_snapshot(
                spark, fact_dir, fw(rows), key="fk", seq="seq",
                delete_when="op = 'D'", marker_cols=("op",),
            )
        elif roll < 0.55:
            rows = [
                (rng.randrange(6), f"a{rng.randrange(3)}", seq,
                 "D" if rng.random() < 0.3 else "U")
                for _ in range(rng.randint(1, 2))
            ]
            merge_into_partitioned_snapshot(
                spark, dim_dir, dw(rows), key="jk", seq="dseq",
                delete_when="dop = 'D'", marker_cols=("dop",),
            )
        elif roll < 0.72:
            s_silver()
        elif roll < 0.82:
            s_gold()
        elif roll < 0.92:
            s_plat()
        else:
            # crash-replay injection: rewind gold's cursor one version
            # below its marker (a landed merge whose cursor write was
            # lost) — the __applied witness must make the re-fold a
            # no-op, never a double count
            import os as _os

            from customer_segmentation_pyspark_spark.streaming.views import (
                SRC_VERSION_FILE,
                view_src_version,
            )

            mk = _os.path.join(gold, SRC_VERSION_FILE)
            v = view_src_version(gold)
            if v is not None and v > 1:
                with open(mk, "w") as f:
                    f.write(str(v - 1))
                s_gold()
    s_silver(); s_gold(); s_plat()

    got = {
        (r["n_facts"], r["n_rows"], r["total"])
        for r in spark.read.parquet(plat).collect()
    }
    fact = read_partitioned_snapshot(spark, fact_dir)
    dim = read_partitioned_snapshot(spark, dim_dir)
    gold_rc = (
        fact.join(dim.select("jk", "attr"), "jk", "left")
        .groupBy("jk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_facts"),
            F.sum(
                F.when(F.col("attr").isNotNull(), F.col("amt")).otherwise(0)
            ).cast("long").alias("amt_sum"),
        )
    )
    want = {
        (r["n_facts"], r["n"], r["t"])
        for r in gold_rc.groupBy("n_facts")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("amt_sum").cast("long").alias("t"),
        )
        .collect()
    }
    assert got == want, (got, want)


def test_agg_merge_view_tombstone_fold_replay_after_source_advanced(
    spark, tmp_path
):
    """The hole the r08 heal left (r09, ADVICE): a fold whose merge
    LANDED but produced ONLY tombstones (every touched group emptied)
    leaves no positive row — no __applied stamp. If the cursor write
    is then lost AND the source advances (here: the emptied group
    regains rows) before the retry, folding (stale marker, latest]
    would re-apply the landed deletes on top of the landed state —
    n off by the dead rows, or the regained group wrongly tombstoned.
    The fold's target version is now committed as app_meta inside the
    view manifest itself, so the high-water heal covers this shape."""
    import os as _os

    from customer_segmentation_pyspark_spark.streaming.views import (
        SRC_VERSION_FILE,
        read_agg_merge_view,
        sync_agg_merge_view,
        view_src_version,
    )

    table = str(tmp_path / "t")
    view = str(tmp_path / "v")

    def merge(rows):
        merge_into_partitioned_snapshot(
            spark, table, spark.createDataFrame(rows, SCHEMA),
            "k", "seq", num_partitions=4,
            delete_when="op = 'D'", marker_cols=("op",),
        )

    merge([(1, "a", 10.0, 0, "U"), (2, "a", 4.0, 0, "U"),
           (3, "b", 5.0, 0, "U")])  # v1
    sync_agg_merge_view(
        spark, table, view, "grp", F.col("val"), num_partitions=4
    )
    # v2: delete EVERY row of group 'a' — the fold is pure tombstone
    merge([(1, "a", None, 1, "D"), (2, "a", None, 1, "D")])
    sync_agg_merge_view(spark, table, view, "grp", F.col("val"))
    assert "a" not in {
        r["grp"] for r in read_agg_merge_view(spark, view).collect()
    }
    # crash: the v2 fold landed, cursor write lost
    with open(_os.path.join(view, SRC_VERSION_FILE), "w") as f:
        f.write("1")
    # source advances: 'a' regains a row
    merge([(9, "a", 2.0, 2, "U")])  # v3
    assert (
        sync_agg_merge_view(spark, table, view, "grp", F.col("val")) == 3
    )
    assert view_src_version(view) == 3
    got = {
        r["grp"]: (r["n_rows"], r["total"])
        for r in read_agg_merge_view(spark, view).collect()
    }
    # without the manifest stamp the retry re-applies v2's -2 on top of
    # the landed state: a would come back as n=-1 -> tombstoned (absent)
    assert got == _agg_merge_recompute(spark, table), got
    assert got["a"] == (1, 2)


def test_agg_merge_view_replay_after_source_advanced(spark, tmp_path):
    """The sharpest crash shape: a fold's merge LANDS, its cursor
    write is lost, and the SOURCE advances before the retry — folding
    (marker, latest] would re-apply the crashed slice on top of the
    landed state. The view's __applied high-water mark (manifest
    stats) must heal the cursor so the retry folds only the truly
    unapplied tail."""
    import os as _os

    from customer_segmentation_pyspark_spark.streaming.views import (
        SRC_VERSION_FILE,
        read_agg_merge_view,
        sync_agg_merge_view,
        view_src_version,
    )

    table = str(tmp_path / "t")
    view = str(tmp_path / "v")

    def merge(rows):
        merge_into_partitioned_snapshot(
            spark, table, spark.createDataFrame(rows, SCHEMA),
            "k", "seq", num_partitions=4,
            delete_when="op = 'D'", marker_cols=("op",),
        )

    merge([(1, "a", 10.0, 0, "U"), (2, "b", 5.0, 0, "U")])  # v1
    sync_agg_merge_view(
        spark, table, view, "grp", F.col("val"), num_partitions=4
    )
    merge([(3, "a", 7.0, 1, "U")])  # v2
    sync_agg_merge_view(spark, table, view, "grp", F.col("val"))
    # crash: the v2 fold landed, cursor write lost
    with open(_os.path.join(view, SRC_VERSION_FILE), "w") as f:
        f.write("1")
    merge([(4, "b", 3.0, 2, "U")])  # source advances to v3
    assert (
        sync_agg_merge_view(spark, table, view, "grp", F.col("val")) == 3
    )
    assert view_src_version(view) == 3  # marker healed through
    got = {
        r["grp"]: (r["n_rows"], r["total"])
        for r in read_agg_merge_view(spark, view).collect()
    }
    assert got == _agg_merge_recompute(spark, table), got
