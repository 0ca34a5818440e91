"""MERGE DELETE clause (r05) + merge-on-read path: tombstone semantics
against a Python latest-wins model, partition pruning with deletes, the
MoR overlay's equivalence to copy-on-write on the same change sequence,
fold-back compaction, and the conditional (OCC) manifest commit."""

from __future__ import annotations

import os

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
    compact_mor_partitions,
    merge_into_partitioned_snapshot,
    merge_into_snapshot,
    merge_mor_into_partitioned_snapshot,
    read_partitioned_snapshot,
    read_snapshot_changes,
)

SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("val", DoubleType()),
        StructField("seq", LongType()),
        StructField("op", StringType()),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _model(waves):
    """Sequential latest-wins replay with per-column NULL-keeps-old and
    tombstones — the semantics both merge flavors must produce."""
    state: dict = {}
    for wave in waves:
        latest: dict = {}
        for k, val, seq, op in wave:
            if k not in latest or seq > latest[k][1]:
                latest[k] = (val, seq, op)
        for k, (val, _seq, op) in latest.items():
            if op == "D":
                state.pop(k, None)
            elif val is None and k in state:
                pass  # NULL update keeps the old column value
            else:
                state[k] = val
    return state


def _read_dict(df):
    return {r["k"]: r["val"] for r in df.collect()}


WAVES = [
    # base inserts
    [(k, float(k) * 10, 0, "U") for k in range(1, 21)],
    # updates + deletes + insert-then-delete (k=100) + overlap:
    # k=6 updated at seq 1 then deleted at seq 2 -> net delete
    [
        (5, 55.0, 1, "U"),
        (6, 66.0, 1, "U"),
        (6, None, 2, "D"),
        (7, None, 2, "D"),
        (100, 1000.0, 1, "U"),
        (100, None, 3, "D"),
    ],
    # delete-then-reinsert in one batch (k=7 came back), NULL update
    [
        (7, 77.0, 4, "U"),
        (8, None, 5, "U"),  # NULL val -> keeps 80.0
        (9, None, 5, "D"),
    ],
]


def test_cow_snapshot_delete_semantics(spark, tmp_path):
    snap = str(tmp_path / "snap")
    for wave in WAVES:
        merge_into_snapshot(
            spark,
            snap,
            _df(spark, wave),
            "k",
            "seq",
            delete_when="op = 'D'",
            marker_cols=("op",),
        )
    got = {r["k"]: r["val"] for r in spark.read.parquet(snap).collect()}
    assert got == _model(WAVES)
    assert "op" not in spark.read.parquet(snap).columns


def test_partitioned_delete_semantics_and_idempotent_replay(spark, tmp_path):
    table = str(tmp_path / "t")
    for wave in WAVES:
        merge_into_partitioned_snapshot(
            spark,
            table,
            _df(spark, wave),
            "k",
            "seq",
            num_partitions=4,
            delete_when="op = 'D'",
            marker_cols=("op",),
        )
    assert _read_dict(read_partitioned_snapshot(spark, table)) == _model(WAVES)
    # replaying the last batch (crash-recovery) converges, not diverges
    merge_into_partitioned_snapshot(
        spark,
        table,
        _df(spark, WAVES[-1]),
        "k",
        "seq",
        delete_when="op = 'D'",
        marker_cols=("op",),
    )
    assert _read_dict(read_partitioned_snapshot(spark, table)) == _model(WAVES)


def _pid_of_keys(spark, keys, num_partitions):
    from customer_segmentation_pyspark_spark.streaming.merge import _part_expr

    rows = spark.createDataFrame(
        [(k,) for k in keys], "k long"
    ).select("k", _part_expr("k", num_partitions).alias("p")).collect()
    return {r["k"]: r["p"] for r in rows}


def test_delete_only_batch_prunes_and_drops_empty_partition(spark, tmp_path):
    table = str(tmp_path / "t")
    base = [(k, float(k), 0, "U") for k in range(1, 41)]
    merge_into_partitioned_snapshot(
        spark, table, _df(spark, base), "k", "seq", num_partitions=4,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    man1 = versioned.read_manifest(table)
    pid = _pid_of_keys(spark, range(1, 41), 4)
    victims = [k for k in range(1, 41) if pid[k] == pid[1]]
    merge_into_partitioned_snapshot(
        spark, table,
        _df(spark, [(k, None, 1, "D") for k in victims]),
        "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
    )
    man2 = versioned.read_manifest(table)
    # the emptied partition left the manifest; every other partition's
    # directory is reused byte-identical (same immutable dir name)
    assert str(pid[1]) not in man2["parts"]
    for p, d in man1["parts"].items():
        if p != str(pid[1]):
            assert man2["parts"][p] == d
    got = _read_dict(read_partitioned_snapshot(spark, table))
    assert got == {k: float(k) for k in range(1, 41) if k not in victims}
    # version history intact: v1 still reads the full base
    old = _read_dict(read_partitioned_snapshot(spark, table, version=1))
    assert old == {k: float(k) for k in range(1, 41)}
    # CDF between the versions emits exactly the deletes
    feed = read_snapshot_changes(spark, table, 1, 2)
    by_type: dict = {}
    for r in feed.collect():
        by_type.setdefault(r["_change_type"], set()).add(r["k"])
    assert by_type == {"delete": set(victims)}


def test_mor_equals_cow_on_same_change_sequence(spark, tmp_path):
    cow = str(tmp_path / "cow")
    mor = str(tmp_path / "mor")
    for wave in WAVES:
        df = _df(spark, wave)
        merge_into_partitioned_snapshot(
            spark, cow, df, "k", "seq", num_partitions=4,
            delete_when="op = 'D'", marker_cols=("op",),
        )
        merge_mor_into_partitioned_snapshot(
            spark, mor, df, "k", "seq", num_partitions=4,
            delete_when="op = 'D'", marker_cols=("op",),
        )
        a = _read_dict(read_partitioned_snapshot(spark, cow))
        b = _read_dict(read_partitioned_snapshot(spark, mor))
        assert a == b == _model(WAVES[: WAVES.index(wave) + 1])


def test_mor_append_leaves_base_untouched(spark, tmp_path):
    table = str(tmp_path / "t")
    base = [(k, float(k), 0, "U") for k in range(1, 21)]
    merge_mor_into_partitioned_snapshot(
        spark, table, _df(spark, base), "k", "seq", num_partitions=4,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    compact_mor_partitions(spark, table)  # fold into base dirs
    man1 = versioned.read_manifest(table)
    assert man1["parts"] and not man1.get("deltas")
    wave = [(1, 111.0, 1, "U"), (2, None, 1, "D"), (50, 500.0, 1, "U")]
    merge_mor_into_partitioned_snapshot(
        spark, table, _df(spark, wave), "k", "seq",
        delete_when="op = 'D'", marker_cols=("op",),
    )
    man2 = versioned.read_manifest(table)
    # O(|delta|) write: every base dir reused byte-identical
    assert man2["parts"] == man1["parts"]
    touched = set(_pid_of_keys(spark, [1, 2, 50], 4).values())
    assert set(man2["deltas"]) == {str(p) for p in touched}
    got = _read_dict(read_partitioned_snapshot(spark, table))
    exp = {k: float(k) for k in range(1, 21)}
    exp[1] = 111.0
    del exp[2]
    exp[50] = 500.0
    assert got == exp


def test_mor_compaction_preserves_content_and_history(spark, tmp_path):
    table = str(tmp_path / "t")
    for wave in WAVES:
        merge_mor_into_partitioned_snapshot(
            spark, table, _df(spark, wave), "k", "seq", num_partitions=4,
            delete_when="op = 'D'", marker_cols=("op",),
        )
    v_before = versioned.latest_version(table)
    before = _read_dict(read_partitioned_snapshot(spark, table))
    folded = compact_mor_partitions(spark, table)
    assert folded  # something had a log
    man = versioned.read_manifest(table)
    assert not man.get("deltas")
    assert _read_dict(read_partitioned_snapshot(spark, table)) == before
    # time travel to the pre-compaction version still sees the overlay
    assert (
        _read_dict(read_partitioned_snapshot(spark, table, version=v_before))
        == before
    )
    # second compaction is a no-op
    assert compact_mor_partitions(spark, table) == []


def test_mor_point_lookup_and_stats_prune_safety(spark, tmp_path):
    table = str(tmp_path / "t")
    base = [(k, float(k), 0, "U") for k in range(1, 21)]
    merge_mor_into_partitioned_snapshot(
        spark, table, _df(spark, base), "k", "seq", num_partitions=4,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    compact_mor_partitions(spark, table)
    # delta pushes val=999 — far outside every base dir's [min,max]
    merge_mor_into_partitioned_snapshot(
        spark, table,
        _df(spark, [(3, 999.0, 1, "U"), (4, None, 1, "D")]),
        "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
    )
    got = _read_dict(
        read_partitioned_snapshot(spark, table, key_in=[3, 4, 5, 99])
    )
    assert got == {3: 999.0, 5: 5.0}
    # stats pruning must not skip the delta'd partition
    hot = _read_dict(
        read_partitioned_snapshot(spark, table, where=[("val", ">", 900.0)])
    )
    assert hot == {3: 999.0}


def test_mor_schema_evolution_matches_cow(spark, tmp_path):
    cow, mor = str(tmp_path / "cow"), str(tmp_path / "mor")
    base = _df(spark, [(k, float(k), 0, "U") for k in range(1, 11)])
    evo_schema = StructType(
        SCHEMA.fields + [StructField("extra", StringType())]
    )
    evo = spark.createDataFrame(
        [(2, 22.0, 1, "U", "x"), (30, 300.0, 1, "U", "y"),
         (3, None, 1, "D", None)],
        evo_schema,
    )
    for t, fn in (
        (cow, merge_into_partitioned_snapshot),
        (mor, merge_mor_into_partitioned_snapshot),
    ):
        fn(spark, t, base, "k", "seq", num_partitions=4,
           delete_when="op = 'D'", marker_cols=("op",))
        fn(spark, t, evo, "k", "seq",
           delete_when="op = 'D'", marker_cols=("op",))
    rows = lambda t: {  # noqa: E731
        tuple(r[c] for c in ("k", "val", "extra"))
        for r in read_partitioned_snapshot(spark, t).collect()
    }
    a, b = rows(cow), rows(mor)
    assert a == b
    assert (2, 22.0, "x") in a and (30, 300.0, "y") in a
    assert not any(r[0] == 3 for r in a)
    assert (5, 5.0, None) in a  # untouched rows surface typed NULLs


def test_mor_cdf_equals_cow_cdf(spark, tmp_path):
    cow, mor = str(tmp_path / "cow"), str(tmp_path / "mor")
    for t, fn in (
        (cow, merge_into_partitioned_snapshot),
        (mor, merge_mor_into_partitioned_snapshot),
    ):
        for wave in WAVES[:2]:
            fn(spark, t, _df(spark, wave), "k", "seq", num_partitions=4,
               delete_when="op = 'D'", marker_cols=("op",))
    key = lambda df: {  # noqa: E731
        (r["k"], r["_change_type"], r["val"]) for r in df.collect()
    }
    assert key(read_snapshot_changes(spark, cow, 1, 2)) == key(
        read_snapshot_changes(spark, mor, 1, 2)
    )


def test_commit_manifest_occ_and_pointer_repair(tmp_path):
    t = str(tmp_path / "t")
    v1 = versioned.commit_manifest(t, {"parts": {}, "num_partitions": 1})
    assert v1 == 1
    v2 = versioned.commit_manifest(t, {"parts": {"0": "a"}, "num_partitions": 1})
    assert v2 == 2
    # conditional commit derived from v1 must refuse (v2 intervened)
    # and leave no manifest artifact behind
    n_files = len(os.listdir(t))
    assert (
        versioned.commit_manifest(
            t, {"parts": {}, "num_partitions": 1}, expected_latest=1
        )
        == -1
    )
    assert len(os.listdir(t)) == n_files
    assert versioned.latest_version(t) == 2
    # a regressed pointer (the pre-r05 race debris) is repaired by the
    # next commit's verify loop
    with open(os.path.join(t, "_LATEST"), "w") as f:
        f.write("1")
    v3 = versioned.commit_manifest(t, {"parts": {}, "num_partitions": 1})
    assert v3 == 3 and versioned.latest_version(t) == 3
    # a pointer referencing a withdrawn/missing manifest falls back to
    # the highest committed manifest on read
    with open(os.path.join(t, "_LATEST"), "w") as f:
        f.write("9")
    assert versioned.read_manifest(t) == {"parts": {}, "num_partitions": 1}


def test_commit_rewrites_revalidates_against_intervening_commit(
    spark, tmp_path
):
    """A foreign manifest landing between a maintenance read and its
    commit must not be reverted: the conditional commit retries and the
    intervening state survives for non-conflicted fields."""
    from customer_segmentation_pyspark_spark.streaming.merge import (
        _commit_rewrites,
    )

    table = str(tmp_path / "t")
    base = [(k, float(k), 0, "U") for k in range(1, 9)]
    merge_into_partitioned_snapshot(
        spark, table, _df(spark, base), "k", "seq", num_partitions=2,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    man = versioned.read_manifest(table)
    pids = sorted(man["parts"])
    # stage a legitimate rewrite of pid[0]
    src = man["parts"][pids[0]]
    dest = "p-rewrite000001"
    df = spark.read.parquet(os.path.join(table, src))
    df.coalesce(1).write.parquet(os.path.join(table, dest))
    # foreign commit intervenes: merge updates pid[1]'s partition
    pid_by_key = _pid_of_keys(spark, range(1, 9), 2)
    foreign_key = next(k for k in range(1, 9) if pid_by_key[k] != int(pids[0]))
    merge_into_partitioned_snapshot(
        spark, table, _df(spark, [(foreign_key, 777.0, 1, "U")]),
        "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
    )
    landed = _commit_rewrites(table, {pids[0]: (src, dest)})
    assert landed == [pids[0]]
    final = versioned.read_manifest(table)
    assert final["parts"][pids[0]] == dest
    # the foreign merge's data survived the maintenance commit
    got = _read_dict(read_partitioned_snapshot(spark, table))
    assert got[foreign_key] == 777.0


def _inject_foreign_commit_once(monkeypatch, table, foreign_fn):
    """Wrap versioned.commit_manifest so the FIRST conditional commit
    finds a foreign commit landed in its read->commit window."""
    real = versioned.commit_manifest
    state = {"armed": True}

    def wrapped(table_dir, manifest, expected_latest=None):
        if state["armed"] and expected_latest is not None:
            state["armed"] = False
            foreign_fn()  # lands between the caller's read and commit
        return real(table_dir, manifest, expected_latest)

    monkeypatch.setattr(versioned, "commit_manifest", wrapped)


def test_merge_occ_rebases_onto_disjoint_foreign_commit(
    spark, tmp_path, monkeypatch
):
    table = str(tmp_path / "t")
    base = [(k, float(k), 0, "U") for k in range(1, 9)]
    merge_into_partitioned_snapshot(
        spark, table, _df(spark, base), "k", "seq", num_partitions=2,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    pid_by_key = _pid_of_keys(spark, range(1, 9), 2)
    k_a = next(k for k in range(1, 9) if pid_by_key[k] == 0)
    k_b = next(k for k in range(1, 9) if pid_by_key[k] == 1)

    def foreign():
        merge_into_partitioned_snapshot(
            spark, table, _df(spark, [(k_b, 888.0, 1, "U")]),
            "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
        )

    _inject_foreign_commit_once(monkeypatch, table, foreign)
    merge_into_partitioned_snapshot(
        spark, table, _df(spark, [(k_a, 111.0, 1, "U")]),
        "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
    )
    got = _read_dict(read_partitioned_snapshot(spark, table))
    # BOTH merges survive: disjoint partitions rebase, nothing reverted
    assert got[k_a] == 111.0 and got[k_b] == 888.0


def test_merge_occ_raises_on_same_partition_conflict(
    spark, tmp_path, monkeypatch
):
    import pytest

    from customer_segmentation_pyspark_spark.streaming.merge import (
        ConcurrentMergeError,
    )

    table = str(tmp_path / "t")
    base = [(k, float(k), 0, "U") for k in range(1, 9)]
    merge_into_partitioned_snapshot(
        spark, table, _df(spark, base), "k", "seq", num_partitions=2,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    pid_by_key = _pid_of_keys(spark, range(1, 9), 2)
    k_a = next(k for k in range(1, 9) if pid_by_key[k] == 0)
    k_a2 = next(k for k in range(1, 9) if pid_by_key[k] == 0 and k != k_a)

    def foreign():
        merge_into_partitioned_snapshot(
            spark, table, _df(spark, [(k_a2, 999.0, 1, "U")]),
            "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
        )

    _inject_foreign_commit_once(monkeypatch, table, foreign)
    with pytest.raises(ConcurrentMergeError):
        merge_into_partitioned_snapshot(
            spark, table, _df(spark, [(k_a, 111.0, 1, "U")]),
            "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
        )
    # the foreign merge's commit is intact; re-running the loser works
    got = _read_dict(read_partitioned_snapshot(spark, table))
    assert got[k_a2] == 999.0
    merge_into_partitioned_snapshot(
        spark, table, _df(spark, [(k_a, 111.0, 1, "U")]),
        "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
    )
    got = _read_dict(read_partitioned_snapshot(spark, table))
    assert got[k_a] == 111.0 and got[k_a2] == 999.0


def test_mor_occ_appends_compose_under_conflict(
    spark, tmp_path, monkeypatch
):
    """Two MoR appends racing on the SAME partition both land — commit
    order defines log order, no exception, no lost update."""
    table = str(tmp_path / "t")
    base = [(k, float(k), 0, "U") for k in range(1, 9)]
    merge_mor_into_partitioned_snapshot(
        spark, table, _df(spark, base), "k", "seq", num_partitions=2,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    pid_by_key = _pid_of_keys(spark, range(1, 9), 2)
    k_a = next(k for k in range(1, 9) if pid_by_key[k] == 0)
    k_a2 = next(k for k in range(1, 9) if pid_by_key[k] == 0 and k != k_a)

    def foreign():
        merge_mor_into_partitioned_snapshot(
            spark, table, _df(spark, [(k_a2, 999.0, 1, "U")]),
            "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
        )

    _inject_foreign_commit_once(monkeypatch, table, foreign)
    merge_mor_into_partitioned_snapshot(
        spark, table, _df(spark, [(k_a, 111.0, 1, "U")]),
        "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
    )
    got = _read_dict(read_partitioned_snapshot(spark, table))
    assert got[k_a] == 111.0 and got[k_a2] == 999.0


def test_mor_fold_drops_partition_emptied_by_log(spark, tmp_path):
    """A delta log that tombstones every row of a partition folds to
    'partition leaves the manifest' — not to an empty dir entry, and
    never resurrects the rows."""
    table = str(tmp_path / "t")
    base = [(k, float(k), 0, "U") for k in range(1, 41)]
    merge_mor_into_partitioned_snapshot(
        spark, table, _df(spark, base), "k", "seq", num_partitions=4,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    compact_mor_partitions(spark, table)
    pid = _pid_of_keys(spark, range(1, 41), 4)
    victims = [k for k in range(1, 41) if pid[k] == pid[1]]
    merge_mor_into_partitioned_snapshot(
        spark, table, _df(spark, [(k, None, 1, "D") for k in victims]),
        "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
    )
    folded = compact_mor_partitions(spark, table)
    assert folded == [str(pid[1])]
    man = versioned.read_manifest(table)
    assert str(pid[1]) not in man["parts"] and not man.get("deltas")
    got = _read_dict(read_partitioned_snapshot(spark, table))
    assert got == {k: float(k) for k in range(1, 41) if k not in victims}


def test_streaming_mor_upsert_equals_batch(spark, tmp_path):
    """A change stream through the MoR foreachBatch sink equals the
    batch model — including tombstones — and replaying from a fresh
    checkpoint converges (exactly-once in effect)."""
    from customer_segmentation_pyspark_spark.streaming.merge import (
        streaming_mor_upsert,
    )

    src = str(tmp_path / "changes")
    table = str(tmp_path / "t")
    wave1 = [(k, float(k) * 10, 0, "U") for k in range(1, 11)]
    wave2 = [(3, 33.0, 1, "U"), (4, None, 1, "D"), (20, 200.0, 1, "U")]
    spark.createDataFrame(wave1, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = spark.readStream.schema(SCHEMA).format("parquet").load(src)
    streaming_mor_upsert(
        spark, q, table, str(tmp_path / "ck1"), "k", "seq",
        num_partitions=4, delete_when="op = 'D'", marker_cols=("op",),
    ).awaitTermination(120)
    spark.createDataFrame(wave2, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q2 = spark.readStream.schema(SCHEMA).format("parquet").load(src)
    streaming_mor_upsert(
        spark, q2, table, str(tmp_path / "ck1"), "k", "seq",
        delete_when="op = 'D'", marker_cols=("op",),
    ).awaitTermination(120)
    assert _read_dict(read_partitioned_snapshot(spark, table)) == _model(
        [wave1, wave2]
    )
    # replay everything on a FRESH checkpoint: re-appended logs change
    # nothing at read time
    q3 = spark.readStream.schema(SCHEMA).format("parquet").load(src)
    streaming_mor_upsert(
        spark, q3, table, str(tmp_path / "ck2"), "k", "seq",
        delete_when="op = 'D'", marker_cols=("op",),
    ).awaitTermination(120)
    assert _read_dict(read_partitioned_snapshot(spark, table)) == _model(
        [wave1, wave2]
    )


def test_expire_versions_collects_mor_delta_dirs(spark, tmp_path):
    """Retention on a MoR table: expiring pre-fold manifests makes the
    folded-away d-* log dirs unreferenced and GC collects them; the
    latest (compacted) version keeps reading."""
    import os

    table = str(tmp_path / "t")
    base = [(k, float(k), 0, "U") for k in range(1, 21)]
    merge_mor_into_partitioned_snapshot(
        spark, table, _df(spark, base), "k", "seq", num_partitions=4,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    merge_mor_into_partitioned_snapshot(
        spark, table, _df(spark, [(1, 11.0, 1, "U")]), "k", "seq",
        delete_when="op = 'D'", marker_cols=("op",),
    )
    compact_mor_partitions(spark, table)
    before = _read_dict(read_partitioned_snapshot(spark, table))
    n_delta_dirs = sum(
        1 for e in os.listdir(table) if e.startswith("d-")
    )
    assert n_delta_dirs > 0
    expired = versioned.expire_versions(table, keep_last=1, grace_sec=0)
    assert expired
    assert not any(e.startswith("d-") for e in os.listdir(table))
    assert _read_dict(read_partitioned_snapshot(spark, table)) == before


def test_sync_merge_unmatched_source_delete(spark, tmp_path):
    """WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE on the CoW
    snapshot: unmatched keys sweep, the condition (over the SNAPSHOT
    row, NULL keeps) carves out survivors, matched keys update, and
    tombstones still apply in the same batch."""
    snap = str(tmp_path / "snap")
    schema2 = StructType(
        [
            StructField("k", LongType()),
            StructField("val", DoubleType()),
            StructField("grp", StringType()),
            StructField("seq", LongType()),
            StructField("op", StringType()),
        ]
    )
    base = [(k, float(k), "keep" if k % 4 == 0 else "sweep", 0, "U")
            for k in range(1, 13)]
    merge_into_snapshot(
        spark, snap, spark.createDataFrame(base, schema2), "k", "seq"
    )
    # batch: update k=1, tombstone k=2; everything else unmatched
    batch = [(1, 111.0, "sweep", 1, "U"), (2, None, "sweep", 1, "D")]
    merge_into_snapshot(
        spark, snap, spark.createDataFrame(batch, schema2), "k", "seq",
        delete_when="op = 'D'", marker_cols=("op",),
        unmatched_source_delete="grp = 'sweep'",
    )
    got = {r["k"]: r["val"] for r in spark.read.parquet(snap).collect()}
    # survivors: updated k=1, and unmatched keep-group keys (k%4==0)
    assert got == {1: 111.0, **{k: float(k) for k in (4, 8, 12)}}
    # unconditional sweep (True): only batch keys survive
    merge_into_snapshot(
        spark, snap, spark.createDataFrame(batch, schema2), "k", "seq",
        delete_when="op = 'D'", marker_cols=("op",),
        unmatched_source_delete=True,
    )
    got = {r["k"]: r["val"] for r in spark.read.parquet(snap).collect()}
    assert got == {1: 111.0}


def test_mor_overlay_read_is_single_exchange(spark, tmp_path):
    """The overlay read's scale shape: base+log merge for ALL unfolded
    partitions plans exactly ONE hash Exchange on the key (two window
    passes share it) — the per-read cost at 100 TB is one key-shuffle
    over the unfolded partitions, nothing quadratic, no extra
    shuffles from stacking deltas."""
    import re

    table = str(tmp_path / "t")
    for wave in WAVES:
        merge_mor_into_partitioned_snapshot(
            spark, table, _df(spark, wave), "k", "seq", num_partitions=4,
            delete_when="op = 'D'", marker_cols=("op",),
        )
    plan = (
        read_partitioned_snapshot(spark, table)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_exchange = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exchange == 1, plan


def test_table_history_and_timestamp_travel(spark, tmp_path):
    """DESCRIBE HISTORY surface + TIMESTAMP AS OF: operations and row
    counts line up per version, and version_as_of resolves the commit
    timeline (monotonic within one table)."""
    import time

    table = str(tmp_path / "t")
    merge_into_partitioned_snapshot(
        spark, table,
        _df(spark, [(k, float(k), 0, "U") for k in range(1, 11)]),
        "k", "seq", num_partitions=4,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    t_after_v1 = time.time()
    merge_mor_into_partitioned_snapshot(
        spark, table, _df(spark, [(1, 11.0, 1, "U"), (2, None, 1, "D")]),
        "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
    )
    compact_mor_partitions(spark, table)
    hist = versioned.table_history(table)
    assert [h["version"] for h in hist] == [1, 2, 3]
    assert [h["operation"] for h in hist] == ["merge", "mor-append", "mor-fold"]
    # metadata-only counts: v1 exact, v2 None (pending log), v3 exact
    assert hist[0]["n_rows"] == 10
    assert hist[1]["n_rows"] is None
    assert hist[2]["n_rows"] == 9  # one delete (k=2), one update
    assert versioned.snapshot_row_count(table) == 9
    assert hist[2]["n_logged_partitions"] == 0 < hist[1]["n_logged_partitions"]
    # timestamp travel: just after v1's commit resolves to v1
    assert versioned.version_as_of(table, t_after_v1) == 1
    assert versioned.version_as_of(table, time.time()) == 3
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        versioned.version_as_of(table, t_after_v1 - 3600)


def test_row_counts_follow_deletes_and_rewrites(spark, tmp_path):
    """The rows entries stay exact through deletes, emptied partitions,
    and maintenance rewrites — the invariants behind metadata COUNT."""
    from customer_segmentation_pyspark_spark.streaming.merge import (
        compact_partitioned_snapshot,
    )

    table = str(tmp_path / "t")
    merge_into_partitioned_snapshot(
        spark, table,
        _df(spark, [(k, float(k), 0, "U") for k in range(1, 41)]),
        "k", "seq", num_partitions=4,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    assert versioned.snapshot_row_count(table) == 40
    pid = _pid_of_keys(spark, range(1, 41), 4)
    victims = [k for k in range(1, 41) if pid[k] == pid[1]]
    merge_into_partitioned_snapshot(
        spark, table, _df(spark, [(k, None, 1, "D") for k in victims]),
        "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
    )
    assert versioned.snapshot_row_count(table) == 40 - len(victims)
    compact_partitioned_snapshot(spark, table, target_files=1)
    assert versioned.snapshot_row_count(table) == 40 - len(victims)


def test_repartition_snapshot_evolution(spark, tmp_path):
    """Partition evolution: 4 -> 8 hash partitions preserves content,
    point-lookup pruning works on both layouts (partition id always
    recomputed from the manifest's own modulus), later merges use the
    new unit, and history keeps the old layout readable."""
    from customer_segmentation_pyspark_spark.streaming.merge import (
        repartition_snapshot,
    )

    table = str(tmp_path / "t")
    for wave in WAVES:
        merge_mor_into_partitioned_snapshot(
            spark, table, _df(spark, wave), "k", "seq", num_partitions=4,
            delete_when="op = 'D'", marker_cols=("op",),
        )
    before = _read_dict(read_partitioned_snapshot(spark, table))
    v_old = versioned.latest_version(table)
    repartition_snapshot(spark, table, 8)
    man = versioned.read_manifest(table)
    assert man["num_partitions"] == 8 and not man.get("deltas")
    assert man["operation"] == "repartition"
    assert _read_dict(read_partitioned_snapshot(spark, table)) == before
    assert versioned.snapshot_row_count(table) == len(before)
    # point lookup prunes with the NEW modulus and still finds keys
    some = sorted(before)[:3]
    got = _read_dict(read_partitioned_snapshot(spark, table, key_in=some))
    assert got == {k: before[k] for k in some}
    # the old layout is intact behind time travel
    assert (
        _read_dict(read_partitioned_snapshot(spark, table, version=v_old))
        == before
    )
    # merges after evolution use the new partition count transparently
    merge_into_partitioned_snapshot(
        spark, table, _df(spark, [(500, 5.0, 9, "U")]), "k", "seq",
        delete_when="op = 'D'", marker_cols=("op",),
    )
    after = _read_dict(read_partitioned_snapshot(spark, table))
    assert after == {**before, 500: 5.0}


def test_delta_stats_prune_logged_partitions(spark, tmp_path):
    """Per-delta-dir footer stats restore where-pruning on logged
    partitions: a predicate disjoint from base AND every delta dir
    prunes the partition; one matching delta dir keeps it; the result
    is identical either way (pruning is never load-bearing)."""
    from customer_segmentation_pyspark_spark.streaming.merge import (
        _snapshot_read_plan,
    )

    table = str(tmp_path / "t")
    base = [(k, float(k), 0, "U") for k in range(1, 41)]  # val <= 40
    merge_mor_into_partitioned_snapshot(
        spark, table, _df(spark, base), "k", "seq", num_partitions=4,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    compact_mor_partitions(spark, table)
    # append a small delta (val <= 50) to ONE partition
    merge_mor_into_partitioned_snapshot(
        spark, table, _df(spark, [(3, 50.0, 1, "U")]), "k", "seq",
        delete_when="op = 'D'", marker_cols=("op",),
    )
    man = versioned.read_manifest(table)
    assert man.get("delta_stats")
    # predicate above every dir's max: all partitions pruned, even the
    # logged one — the pre-delta-stats code had to keep it
    _, pids, _ = _snapshot_read_plan(
        spark, table, None, [("val", ">", 900.0)], None
    )
    assert pids == []
    assert (
        read_partitioned_snapshot(spark, table, where=[("val", ">", 900.0)])
        .count()
        == 0
    )
    # a delta actually containing a hot value keeps its partition
    merge_mor_into_partitioned_snapshot(
        spark, table, _df(spark, [(5, 999.0, 2, "U")]), "k", "seq",
        delete_when="op = 'D'", marker_cols=("op",),
    )
    _, pids, _ = _snapshot_read_plan(
        spark, table, None, [("val", ">", 900.0)], None
    )
    assert len(pids) == 1
    got = _read_dict(
        read_partitioned_snapshot(spark, table, where=[("val", ">", 900.0)])
    )
    assert got == {5: 999.0}


INT_SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("val", __import__("pyspark.sql.types", fromlist=["IntegerType"]).IntegerType()),
        StructField("seq", LongType()),
        StructField("op", StringType()),
    ]
)
LONG_SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("val", LongType()),
        StructField("seq", LongType()),
        StructField("op", StringType()),
    ]
)


def test_type_widening_int_to_long(spark, tmp_path):
    """A batch that widens a non-key column int->long merges cleanly on
    both flavors: the manifest schema records the wide type, untouched
    narrow files up-cast at read (explicit-schema read, not
    mergeSchema), and values past 2^31 round-trip."""
    big = 2**40
    for flavor, fn in (
        ("cow", merge_into_partitioned_snapshot),
        ("mor", merge_mor_into_partitioned_snapshot),
    ):
        table = str(tmp_path / flavor)
        fn(
            spark, table,
            spark.createDataFrame(
                [(k, k * 10, 0, "U") for k in range(1, 9)], INT_SCHEMA
            ),
            "k", "seq", num_partitions=4,
            delete_when="op = 'D'", marker_cols=("op",),
        )
        fn(
            spark, table,
            spark.createDataFrame([(1, big, 1, "U")], LONG_SCHEMA),
            "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
        )
        df = read_partitioned_snapshot(spark, table)
        assert df.schema["val"].dataType.typeName() == "long", flavor
        got = {r["k"]: r["val"] for r in df.collect()}
        assert got == {**{k: k * 10 for k in range(2, 9)}, 1: big}, flavor
        # point lookup on an untouched (still-narrow) partition works
        assert _read_dict is not None
        one = read_partitioned_snapshot(spark, table, key_in=[5]).collect()
        assert [(r["k"], r["val"]) for r in one] == [(5, 50)], flavor


def test_key_type_change_refused(spark, tmp_path):
    """Retyping the MERGE KEY must refuse loudly: xxhash64 is
    type-sensitive, so a widened key would silently re-route existing
    keys to other partitions."""
    import pytest
    from pyspark.sql.types import IntegerType

    int_key = StructType(
        [
            StructField("k", IntegerType()),
            StructField("val", DoubleType()),
            StructField("seq", LongType()),
            StructField("op", StringType()),
        ]
    )
    table = str(tmp_path / "t")
    merge_into_partitioned_snapshot(
        spark, table,
        spark.createDataFrame([(1, 1.0, 0, "U"), (2, 2.0, 0, "U")], int_key),
        "k", "seq", num_partitions=4,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    with pytest.raises(ValueError, match="type-sensitive"):
        merge_into_partitioned_snapshot(
            spark, table, _df(spark, [(1, 9.0, 1, "U")]),  # k is long here
            "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
        )
    with pytest.raises(ValueError, match="type-sensitive"):
        merge_mor_into_partitioned_snapshot(
            spark, table, _df(spark, [(1, 9.0, 1, "U")]),
            "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
        )


def test_cdf_fast_append_path_equals_generic(spark, tmp_path):
    """The append-only CDF fast path must emit exactly the generic
    diff's rows across stacked appends, tombstones, NULL-keeps-old
    updates, and a schema-evolving append — and must disengage (fall
    back) across a fold."""
    from customer_segmentation_pyspark_spark.streaming.merge import (
        read_snapshot_changes as cdf,
    )

    table = str(tmp_path / "t")
    merge_mor_into_partitioned_snapshot(
        spark, table,
        _df(spark, [(k, float(k), 0, "U") for k in range(1, 21)]),
        "k", "seq", num_partitions=4,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    # two stacked appends: update, delete, NULL update, re-insert
    merge_mor_into_partitioned_snapshot(
        spark, table,
        _df(spark, [(1, 11.0, 1, "U"), (2, None, 1, "D"), (3, None, 1, "U")]),
        "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
    )
    merge_mor_into_partitioned_snapshot(
        spark, table,
        _df(spark, [(2, 222.0, 2, "U"), (1, None, 2, "D"), (50, 5.0, 2, "U")]),
        "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
    )
    rows = lambda df: sorted(  # noqa: E731
        (r["k"], r["_change_type"], r["val"]) for r in df.collect()
    )
    for a, b in [(1, 2), (2, 3), (1, 3)]:
        fast = rows(cdf(spark, table, a, b))
        slow = rows(cdf(spark, table, a, b, fast_append=False))
        assert fast == slow, (a, b, fast, slow)
    # sanity on content of the stacked 1->3 diff
    d13 = dict(
        ((k, t), v) for k, t, v in rows(cdf(spark, table, 1, 3))
    )
    assert (1, "delete") in d13 and (50, "insert") in d13
    assert d13[(2, "update_postimage")] == 222.0
    # the NULL update kept val=3.0 (seq changed, so pre/post emit with
    # the same val on both sides)
    assert d13[(3, "update_preimage")] == 3.0
    assert d13[(3, "update_postimage")] == 3.0
    # a fold breaks the append-only shape: fast path must disengage
    v_before = versioned.latest_version(table)
    compact_mor_partitions(spark, table)
    folded = cdf(spark, table, v_before, None)
    assert folded.count() == 0  # fold is content-preserving
    assert rows(cdf(spark, table, 1, None)) == rows(
        cdf(spark, table, 1, None, fast_append=False)
    )


def test_merge_occ_raises_on_concurrent_repartition(
    spark, tmp_path, monkeypatch
):
    """A foreign repartition in the read->commit window must abort the
    rebase (r06, ADVICE): the loser's staged dirs were bucketed with
    the OLD modulus, so composing them would mis-route keys."""
    import pytest

    from customer_segmentation_pyspark_spark.streaming.merge import (
        ConcurrentMergeError,
        repartition_snapshot,
    )

    table = str(tmp_path / "t")
    base = [(k, float(k), 0, "U") for k in range(1, 9)]
    merge_into_partitioned_snapshot(
        spark, table, _df(spark, base), "k", "seq", num_partitions=2,
        delete_when="op = 'D'", marker_cols=("op",),
    )

    def foreign():
        repartition_snapshot(spark, table, 5)

    _inject_foreign_commit_once(monkeypatch, table, foreign)
    with pytest.raises(ConcurrentMergeError):
        # key 100 lands in a partition absent from BOTH manifests, so
        # the per-pid conflict check alone would have let it compose
        merge_into_partitioned_snapshot(
            spark, table, _df(spark, [(100, 1.0, 1, "U")]),
            "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
        )
    # re-running against the repartitioned snapshot works and routes
    # the key with the NEW modulus
    merge_into_partitioned_snapshot(
        spark, table, _df(spark, [(100, 1.0, 1, "U")]),
        "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
    )
    got = _read_dict(read_partitioned_snapshot(spark, table))
    assert got[100] == 1.0 and len(got) == 9
    lookup = _read_dict(
        read_partitioned_snapshot(spark, table, key_in=[100])
    )
    assert lookup == {100: 1.0}  # pruned point-read sees the new key


def test_mor_occ_raises_on_concurrent_repartition(
    spark, tmp_path, monkeypatch
):
    """Same hole on the MoR append path: delta dirs keyed by old-modulus
    pids must not be committed over a repartitioned manifest."""
    import pytest

    from customer_segmentation_pyspark_spark.streaming.merge import (
        ConcurrentMergeError,
        repartition_snapshot,
    )

    table = str(tmp_path / "t")
    base = [(k, float(k), 0, "U") for k in range(1, 9)]
    merge_into_partitioned_snapshot(
        spark, table, _df(spark, base), "k", "seq", num_partitions=2,
        delete_when="op = 'D'", marker_cols=("op",),
    )

    def foreign():
        repartition_snapshot(spark, table, 5)

    _inject_foreign_commit_once(monkeypatch, table, foreign)
    with pytest.raises(ConcurrentMergeError):
        merge_mor_into_partitioned_snapshot(
            spark, table, _df(spark, [(100, 1.0, 1, "U")]),
            "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
        )
    merge_mor_into_partitioned_snapshot(
        spark, table, _df(spark, [(100, 1.0, 1, "U")]),
        "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
    )
    got = _read_dict(read_partitioned_snapshot(spark, table))
    assert got[100] == 1.0 and len(got) == 9


def test_merge_occ_raises_on_concurrent_restore(
    spark, tmp_path, monkeypatch
):
    """A foreign RESTORE rewrites the snapshot wholesale with the same
    modulus; a merge creating a partition absent from both manifests
    must still abort instead of composing over the restored state."""
    import pytest

    from customer_segmentation_pyspark_spark.sources.versioned import (
        restore_snapshot,
    )
    from customer_segmentation_pyspark_spark.streaming.merge import (
        ConcurrentMergeError,
    )

    table = str(tmp_path / "t")
    merge_into_partitioned_snapshot(
        spark, table, _df(spark, [(1, 1.0, 0, "U")]), "k", "seq",
        num_partitions=2, delete_when="op = 'D'", marker_cols=("op",),
    )
    merge_into_partitioned_snapshot(
        spark, table, _df(spark, [(1, 2.0, 1, "U")]), "k", "seq",
        delete_when="op = 'D'", marker_cols=("op",),
    )

    def foreign():
        restore_snapshot(table, 1)

    pid1 = _pid_of_keys(spark, [1], 2)[1]
    new_key = next(
        k for k in range(2, 50) if _pid_of_keys(spark, [k], 2)[k] != pid1
    )
    _inject_foreign_commit_once(monkeypatch, table, foreign)
    with pytest.raises(ConcurrentMergeError):
        merge_into_partitioned_snapshot(
            spark, table, _df(spark, [(new_key, 9.0, 2, "U")]),
            "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
        )
    # restore won; rerun composes cleanly on top of it
    merge_into_partitioned_snapshot(
        spark, table, _df(spark, [(new_key, 9.0, 2, "U")]),
        "k", "seq", delete_when="op = 'D'", marker_cols=("op",),
    )
    got = _read_dict(read_partitioned_snapshot(spark, table))
    assert got == {1: 1.0, new_key: 9.0}


def test_mor_auto_compact_bounds_log_length(spark, tmp_path):
    """r07: auto_compact_logs=N keeps every partition's delta log at
    <= N entries after each merge without operator action — partitions
    under the threshold keep their cheap append cadence (logs are NOT
    always folded to zero) — and the overlay content stays exact."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_mor_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )

    d = str(tmp_path / "t")
    expected = {}
    saw_nonzero_log = False
    for wave in range(6):
        rows = [(k, f"v{wave}-{k}", wave) for k in range(wave % 3, 12, 3)]
        for k, v, s in rows:
            expected[k] = v
        merge_mor_into_partitioned_snapshot(
            spark,
            d,
            spark.createDataFrame(rows, "k long, val string, seq long"),
            key="k",
            seq="seq",
            num_partitions=4,
            auto_compact_logs=2,
        )
        man = versioned.read_manifest(d)
        logs = {p: len(v) for p, v in man.get("deltas", {}).items() if v}
        assert all(n <= 2 for n in logs.values()), logs
        saw_nonzero_log = saw_nonzero_log or bool(logs)
        got = {
            r["k"]: r["val"]
            for r in read_partitioned_snapshot(spark, d).collect()
        }
        assert got == expected
    assert saw_nonzero_log  # the policy is a threshold, not fold-always
