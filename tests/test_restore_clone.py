"""RESTORE (rollback-as-new-commit) and shallow CLONE for versioned
tables: metadata-only rollback, forward-moving history, zero-copy clones
that diverge copy-on-write at partition granularity, and the CDF across
a restore."""

from __future__ import annotations

import os

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

SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("val", DoubleType()),
        StructField("seq", LongType()),
        StructField("op", StringType()),
    ]
)


def _merge(spark, table, rows, **kw):
    kw.setdefault("num_partitions", 4)
    merge_into_partitioned_snapshot(
        spark,
        table,
        spark.createDataFrame(rows, SCHEMA),
        "k",
        "seq",
        delete_when="op = 'D'",
        marker_cols=("op",),
        **kw,
    )


def _state(spark, table, version=None):
    df = read_partitioned_snapshot(spark, table, version=version)
    return {r["k"]: r["val"] for r in df.collect()}


def _local_parts(table):
    return {e for e in os.listdir(table) if e.startswith(("p-", "d-"))}


def test_restore_rolls_back_and_keeps_history(spark, tmp_path):
    table = str(tmp_path / "t")
    _merge(spark, table, [(1, 1.0, 0, "U"), (2, 2.0, 0, "U")])
    v1_state = _state(spark, table)
    v1 = versioned.latest_version(table)
    _merge(spark, table, [(2, 20.0, 1, "U"), (3, 3.0, 1, "U")])
    _merge(spark, table, [(1, None, 2, "D"), (4, 4.0, 2, "U")])
    v3 = versioned.latest_version(table)
    bad_state = _state(spark, table)

    rv = versioned.restore_snapshot(table, v1)
    assert rv > v3, "restore must move history FORWARD"
    assert _state(spark, table) == v1_state
    # the rolled-back-over versions stay readable for audit
    assert _state(spark, table, version=v3) == bad_state
    hist = versioned.table_history(table)
    assert hist[-1]["version"] == rv
    assert hist[-1]["operation"] == f"restore(v{v1})"
    # metadata-only: the restored manifest references v1's dirs verbatim
    assert versioned.read_manifest(table, rv)["parts"] == (
        versioned.read_manifest(table, v1)["parts"]
    )


def test_restore_then_merge_continues_forward(spark, tmp_path):
    table = str(tmp_path / "t")
    _merge(spark, table, [(1, 1.0, 0, "U")])
    v1 = versioned.latest_version(table)
    _merge(spark, table, [(1, 99.0, 1, "U")])
    versioned.restore_snapshot(table, v1)
    _merge(spark, table, [(2, 2.0, 2, "U")])
    assert _state(spark, table) == {1: 1.0, 2: 2.0}


def test_restore_vdir_table_hardlinks(spark, tmp_path):
    table = str(tmp_path / "plain")
    versioned.write_version(spark.range(5).toDF("id"), table)
    versioned.write_version(spark.range(9).toDF("id"), table)
    rv = versioned.restore_snapshot(table, 1)
    assert rv == 3
    assert versioned.read_table(spark, table).count() == 5
    # hard-linked, not copied: every restored parquet shares its inode
    v1_dir, v3_dir = (os.path.join(table, v) for v in ("v1", "v3"))
    for f in os.listdir(v1_dir):
        if f.endswith(".parquet"):
            assert os.path.samefile(
                os.path.join(v1_dir, f), os.path.join(v3_dir, f)
            )


def test_cdf_replays_across_restore(spark, tmp_path):
    table = str(tmp_path / "t")
    _merge(spark, table, [(1, 1.0, 0, "U"), (2, 2.0, 0, "U")])
    v1 = versioned.latest_version(table)
    _merge(spark, table, [(2, 20.0, 1, "U"), (3, 3.0, 1, "U")])
    v2 = versioned.latest_version(table)
    pre = _state(spark, table)
    rv = versioned.restore_snapshot(table, v1)
    replayed = dict(pre)
    for r in read_snapshot_changes(spark, table, v2, rv).collect():
        d = r.asDict()
        if d["_change_type"] == "delete":
            replayed.pop(d["k"], None)
        elif d["_change_type"] in ("insert", "update_postimage"):
            replayed[d["k"]] = d["val"]
    assert replayed == _state(spark, table)


def test_clone_zero_copy_then_cow_divergence(spark, tmp_path):
    src = str(tmp_path / "src")
    _merge(spark, src, [(k, float(k), 0, "U") for k in range(1, 9)])
    dst = str(tmp_path / "dst")
    versioned.clone_snapshot(src, dst)

    # zero-copy: the clone holds no data dirs of its own ...
    assert _local_parts(dst) == set()
    # ... yet reads the full source state
    assert _state(spark, dst) == _state(spark, src)
    assert versioned.table_history(dst)[-1]["operation"].startswith("clone(")

    # writes to the clone localize ONLY the touched partitions
    _merge(spark, dst, [(1, 100.0, 1, "U")])
    assert 0 < len(_local_parts(dst)) < 4
    assert _state(spark, dst)[1] == 100.0
    assert _state(spark, src)[1] == 1.0, "source must not see clone writes"

    # writes to the source do not leak into the clone (snapshot isolation)
    _merge(spark, src, [(2, 200.0, 1, "U")])
    assert _state(spark, dst)[2] == 2.0
    # count stays a metadata op through the foreign refs
    assert versioned.snapshot_row_count(dst) == 8


def test_clone_of_clone_resolves(spark, tmp_path):
    src = str(tmp_path / "a")
    _merge(spark, src, [(1, 1.0, 0, "U"), (2, 2.0, 0, "U")])
    c1 = str(tmp_path / "b")
    versioned.clone_snapshot(src, c1)
    _merge(spark, c1, [(3, 3.0, 1, "U")])
    c2 = str(tmp_path / "c")
    versioned.clone_snapshot(c1, c2)
    assert _state(spark, c2) == {1: 1.0, 2: 2.0, 3: 3.0}
