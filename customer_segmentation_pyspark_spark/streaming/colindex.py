"""Secondary column index for partitioned MERGE tables (r07): point
lookups on a NON-key column without scanning the table.

A merge table is hash-partitioned by its merge key, so `key_in` point
reads prune to O(|keys|) dirs — but a predicate on any OTHER column
falls back to footer-stats pruning, which hash partitioning defeats
for high-cardinality columns (every dir spans the whole value range).
This module maintains an inverted map

    value of <col>  ->  sorted set of partition ids containing it

as a tiny MERGE subtable (``<table>/_colidx_<col>``) keyed by the
value, fed INCREMENTALLY from the table's change data feed — the same
shape as the IVF keymap and the join-view ``_jvmap`` (r07, VERDICT
#1), promoted to a first-class feature (the Hyperspace /
Delta-bloom-index role, expressed as a lakehouse subtable).

Semantics:
  * SUPERSET map — deletes and value retargets never remove entries
    (extra partitions cost IO, never correctness); each sync is
    O(|Δ| touched partitions) via point-read + union + merge.
  * EXACT reads even when the index is stale: the index manifest
    records the table version it reflects (cursor marker); a read at a
    newer table version unions the indexed partitions with every
    partition whose directory CHANGED since the indexed version
    (manifest diff — still pruned, no full scan), so unindexed deltas
    can never be missed. Callers sync opportunistically, not
    critically.
  * The residual equality filter always runs on the returned rows —
    pruning is never load-bearing beyond the partition projection.

At 100 TB: a point lookup on an indexed column reads O(dirs that ever
contained the value) + O(dirs touched since the last sync) instead of
all P partitions; the index itself is (distinct values × ≤P ints).
Reference parity: no secondary indexes in the reference (a k-means
notebook, codeText.txt); engine surface for the lakehouse north star.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.streaming.views import (
    _write_marker,
    view_src_version,
)


def _colidx_dir(table_dir: str, col: str) -> str:
    return os.path.join(table_dir, f"_colidx_{col}")


#: above this many distinct values in one sync's delta, the prior-entry
#: lookup switches from a key_in point-read (driver list + partition
#: pruning) to a distributed semi-join against the whole index subtable
#: — same bound and rationale as the join-view `_JVMAP_POINT_READ_MAX`
#: (a wave-sized IN-list plan costs more than the scan it saves)
_COLIDX_POINT_READ_MAX = 64

#: dropped inside the index dir for the duration of a vacuum sweep
#: (r08, VERDICT #4). READS never need it — the version-marker escape
#: hatch keeps them exact through any partial vacuum state (a clipped
#: entry only loses partitions no CURRENT row of the value occupies,
#: and rows newer than the marker ride the changed-partition union).
#: The marker exists to stop a CONCURRENT SYNC's marker advance from
#: racing a clip: a sync that union-merged entries for versions
#: (v, v'] and then stamps v' AFTER the vacuum replaced those entries
#: with exact-at-older-v would open a coverage hole. Syncs seeing the
#: marker therefore rebuild from the full snapshot instead of folding
#: incrementally (redundant-but-safe if the vacuum is live, the heal
#: if it crashed); only a COMPLETING vacuum removes the marker — the
#: keymap vacuum's discipline (`operators/vector_index.py`).
VACUUM_MARKER = "_vacuum-inprogress"


def _vacuum_marker_path(idx_dir: str) -> str:
    return os.path.join(idx_dir, VACUUM_MARKER)


def sync_column_index(
    spark: SparkSession,
    table_dir: str,
    col: str,
    num_partitions: int = 32,
) -> int:
    """Bring the column index up to the table's latest version: seed
    from the full snapshot on first call (the one O(table) step), then
    fold only the CDF since the cursored version — insert/post-image
    rows union their partition id into their value's entry; deletes
    and pre-images are ignored (superset rule). Returns the table
    version the index now reflects."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        _part_expr,
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
        read_snapshot_changes,
    )

    cur = versioned.latest_version(table_dir)
    if cur < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    man = versioned.read_manifest(table_dir)
    key, tparts = man["key"], int(man["num_partitions"])
    idx_dir = _colidx_dir(table_dir, col)

    v0 = view_src_version(idx_dir) if os.path.isdir(idx_dir) else None
    if v0 is not None and os.path.exists(_vacuum_marker_path(idx_dir)):
        # interrupted (or live) vacuum sweep: an incremental fold's
        # marker advance could race a mid-flight clip into a coverage
        # hole — rebuild from the full snapshot instead (redundant if
        # the vacuum is live, the heal if it crashed). The marker stays
        # in place; only a completing vacuum removes it (r08).
        v0 = None
    if v0 is None:
        src = read_partitioned_snapshot(spark, table_dir, version=cur)
    elif v0 >= cur:
        return v0  # already current — the idempotent no-op
    else:
        src = read_snapshot_changes(spark, table_dir, v0, cur).filter(
            F.col("_change_type").isin("insert", "update_postimage")
        )
    fresh = (
        src.filter(F.col(col).isNotNull())
        .select(F.col(col), _part_expr(key, tparts).alias("__p"))
        .groupBy(col)
        .agg(F.sort_array(F.collect_set("__p")).alias("parts"))
    )
    # union into prior entries. `key_in` is a POINT-lookup API (the
    # r07 jvmap lesson, SCALE.md): a high-cardinality indexed column
    # with a large CDC batch must NOT collect a wave-sized value list
    # to the driver and build a giant IN-list plan — point-read only
    # when the delta touches few values, semi-join the (tiny: 2
    # columns x distinct values) index subtable otherwise (r08,
    # VERDICT #3).
    if v0 is not None:
        # single execution of the fold plan (r11): the sample below,
        # the big-wave prior semi-join, and the merge's staging job all
        # reference `fresh` — materialize it once (literal when small,
        # checkpoint when wave-sized) instead of re-running the CDF
        # groupBy per reference
        from customer_segmentation_pyspark_spark.streaming.views import (
            _materialize_small,
        )

        fresh = _materialize_small(spark, fresh, _COLIDX_POINT_READ_MAX)
        sample = (
            fresh.select(col).limit(_COLIDX_POINT_READ_MAX + 1).collect()
        )
        if sample:
            try:
                if len(sample) <= _COLIDX_POINT_READ_MAX:
                    prior = read_partitioned_snapshot(
                        spark,
                        idx_dir,
                        key_in=[r[0] for r in sample],
                    ).select(col, "parts")
                else:
                    prior = (
                        read_partitioned_snapshot(spark, idx_dir)
                        .join(fresh.select(col), col, "leftsemi")
                        .select(col, "parts")
                    )
                fresh = (
                    fresh.unionByName(prior)
                    .groupBy(col)
                    .agg(
                        F.sort_array(
                            F.array_distinct(
                                F.flatten(F.collect_list("parts"))
                            )
                        ).alias("parts")
                    )
                )
            except FileNotFoundError:
                pass  # marker exists but table empty: plain insert
    # no isEmpty() pre-check (r10): that executed the fresh plan one
    # extra time per sync — the staged merge discovers an empty batch
    # itself and commits nothing, at the cost it already pays
    merge_into_partitioned_snapshot(
        spark,
        idx_dir,
        fresh.withColumn("__seq", F.lit(0).cast("long")),
        key=col,
        seq="__seq",
        num_partitions=num_partitions,
        collect_stats=False,
        # groupBy output: one row per indexed value
        assume_unique_keys=True,  # index reads prune by value hash
    )
    os.makedirs(idx_dir, exist_ok=True)
    # marker-clamp (r08): while a vacuum sweep is in flight, advancing
    # the version marker past the sweep's DERIVATION version could
    # stamp coverage over entries the sweep is about to clip — clamp to
    # the derivation version recorded in the vacuum marker (re-read
    # just before the write, so a vacuum that started mid-sync is seen
    # too). A completing vacuum re-stamps its own derivation version.
    stamp = cur
    try:
        with open(_vacuum_marker_path(idx_dir)) as f:
            stamp = min(cur, int(f.read().strip() or 0))
    except FileNotFoundError:
        pass
    except ValueError:
        stamp = 0  # unreadable marker: claim nothing, stay exact
    _write_marker(idx_dir, stamp)
    return cur


def _parts_changed_since(man_old: dict, man_new: dict) -> set[str]:
    """Partition ids whose base dir or delta log differs between two
    manifests — the partitions that could hold rows the index has not
    seen yet."""
    changed = set()
    for p in set(man_old.get("parts", {})) | set(man_new.get("parts", {})):
        if man_old.get("parts", {}).get(p) != man_new.get("parts", {}).get(
            p
        ):
            changed.add(p)
    for p in set(man_old.get("deltas", {})) | set(
        man_new.get("deltas", {})
    ):
        if man_old.get("deltas", {}).get(p) != man_new.get(
            "deltas", {}
        ).get(p):
            changed.add(p)
    return changed


def read_by_column_value(
    spark: SparkSession,
    table_dir: str,
    col: str,
    values: list,
) -> DataFrame:
    """Point lookup on an indexed non-key column: open only (a) the
    partitions the index maps the values to, plus (b) the partitions
    whose directories changed since the index's cursored version (the
    staleness escape hatch — exact without requiring a sync). The
    equality filter is applied to the returned rows regardless. Falls
    back to the plain filtered scan when no index exists for ``col``."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        read_partitioned_snapshot,
    )

    values = [v for v in values if v is not None]
    idx_dir = _colidx_dir(table_dir, col)
    v_idx = view_src_version(idx_dir) if os.path.isdir(idx_dir) else None
    cur = versioned.latest_version(table_dir)
    if v_idx is None:
        return read_partitioned_snapshot(
            spark, table_dir, version=cur
        ).filter(F.col(col).isin(values))
    try:
        hit = read_partitioned_snapshot(spark, idx_dir, key_in=values)
        pids = {
            str(r["p"])
            for r in hit.select(F.explode("parts").alias("p")).collect()
        }
    except FileNotFoundError:
        pids = set()  # index committed-empty (all-NULL column so far)
    if cur > v_idx:
        try:
            man_old = versioned.read_manifest(table_dir, v_idx)
        except FileNotFoundError:
            # the indexed version's manifest expired (retention GC): the
            # changed-partition escape hatch can no longer be computed —
            # degrade to the full filtered scan instead of crashing
            # (r08, ADVICE); the next sync re-cursors to a live version
            return read_partitioned_snapshot(
                spark, table_dir, version=cur
            ).filter(F.col(col).isin(values))
        man_new = versioned.read_manifest(table_dir, cur)
        pids |= _parts_changed_since(man_old or {}, man_new or {})
    # the final read is PINNED to the version the escape hatch was
    # computed against (r08, ADVICE): a commit landing between
    # latest_version() and an unpinned read could add rows in
    # partitions outside pids, silently violating exactness
    return read_partitioned_snapshot(
        spark, table_dir, version=cur, partitions_in=sorted(pids)
    ).filter(F.col(col).isin(values))


def vacuum_column_index(
    spark: SparkSession,
    table_dir: str,
    col: str,
) -> None:
    """Index GC (r08, VERDICT #4): the superset rule means deletes and
    value retargets never remove entries, so a churn-heavy table
    accretes (a) partition ids no current row of a value occupies and
    (b) whole rows for values no longer in the table — read IO, never
    correctness. This re-derives every live value's EXACT entry from
    the current snapshot (replace-merge over the bloated superset) and
    DELETES the rows of vanished values, as ONE ordinary merge commit —
    never a table drop, so concurrent readers keep reading committed
    versions and a concurrent writer's merge either composes (disjoint
    index partitions) or raises the merge layer's own
    ``ConcurrentMergeError``.

    Crash-safety (the keymap vacuum's discipline): reads stay exact
    through ANY partial state — a clipped entry only loses partitions
    that held no current row at the derivation version, rows newer than
    the index's version marker ride the changed-partition escape hatch,
    and the marker is only advanced here AFTER the merge commits, to
    the pinned derivation version (so the escape hatch covers exactly
    what the clip could have removed). The ``_vacuum-inprogress``
    marker guards the one true race — a concurrent SYNC advancing the
    marker over entries this sweep just clipped: syncs seeing it
    rebuild from the full snapshot instead of folding incrementally,
    and only a completing vacuum removes it."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        _part_expr,
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )

    cur = versioned.latest_version(table_dir)
    if cur < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    man = versioned.read_manifest(table_dir)
    key, tparts = man["key"], int(man["num_partitions"])
    idx_dir = _colidx_dir(table_dir, col)
    if versioned.latest_version(idx_dir) < 1:
        return  # no committed index: nothing to vacuum
    with open(_vacuum_marker_path(idx_dir), "w") as f:
        f.write(str(cur))
    exact = (
        read_partitioned_snapshot(spark, table_dir, version=cur)
        .filter(F.col(col).isNotNull())
        .select(F.col(col), _part_expr(key, tparts).alias("__p"))
        .groupBy(col)
        .agg(F.sort_array(F.collect_set("__p")).alias("parts"))
        .withColumn("__seq", F.lit(0).cast("long"))
        .withColumn("__op", F.lit("U"))
    )
    try:
        idx_vals = read_partitioned_snapshot(spark, idx_dir).select(col)
    except FileNotFoundError:
        idx_vals = None  # committed-empty index (all-NULL column)
    batch = exact
    if idx_vals is not None:
        stale = (
            idx_vals.join(exact.select(col), col, "left_anti")
            .withColumn("parts", F.lit(None).cast("array<int>"))
            .withColumn("__seq", F.lit(1).cast("long"))
            .withColumn("__op", F.lit("D"))
        )
        batch = exact.unionByName(stale)
    merge_into_partitioned_snapshot(
        spark,
        idx_dir,
        batch,
        key=col,
        seq="__seq",
        delete_when="__op = 'D'",
        marker_cols=("__op",),
        collect_stats=False,
        # grouped exact entries + anti-join-disjoint stale tombstones
        assume_unique_keys=True,
    )
    # marker advance AFTER the merge, to the pinned derivation version:
    # anything the clip could have removed is newer than cur and rides
    # the changed-partition escape hatch
    _write_marker(idx_dir, cur)
    try:
        os.remove(_vacuum_marker_path(idx_dir))
    except OSError:
        pass


# ---------------------------------------------------------------------------
# Bucketed RANGE index (r08, VERDICT #5): the one predicate class hash
# partitioning still defeats after the equality index — a RANGE on a
# non-key column (per-partition footer min/max spans the whole value
# range when values are uncorrelated with the key hash). Same inverted
# map, different key: values quantize to buckets (floor(value/width)),
# each bucket maps to the partition ids that ever held a value in it.
# A range [lo, hi] reads the overlapping buckets' entries (point-read
# when few, bucket-filtered scan of the tiny index otherwise), unions
# the changed-partition escape hatch, and applies the residual BETWEEN
# — superset + stale-exactness semantics identical to the equality
# index above. Width is fixed at index creation (persisted in the
# index dir): changing it is a rebuild, not a sync.
# ---------------------------------------------------------------------------

WIDTH_FILE = "_BUCKET_WIDTH"


def _colrng_dir(table_dir: str, col: str) -> str:
    return os.path.join(table_dir, f"_colrng_{col}")


def _bucket_expr(col: str, width: float):
    return F.floor(F.col(col) / F.lit(float(width))).cast("long")


def _stored_width(idx_dir: str) -> float | None:
    try:
        with open(os.path.join(idx_dir, WIDTH_FILE)) as f:
            return float(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None


#: a range spanning more buckets than this reads the (tiny) index with
#: a bucket BETWEEN filter instead of building a giant key_in list —
#: the same wave-sized-IN-list rationale as the sync bound above
_RANGE_POINT_READ_MAX = 512


def sync_range_index(
    spark: SparkSession,
    table_dir: str,
    col: str,
    bucket_width: float | None = None,
    num_partitions: int = 32,
) -> int:
    """Bring the range index up to the table's latest version: seed
    from the full snapshot on first call (``bucket_width`` required and
    persisted), then fold only the CDF since the cursored version —
    insert/post-image rows union their partition id into their BUCKET's
    entry; deletes and pre-images are ignored (superset rule). Returns
    the table version the index now reflects."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        _part_expr,
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
        read_snapshot_changes,
    )

    cur = versioned.latest_version(table_dir)
    if cur < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    man = versioned.read_manifest(table_dir)
    key, tparts = man["key"], int(man["num_partitions"])
    idx_dir = _colrng_dir(table_dir, col)

    w = _stored_width(idx_dir)
    if w is None:
        if bucket_width is None or float(bucket_width) <= 0:
            raise ValueError(
                "first sync of a range index needs a positive "
                "bucket_width (persisted; later syncs inherit it)"
            )
        w = float(bucket_width)
        os.makedirs(idx_dir, exist_ok=True)
        with open(os.path.join(idx_dir, WIDTH_FILE), "w") as f:
            f.write(repr(w))
    elif bucket_width is not None and float(bucket_width) != w:
        raise ValueError(
            f"range index on '{col}' was created with bucket_width={w}; "
            "changing it is a rebuild, not a sync"
        )

    v0 = view_src_version(idx_dir)
    if v0 is not None and os.path.exists(_vacuum_marker_path(idx_dir)):
        v0 = None  # interrupted vacuum: rebuild (see sync_column_index)
    if v0 is None:
        src = read_partitioned_snapshot(spark, table_dir, version=cur)
    elif v0 >= cur:
        return v0  # already current — the idempotent no-op
    else:
        src = read_snapshot_changes(spark, table_dir, v0, cur).filter(
            F.col("_change_type").isin("insert", "update_postimage")
        )
    fresh = (
        src.filter(F.col(col).isNotNull())
        .select(
            _bucket_expr(col, w).alias("__bkt"),
            _part_expr(key, tparts).alias("__p"),
        )
        .groupBy("__bkt")
        .agg(F.sort_array(F.collect_set("__p")).alias("parts"))
    )
    if v0 is not None:
        # single execution of the fold plan (r11) — see
        # sync_column_index above
        from customer_segmentation_pyspark_spark.streaming.views import (
            _materialize_small,
        )

        fresh = _materialize_small(spark, fresh, _COLIDX_POINT_READ_MAX)
        sample = (
            fresh.select("__bkt").limit(_COLIDX_POINT_READ_MAX + 1).collect()
        )
        if sample:
            try:
                if len(sample) <= _COLIDX_POINT_READ_MAX:
                    prior = read_partitioned_snapshot(
                        spark, idx_dir, key_in=[r[0] for r in sample]
                    ).select("__bkt", "parts")
                else:
                    prior = (
                        read_partitioned_snapshot(spark, idx_dir)
                        .join(fresh.select("__bkt"), "__bkt", "leftsemi")
                        .select("__bkt", "parts")
                    )
                fresh = (
                    fresh.unionByName(prior)
                    .groupBy("__bkt")
                    .agg(
                        F.sort_array(
                            F.array_distinct(
                                F.flatten(F.collect_list("parts"))
                            )
                        ).alias("parts")
                    )
                )
            except FileNotFoundError:
                pass  # marker exists but index empty: plain insert
    # no isEmpty() pre-check (r10): same one-fewer-execution note as
    # sync_column_index above
    merge_into_partitioned_snapshot(
        spark,
        idx_dir,
        fresh.withColumn("__seq", F.lit(0).cast("long")),
        key="__bkt",
        seq="__seq",
        num_partitions=num_partitions,
        collect_stats=False,
        # groupBy output: one row per indexed value
        assume_unique_keys=True,
    )
    os.makedirs(idx_dir, exist_ok=True)
    stamp = cur
    try:
        with open(_vacuum_marker_path(idx_dir)) as f:
            stamp = min(cur, int(f.read().strip() or 0))
    except FileNotFoundError:
        pass
    except ValueError:
        stamp = 0
    _write_marker(idx_dir, stamp)
    return cur


def read_by_column_range(
    spark: SparkSession,
    table_dir: str,
    col: str,
    lo,
    hi,
) -> DataFrame:
    """Range lookup on a range-indexed non-key column: open only (a)
    the partitions the overlapping buckets map to, plus (b) the
    partitions whose directories changed since the index's cursored
    version (stale-exactness escape hatch). The residual
    ``col BETWEEN lo AND hi`` filter (inclusive) is applied to the
    returned rows regardless. Falls back to the plain filtered scan
    when no range index exists for ``col``."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        read_partitioned_snapshot,
    )

    residual = (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    idx_dir = _colrng_dir(table_dir, col)
    w = _stored_width(idx_dir)
    v_idx = view_src_version(idx_dir) if w is not None else None
    cur = versioned.latest_version(table_dir)
    if v_idx is None:
        return read_partitioned_snapshot(
            spark, table_dir, version=cur
        ).filter(residual)
    import math

    b_lo = math.floor(float(lo) / w)
    b_hi = math.floor(float(hi) / w)
    try:
        if b_hi - b_lo + 1 <= _RANGE_POINT_READ_MAX:
            hit = read_partitioned_snapshot(
                spark, idx_dir, key_in=list(range(b_lo, b_hi + 1))
            )
        else:
            hit = read_partitioned_snapshot(spark, idx_dir).filter(
                F.col("__bkt").between(b_lo, b_hi)
            )
        pids = {
            str(r["p"])
            for r in hit.select(F.explode("parts").alias("p")).collect()
        }
    except FileNotFoundError:
        pids = set()  # index committed-empty (all-NULL column so far)
    if cur > v_idx:
        try:
            man_old = versioned.read_manifest(table_dir, v_idx)
        except FileNotFoundError:
            # indexed version's manifest expired: escape hatch can't be
            # computed — degrade to the full filtered scan
            return read_partitioned_snapshot(
                spark, table_dir, version=cur
            ).filter(residual)
        man_new = versioned.read_manifest(table_dir, cur)
        pids |= _parts_changed_since(man_old or {}, man_new or {})
    return read_partitioned_snapshot(
        spark, table_dir, version=cur, partitions_in=sorted(pids)
    ).filter(residual)


def vacuum_range_index(
    spark: SparkSession,
    table_dir: str,
    col: str,
) -> None:
    """Range-index GC (r08): same contract as
    :func:`vacuum_column_index`, keyed by bucket — live buckets'
    entries re-derive exactly from the current snapshot, buckets whose
    every value left the table delete, one merge commit, the
    ``_vacuum-inprogress`` marker freezes concurrent syncs into
    rebuild mode and clamps their marker stamps."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        _part_expr,
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )

    cur = versioned.latest_version(table_dir)
    if cur < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    man = versioned.read_manifest(table_dir)
    key, tparts = man["key"], int(man["num_partitions"])
    idx_dir = _colrng_dir(table_dir, col)
    w = _stored_width(idx_dir)
    if w is None or versioned.latest_version(idx_dir) < 1:
        return  # no committed index: nothing to vacuum
    with open(_vacuum_marker_path(idx_dir), "w") as f:
        f.write(str(cur))
    exact = (
        read_partitioned_snapshot(spark, table_dir, version=cur)
        .filter(F.col(col).isNotNull())
        .select(
            _bucket_expr(col, w).alias("__bkt"),
            _part_expr(key, tparts).alias("__p"),
        )
        .groupBy("__bkt")
        .agg(F.sort_array(F.collect_set("__p")).alias("parts"))
        .withColumn("__seq", F.lit(0).cast("long"))
        .withColumn("__op", F.lit("U"))
    )
    try:
        idx_bkts = read_partitioned_snapshot(spark, idx_dir).select(
            "__bkt"
        )
    except FileNotFoundError:
        idx_bkts = None  # committed-empty index
    batch = exact
    if idx_bkts is not None:
        stale = (
            idx_bkts.join(exact.select("__bkt"), "__bkt", "left_anti")
            .withColumn("parts", F.lit(None).cast("array<int>"))
            .withColumn("__seq", F.lit(1).cast("long"))
            .withColumn("__op", F.lit("D"))
        )
        batch = exact.unionByName(stale)
    merge_into_partitioned_snapshot(
        spark,
        idx_dir,
        batch,
        key="__bkt",
        seq="__seq",
        delete_when="__op = 'D'",
        marker_cols=("__op",),
        collect_stats=False,
        # grouped exact entries + anti-join-disjoint stale tombstones
        assume_unique_keys=True,
    )
    _write_marker(idx_dir, cur)
    try:
        os.remove(_vacuum_marker_path(idx_dir))
    except OSError:
        pass
