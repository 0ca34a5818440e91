"""Streaming MERGE (upsert) sink — the foreachBatch copy-on-write pattern.

The reference has no streaming surface (SURVEY.md §2.11).  This is the
standard production shape for maintaining a keyed snapshot from a change
stream: each micro-batch is reduced to its latest row per key, then merged
into the snapshot with the same full-outer-join + coalesce plan as the
batch ``upsert_snapshot`` query (queries.py) — write-once per batch,
crash-recoverable directory swap (sinks.crash_safe_swap/recover_swap).
On a real lakehouse the swap is a table-format MERGE (commit log)
instead of a directory rename; the join plan is identical.

Scale notes (100 TB): the snapshot re-write is O(snapshot) per batch —
acceptable for compacted snapshots, the motivation for MERGE-on-read
formats otherwise.  The per-batch reduce keeps state out of the stream
(no unbounded streaming state; the snapshot IS the state, stored on
disk).  Bucket both sides by the key to make the join shuffle-free.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.sources.sinks import (
    crash_safe_swap,
    recover_swap,
)


def latest_per_key(batch: DataFrame, key: str, seq: str) -> DataFrame:
    """Reduce a change-set to its last row per key (by ``seq``, ties by
    nothing — callers must make ``seq`` unique per key within a batch)."""
    w = Window.partitionBy(key).orderBy(F.col(seq).desc())
    return (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_into_snapshot(
    spark: SparkSession,
    snapshot_dir: str,
    changes: DataFrame,
    key: str,
    seq: str,
) -> None:
    """One MERGE step: upsert ``changes`` (any schema-compatible change
    set) into the parquet snapshot at ``snapshot_dir``.

    Update columns win over snapshot columns per key; unmatched change
    keys are inserts; untouched snapshot keys are kept.  The write goes to
    a fresh directory then swaps in via ``sinks.crash_safe_swap``:
    ``recover_swap`` at open adopts a snapshot stranded by a crash
    between the swap renames, and the replayed batch re-merges
    idempotently on top of it — previously-merged keys survive any
    crash point.  (A reader inside the rename gap can still see the
    directory briefly missing; the table-format commit log is the
    lakehouse-scale fix.)

    Cost is O(|snapshot|) per batch — fine for compacted snapshots; for
    large snapshots under small change streams use
    ``merge_into_partitioned_snapshot`` below (same semantics, rewrites
    only partitions containing changed keys, atomic manifest commit).
    """
    recover_swap(snapshot_dir)
    delta = latest_per_key(changes, key, seq)
    if os.path.exists(snapshot_dir):
        merged = _merge_frames(spark.read.parquet(snapshot_dir), delta, key)
    else:
        merged = delta
    tmp = f"{snapshot_dir}.tmp-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    crash_safe_swap(snapshot_dir, tmp)


def _merge_frames(base: DataFrame, delta: DataFrame, key: str) -> DataFrame:
    """The MERGE join: full-outer on the key, update columns win.

    Schema evolution (r04): the merged schema is the UNION of both
    sides' columns, in base order with delta-only columns appended —
    a delta-only column reaches every row (its value for upserted keys,
    typed NULL for untouched keys), and a base-only column persists
    (base value survives an update that doesn't mention it, NULL for
    fresh inserts) — the add-column semantics of Delta/Iceberg
    ``mergeSchema``. Dropping or retyping a column is intentionally NOT
    expressible here (that's a rewrite, not a merge)."""
    base_only = [c for c in base.columns if c not in delta.columns]
    delta_only = [c for c in delta.columns if c not in base.columns]
    for c in delta_only:
        base = base.withColumn(
            c, F.lit(None).cast(delta.schema[c].dataType)
        )
    for c in base_only:
        delta = delta.withColumn(
            c, F.lit(None).cast(base.schema[c].dataType)
        )
    cols = [c for c in base.columns if c != key]
    d = delta.select(
        F.col(key).alias("__k"), *[F.col(c).alias(f"__u_{c}") for c in cols]
    )
    return base.join(d, F.col(key) == F.col("__k"), "full_outer").select(
        F.coalesce(key, "__k").alias(key),
        *[F.coalesce(f"__u_{c}", c).alias(c) for c in cols],
    )


def streaming_upsert(
    spark: SparkSession,
    updates: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
    key: str,
    seq: str,
):
    """Run a change stream into a maintained snapshot via foreachBatch.

    ``updates`` must be a streaming DataFrame.  Returns the started query;
    callers trigger ``availableNow`` semantics by awaiting termination.
    Exactly-once: foreachBatch replays a batch after failure, and the
    merge is idempotent per (key, seq) — re-merging the same delta leaves
    the snapshot unchanged.
    """

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_into_snapshot(spark, snapshot_dir, batch_df, key, seq)

    return (
        updates.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Partition-pruned MERGE (VERDICT r02 #2): the copy-on-write path above
# rewrites the WHOLE snapshot every micro-batch — O(|snapshot|) per batch,
# which at lakehouse scale makes a small CDC stream rewrite terabytes.
# This variant hash-partitions the snapshot by the merge key and rewrites
# ONLY the partitions containing changed keys; every other partition's
# files are reused byte-identical through the manifest (one immutable
# directory per partition, committed via sources/versioned.py's atomic
# pointer flip). Per-batch cost: O(touched partitions), i.e.
# O(min(|delta| , P) / P x |snapshot|) instead of O(|snapshot|).
# ---------------------------------------------------------------------------


def _part_expr(key: str, num_partitions: int):
    """Partition id of a key — recomputed on read and write, so the data
    files never need to store it (xxhash64 is deterministic per type)."""
    return F.pmod(F.xxhash64(F.col(key)), F.lit(num_partitions)).cast("int")


def merge_into_partitioned_snapshot(
    spark: SparkSession,
    table_dir: str,
    changes: DataFrame,
    key: str,
    seq: str,
    num_partitions: int = 32,
) -> None:
    """One partition-pruned MERGE step. Same semantics as
    ``merge_into_snapshot`` (update columns win per key, unmatched keys
    insert, untouched keys kept), different write cost: only the hash
    partitions of ``key`` present in the delta are read, merged, and
    rewritten as fresh immutable ``p-*`` directories; the new manifest
    reuses every untouched partition's directory as-is and commits with
    the atomic pointer flip — a crash at any point leaves the previous
    manifest fully readable (stranded part dirs are GC'd on the next
    merge) and the replayed batch re-merges idempotently.

    ``num_partitions`` is fixed at table creation (stored in the
    manifest; the argument is ignored afterwards). Size it so one
    partition ~ a few GB at the target scale — the per-batch rewrite
    unit. One Spark job per merge: touched base partitions are unioned,
    merged against the delta, and written with partitionBy in a single
    pass.
    """
    from customer_segmentation_pyspark_spark.sources import versioned

    man = versioned.read_manifest(table_dir)
    if man is not None:
        num_partitions = int(man["num_partitions"])
        parts = dict(man["parts"])
        stats = dict(man.get("stats", {}))
        if man.get("key", key) != key:
            raise ValueError(
                f"table {table_dir} was created with merge key "
                f"'{man['key']}'; cannot merge on '{key}'"
            )
        versioned.gc_unreferenced_parts(table_dir)
    else:
        parts = {}
        stats = {}

    delta = latest_per_key(changes, key, seq).withColumn(
        "__part", _part_expr(key, num_partitions)
    )
    part_rows = (
        delta.groupBy("__part")
        .agg(F.max(F.col(key).isNull()).alias("has_null"))
        .collect()
    )  # bounded by num_partitions
    if any(r["has_null"] for r in part_rows):
        # NULL merge keys are undefined for an upsert: they never match
        # in the full-outer join (NULL == NULL is false), silently
        # accumulating one phantom row per batch. xxhash64(NULL) is the
        # seed hash — NOT null — so the partition id can't reveal them;
        # refuse loudly on the key itself.
        raise ValueError(
            f"merge key '{key}' contains NULLs; filter them before the "
            "merge or use a non-nullable key"
        )
    touched = sorted(r["__part"] for r in part_rows)
    if not touched:
        return
    delta = delta.drop("__part")

    # allowMissingColumns + mergeSchema read: part dirs written before a
    # schema-evolving merge lack the newer columns (evolution rewrites
    # only touched partitions, like Delta/Iceberg metadata evolution)
    base_frames = [
        spark.read.option("mergeSchema", "true").parquet(
            os.path.join(table_dir, parts[str(p)])
        )
        for p in touched
        if str(p) in parts
    ]
    if base_frames:
        base = base_frames[0]
        for f in base_frames[1:]:
            base = base.unionByName(f, allowMissingColumns=True)
        merged = _merge_frames(base, delta, key)
    else:
        merged = delta
    merged = merged.withColumn("__part", _part_expr(key, num_partitions))

    os.makedirs(table_dir, exist_ok=True)
    staging = os.path.join(table_dir, f".staging-{uuid.uuid4().hex[:8]}")
    merged.write.mode("overwrite").partitionBy("__part").parquet(staging)
    for p in touched:
        src = os.path.join(staging, f"__part={p}")
        if os.path.isdir(src):
            dest = f"p-{uuid.uuid4().hex[:12]}"
            os.rename(src, os.path.join(table_dir, dest))
            parts[str(p)] = dest
            # footer-derived data-skipping stats for the fresh dir;
            # untouched partitions keep their previous stats entries
            stats[str(p)] = versioned.collect_dir_stats(
                os.path.join(table_dir, dest)
            )
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    versioned.commit_manifest(
        table_dir,
        {
            "num_partitions": num_partitions,
            "key": key,
            "parts": parts,
            "stats": stats,
        },
    )


#: where-predicate ops understood by the stats pruner AND the residual
#: filter; anything else must be applied by the caller on the result.
_WHERE_OPS = {"=", "<", "<=", ">", ">="}


def _dir_may_match(dir_stats: dict, col: str, op: str, val) -> bool:
    """Conservative dir-level predicate test: False ONLY when the dir's
    [min,max] proves no row can satisfy ``col op val``. Missing or
    type-incompatible stats keep the dir (pruning is an optimization —
    the residual Spark filter owns correctness either way). Parquet
    min/max ignore NULLs and NULL rows never satisfy these ops, so
    pruning on them is safe even for dirs that hold NULLs."""
    s = dir_stats.get(col)
    if not s:
        return True
    mn, mx = s
    if isinstance(val, bool) or not isinstance(val, (int, float, str)):
        return True
    if isinstance(mn, str) != isinstance(val, str):
        return True
    if op == "=":
        return mn <= val <= mx
    if op == ">":
        return mx > val
    if op == ">=":
        return mx >= val
    if op == "<":
        return mn < val
    return mn <= val  # "<="


def _snapshot_read_plan(
    spark: SparkSession,
    table_dir: str,
    version: int | None,
    where,
    key_in,
) -> tuple[dict, list[str], list[str]]:
    """The pruning decision, separated for testability: returns
    (manifest, kept partition ids, kept dir names) after key-based and
    stats-based pruning."""
    from customer_segmentation_pyspark_spark.sources import versioned

    man = versioned.read_manifest(table_dir, version)
    if man is None or not man["parts"]:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    if where:
        for c, op, v in where:
            if op not in _WHERE_OPS:
                raise ValueError(
                    f"unsupported where op {op!r}; use one of "
                    f"{sorted(_WHERE_OPS)}"
                )
    pids = sorted(man["parts"])
    if key_in is not None:
        key = man.get("key")
        if key is None:
            raise ValueError(
                "key_in pruning needs the manifest 'key' field — this "
                "table predates it; re-merge once to record the key"
            )
        # exact partition pruning: a key's partition id is a pure
        # function of its value — evaluate the SAME expression the
        # merge writes with, on the table's own key type (xxhash64 is
        # type-sensitive), via one driver-local job over |key_in| rows
        any_dir = os.path.join(table_dir, man["parts"][pids[0]])
        ktype = spark.read.parquet(any_dir).schema[key].dataType
        from pyspark.sql import types as _T

        lookup = spark.createDataFrame(
            [(v,) for v in key_in], _T.StructType([_T.StructField(key, ktype)])
        )
        hit = {
            str(r["p"])
            for r in lookup.select(
                _part_expr(key, int(man["num_partitions"])).alias("p")
            ).collect()
        }
        pids = [p for p in pids if p in hit]
    if where:
        stats = man.get("stats", {})
        pids = [
            p
            for p in pids
            if all(
                _dir_may_match(stats.get(p, {}), c, op, v)
                for c, op, v in where
            )
        ]
    return man, pids, [man["parts"][p] for p in pids]


def read_partitioned_snapshot(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    where: list[tuple] | None = None,
    key_in: list | None = None,
) -> DataFrame:
    """Read the latest (default) or any historical committed snapshot:
    the union scan over the manifest's immutable part directories.

    Two pruning layers skip whole partition DIRECTORIES before Spark
    lists a single file (r04.5 — at 100 TB the win is never touching
    the object-store prefixes at all, one level above parquet footer
    skipping):

    * ``key_in=[k, ...]`` — exact partition pruning for point lookups:
      each key's partition id is recomputed with the merge's own
      hash expression, so a point read scans O(|key_in|) dirs out of P.
    * ``where=[(col, op, literal), ...]`` (ops ``= < <= > >=``, ANDed)
      — manifest footer-stats pruning: a dir provably disjoint from the
      predicate range is skipped. Hash partitioning spreads key ranges
      across all dirs, so this layer pays off on columns that correlate
      with partitions naturally (batch/source/tenant-style columns) —
      point-key pruning above is the designed-for fast path.

    BOTH filters are also applied to the returned rows (key_in as an
    IN-filter), so pruned and unpruned reads return identical data —
    pruning is never load-bearing for correctness."""
    man, _, dirs = _snapshot_read_plan(
        spark, table_dir, version, where, key_in
    )
    if dirs:
        paths = [os.path.join(table_dir, d) for d in dirs]
    else:
        # everything pruned: keep the full-table schema, return no rows
        paths = [os.path.join(table_dir, d) for d in man["parts"].values()]
    # mergeSchema: after a schema-evolving merge, untouched partitions'
    # files predate the new columns — they surface as typed NULLs
    df = spark.read.option("mergeSchema", "true").parquet(*paths)
    if not dirs:
        df = df.filter(F.lit(False))
    if key_in is not None:
        df = df.filter(F.col(man["key"]).isin(list(key_in)))
    for c, op, v in where or []:
        cond = {
            "=": F.col(c) == F.lit(v),
            "<": F.col(c) < F.lit(v),
            "<=": F.col(c) <= F.lit(v),
            ">": F.col(c) > F.lit(v),
            ">=": F.col(c) >= F.lit(v),
        }[op]
        df = df.filter(cond)
    return df


def read_snapshot_changes(
    spark: SparkSession,
    table_dir: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Row-level change data feed between two committed manifest
    versions — the Delta CDF shape: table columns plus ``_change_type``
    in ``insert`` / ``delete`` / ``update_preimage`` /
    ``update_postimage`` (an unchanged row emits nothing; an updated
    key emits its pre- and post-image).

    Partition-pruned by construction: part dirs are immutable, so a
    partition whose manifest entry is IDENTICAL in both versions cannot
    contain a change and is never read — the diff costs
    O(changed partitions), not O(snapshot), the same unit as the merge
    that produced the changes. Column evolution between the versions is
    handled like the merge itself (missing columns surface as typed
    NULLs on the older side, so an added column reads as NULL->value
    updates only where row content actually changed)."""
    from customer_segmentation_pyspark_spark.sources import versioned

    man_a = versioned.read_manifest(table_dir, from_version)
    man_b = versioned.read_manifest(table_dir, to_version)
    if man_a is None or man_b is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    key = man_b.get("key") or man_a.get("key")
    if key is None:
        raise ValueError(
            "change feed needs the manifest 'key' field — this table "
            "predates it; re-merge once to record the key"
        )
    changed = [
        pid
        for pid in set(man_a["parts"]) | set(man_b["parts"])
        if man_a["parts"].get(pid) != man_b["parts"].get(pid)
    ]

    def _side(man, pids):
        dirs = [man["parts"][p] for p in pids if p in man["parts"]]
        if not dirs:
            return None
        return spark.read.option("mergeSchema", "true").parquet(
            *[os.path.join(table_dir, d) for d in dirs]
        )

    old, new = _side(man_a, changed), _side(man_b, changed)
    if old is None and new is None:  # no structural change at all
        empty = _side(man_b, sorted(man_b["parts"]))
        return empty.filter(F.lit(False)).withColumn(
            "_change_type", F.lit("")
        )
    # align columns across evolution: union of both sides' columns,
    # missing ones as typed NULLs (same rule as _merge_frames)
    if old is None:
        old = new.filter(F.lit(False))
    if new is None:
        new = old.filter(F.lit(False))
    for c in [c for c in new.columns if c not in old.columns]:
        old = old.withColumn(c, F.lit(None).cast(new.schema[c].dataType))
    for c in [c for c in old.columns if c not in new.columns]:
        new = new.withColumn(c, F.lit(None).cast(old.schema[c].dataType))
    cols = [c for c in old.columns if c != key]
    o = old.select(
        F.col(key).alias("__ko"),
        *[F.col(c).alias(f"__o_{c}") for c in cols],
    )
    n = new.select(
        F.col(key).alias("__kn"),
        *[F.col(c).alias(f"__n_{c}") for c in cols],
    )
    j = o.join(n, F.col("__ko") == F.col("__kn"), "full_outer")
    same = F.lit(True)
    for c in cols:
        same = same & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    inserts = j.filter(F.col("__ko").isNull()).select(
        F.col("__kn").alias(key),
        *[F.col(f"__n_{c}").alias(c) for c in cols],
        F.lit("insert").alias("_change_type"),
    )
    deletes = j.filter(F.col("__kn").isNull()).select(
        F.col("__ko").alias(key),
        *[F.col(f"__o_{c}").alias(c) for c in cols],
        F.lit("delete").alias("_change_type"),
    )
    upd = j.filter(
        F.col("__ko").isNotNull() & F.col("__kn").isNotNull() & ~same
    )
    pre = upd.select(
        F.col("__ko").alias(key),
        *[F.col(f"__o_{c}").alias(c) for c in cols],
        F.lit("update_preimage").alias("_change_type"),
    )
    post = upd.select(
        F.col("__kn").alias(key),
        *[F.col(f"__n_{c}").alias(c) for c in cols],
        F.lit("update_postimage").alias("_change_type"),
    )
    return inserts.unionByName(deletes).unionByName(pre).unionByName(post)


def streaming_partitioned_upsert(
    spark: SparkSession,
    updates: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    key: str,
    seq: str,
    num_partitions: int = 32,
):
    """``streaming_upsert`` with the partition-pruned merge: a change
    stream maintained into a manifest-committed snapshot, rewriting only
    the partitions each micro-batch touches."""

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_into_partitioned_snapshot(
            spark, table_dir, batch_df, key, seq, num_partitions
        )

    return (
        updates.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _commit_rewrites(
    table_dir: str, rewrites: dict[str, tuple[str, str]]
) -> list[str]:
    """Optimistically commit content-preserving partition rewrites: the
    manifest is RE-READ at commit time and each rewrite only lands if
    the latest manifest still maps its partition to the directory the
    rewrite was read from. A partition a concurrent merge rewrote in
    the meantime is dropped (its dest dir is left stranded for GC) —
    committing it would silently revert the merge's newer data, the
    Delta OPTIMIZE conflict rule. Returns the partition ids that
    landed; commits nothing when none survive."""
    from customer_segmentation_pyspark_spark.sources import versioned

    cur = versioned.read_manifest(table_dir)
    nxt = dict(cur)  # carry num_partitions/key/any future fields
    parts = dict(cur["parts"])
    stats = dict(cur.get("stats", {}))
    surviving: list[str] = []
    for pid, (src, dest) in rewrites.items():
        if parts.get(pid) == src and os.path.isdir(
            os.path.join(table_dir, dest)
        ):
            parts[pid] = dest
            stats[pid] = versioned.collect_dir_stats(
                os.path.join(table_dir, dest)
            )
            surviving.append(pid)
    if surviving:
        nxt["parts"] = parts
        nxt["stats"] = stats
        versioned.commit_manifest(table_dir, nxt)
    return sorted(surviving)


def _rewrite_partitions(
    spark: SparkSession,
    table_dir: str,
    transform,
    needs_rewrite=None,
) -> list[str]:
    """Shared maintenance skeleton for compact/cluster: read each
    partition dir (mergeSchema carries evolved columns through), write
    ``transform(df)`` to a fresh immutable ``p-*`` dir, and commit via
    :func:`_commit_rewrites` (optimistic, merge-concurrency-safe).

    Long loops flush intermediate commits every STAGING_GRACE_SEC/3:
    an uncommitted dest dir older than the grace window would become
    GC-bait for a concurrent merge's gc_unreferenced_parts, so no dest
    is ever left unreferenced long enough to be collected. Each flush
    re-validates against the then-latest manifest, so the conflict
    window per partition is the read-validate-commit gap (ms), not the
    whole maintenance run."""
    import time

    from customer_segmentation_pyspark_spark.sources import versioned

    man = versioned.read_manifest(table_dir)
    if man is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    landed: list[str] = []
    pending: dict[str, tuple[str, str]] = {}
    flushed_at = time.monotonic()
    for pid, d in sorted(man["parts"].items()):
        full = os.path.join(table_dir, d)
        if needs_rewrite is not None and not needs_rewrite(full):
            continue
        df = spark.read.option("mergeSchema", "true").parquet(full)
        dest = f"p-{uuid.uuid4().hex[:12]}"
        transform(df).write.parquet(os.path.join(table_dir, dest))
        pending[pid] = (d, dest)
        if time.monotonic() - flushed_at > versioned.STAGING_GRACE_SEC / 3:
            landed.extend(_commit_rewrites(table_dir, pending))
            pending = {}
            flushed_at = time.monotonic()
    if pending:
        landed.extend(_commit_rewrites(table_dir, pending))
    return sorted(landed)


def compact_partitioned_snapshot(
    spark: SparkSession, table_dir: str, target_files: int = 1
) -> list[str]:
    """OPTIMIZE for the manifest table (r04): rewrite every partition
    whose data-file count exceeds ``target_files`` into a fresh
    immutable ``p-*`` dir with ``coalesce(target_files)``, committed
    optimistically (see :func:`_commit_rewrites` — a concurrent merge
    wins any partition it touched; the stale rewrite is dropped, never
    committed over newer data). Content is bit-preserved (a pure
    rewrite — the mergeSchema read carries evolved columns through);
    untouched partitions keep their directories byte-identical;
    historical manifests still reference the pre-compaction dirs, so
    time travel survives until
    :func:`~...sources.versioned.expire_versions` retires them.
    Returns the partition ids rewritten AND committed.

    Scale shape: each partition compacts independently (one bounded
    read+write per oversized partition, no shuffle — coalesce narrows),
    so the maintenance cost is O(oversized partitions), the same unit
    as the merge's rewrite."""

    def _oversized(full: str) -> bool:
        n_files = sum(
            1 for f in os.listdir(full)
            if f.endswith(".parquet") and not f.startswith(".")
        )
        return n_files > target_files

    return _rewrite_partitions(
        spark,
        table_dir,
        lambda df: df.coalesce(target_files),
        needs_rewrite=_oversized,
    )


def cluster_partitioned_snapshot(
    spark: SparkSession,
    table_dir: str,
    sort_cols: list[str],
    target_files: int = 1,
) -> list[str]:
    """Z-ORDER-lite maintenance for the manifest table (r04): rewrite
    every partition with its rows SORTED by ``sort_cols`` (pass a
    single natural column for range clustering, or a precomputed
    interleaved key — build one with the Morton-interleave pattern in
    ``queries.py``'s ``zorder_key`` query family — for multi-column
    locality), ``target_files`` files per partition, committed
    optimistically like compaction (a concurrent merge wins conflicted
    partitions). Content is preserved row-for-row; the payoff is data
    skipping — parquet min/max stats on the sort columns become
    disjoint-ish per file, so selective predicates prune files the way
    Delta OPTIMIZE ZORDER arranges. Unconditional rewrite (clustering
    cannot be detected from file counts); run it after
    compaction-worthy churn, not per batch. Returns the partition ids
    rewritten AND committed.

    Scale shape: per-partition local sort (sortWithinPartitions after a
    coalesce — no global shuffle), cost O(|partition| log |partition|)
    per partition, the same rewrite unit as the merge."""
    return _rewrite_partitions(
        spark,
        table_dir,
        lambda df: df.coalesce(target_files).sortWithinPartitions(*sort_cols),
    )
