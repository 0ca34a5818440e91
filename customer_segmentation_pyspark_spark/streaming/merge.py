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


def _latest_per_key_clustered(
    staged: DataFrame, key: str, seq: str
) -> DataFrame:
    """Latest row per key of a delta that already carries its target
    hash-partition id ``__part``, with the window's exchange keyed by
    ``__part`` instead of the key (r11, VERDICT #5). Keys never span
    partition dirs (``__part`` is a pure function of the key), so
    sorting each dir's rows by (key, seq DESC) and keeping the first
    row of every key run is exactly :func:`latest_per_key` — but the
    surviving rows leave the window hash-clustered by ``__part``, so
    the ``partitionBy`` staging write gets ONE task (and one output
    file) per rewritten dir at ANY input size, with NO extra exchange.
    (r10 declined a post-window ``repartition("__part")`` because it
    added a whole exchange for the bound; re-keying the window's own
    exchange gets the bound for free. Trade-off at scale: the dedup
    sort runs one task per touched dir — the merge's own rewrite unit,
    a few GB by design — instead of spreading over all shuffle
    partitions.) NULL keys survive as one representative row, exactly
    like the keyed window (``partitionBy(key)`` groups NULLs), so the
    staged NULL-key refusal still sees them. Ties on ``seq`` remain
    caller-undefined, as documented on :func:`latest_per_key`."""
    w = Window.partitionBy("__part").orderBy(
        F.col(key).asc_nulls_first(), F.col(seq).desc()
    )
    keep = (F.row_number().over(w) == 1) | ~F.col(key).eqNullSafe(
        F.lag(F.col(key)).over(w)
    )
    return staged.withColumn("__keep", keep).filter("__keep").drop("__keep")


def _split_deletes(
    delta: DataFrame, key: str, delete_when: str | None, marker_cols
) -> tuple[DataFrame, DataFrame | None]:
    """Split a latest-per-key change set into (upserts, delete keys).

    ``delete_when`` is a SQL boolean expression over the change row —
    the ``WHEN MATCHED AND <cond> THEN DELETE`` clause. Latest-wins is
    inherited from :func:`latest_per_key`: only the newest row per key
    is classified, so delete-then-reinsert within one batch nets to the
    insert and insert-then-delete nets to the delete. A NULL condition
    counts as not-a-delete (SQL WHERE semantics). ``marker_cols`` are
    change-set-only columns (the CDC op/flag fields the condition
    reads) dropped from the upsert side so they never enter — or
    schema-evolve — the snapshot."""
    if delete_when is None:
        return delta.drop(*marker_cols), None
    cond = F.coalesce(F.expr(delete_when), F.lit(False))
    ups = delta.filter(~cond).drop(*marker_cols)
    dels = delta.filter(cond).select(key)
    return ups, dels


#: safe type-widening chains (Delta typeWidening shape): a column may
#: evolve ALONG a chain, never across or backwards — old narrow files
#: stay readable because the parquet reader up-casts under an explicit
#: wider read schema (verified on Spark 4: int32->long, float->double).
_WIDEN_CHAINS = (["byte", "short", "integer", "long"], ["float", "double"])


def _wider_type_name(a: str, b: str) -> str | None:
    """The wider of two primitive type NAMES when they sit on the same
    widening chain (None when equal or not safely widenable)."""
    if a == b:
        return None
    for chain in _WIDEN_CHAINS:
        if a in chain and b in chain:
            return chain[max(chain.index(a), chain.index(b))]
    return None


def _widen_shared_columns(
    base: DataFrame, delta: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Cast both sides of a merge to the wider type wherever a shared
    column's types differ along a safe widening chain — the type
    evolution half of schema evolution (r05). Non-widenable retypes
    are left alone and fail loudly downstream (that's a rewrite, not
    a merge)."""
    from pyspark.sql import types as T

    atomic = {
        "byte": T.ByteType(),
        "short": T.ShortType(),
        "integer": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
    }
    for c in [c for c in base.columns if c in delta.columns]:
        w = _wider_type_name(
            base.schema[c].dataType.typeName(),
            delta.schema[c].dataType.typeName(),
        )
        if w is not None:
            base = base.withColumn(c, F.col(c).cast(atomic[w]))
            delta = delta.withColumn(c, F.col(c).cast(atomic[w]))
    return base, delta


def _merge_schema_fields(primary: list, secondary: list) -> list:
    """Union two manifest schema field lists by name — primary order,
    secondary-only fields appended — widening shared primitive fields
    along the safe chains (so concurrent or successive widenings
    converge to the widest, and old narrow files up-cast on read)."""
    out = [dict(f) for f in primary]
    idx = {f["name"]: i for i, f in enumerate(out)}
    for f in secondary:
        i = idx.get(f["name"])
        if i is None:
            idx[f["name"]] = len(out)
            out.append(dict(f))
        else:
            a, b = out[i]["type"], f["type"]
            if isinstance(a, str) and isinstance(b, str):
                w = _wider_type_name(a, b)
                if w is not None:
                    out[i]["type"] = w
    return out


def _table_read_schema(man: dict | None, with_tomb: bool = False):
    """Explicit read schema from the manifest (None when the manifest
    predates schema recording): reading with it instead of mergeSchema
    makes old narrow files up-cast in place after a widening merge —
    mergeSchema would refuse to merge INT and BIGINT dirs."""
    if man is None or man.get("schema") is None:
        return None
    from pyspark.sql import types as T

    sch = T.StructType.fromJson(man["schema"])
    if with_tomb:
        sch = T.StructType(
            sch.fields + [T.StructField("__tomb", T.BooleanType())]
        )
    return sch


def merge_into_snapshot(
    spark: SparkSession,
    snapshot_dir: str,
    changes: DataFrame,
    key: str,
    seq: str,
    delete_when: str | None = None,
    marker_cols: tuple = (),
    unmatched_source_delete: bool | str = False,
) -> None:
    """One MERGE step: upsert ``changes`` (any schema-compatible change
    set) into the parquet snapshot at ``snapshot_dir``.

    Update columns win over snapshot columns per key; unmatched change
    keys are inserts; untouched snapshot keys are kept.  With
    ``delete_when`` (r05), a change row satisfying the condition is a
    tombstone instead: the key is removed from the snapshot if present
    and ignored if not (``WHEN MATCHED AND cond THEN DELETE`` — see
    :func:`_split_deletes` for latest-wins and marker-column rules).
    ``unmatched_source_delete`` (r05) is the third MERGE verb — ``WHEN
    NOT MATCHED BY SOURCE [AND cond] THEN DELETE`` — for mirror/sync
    loads: snapshot keys ABSENT from the batch are dropped (True), or
    dropped only where the SQL condition over the snapshot row is true
    (a string; NULL counts as keep). Full-sync inherently examines the
    whole snapshot, which this CoW variant rewrites anyway; on the
    partitioned tables it would touch every partition per batch, so it
    is deliberately NOT offered there — model mirror maintenance as
    CDC with tombstones instead (``corpus_delete_wave`` shape).
    The write goes to a fresh directory then swaps in via
    ``sinks.crash_safe_swap``: ``recover_swap`` at open adopts a
    snapshot stranded by a crash between the swap renames, and the
    replayed batch re-merges idempotently on top of it —
    previously-merged keys survive any crash point.  (A reader inside
    the rename gap can still see the directory briefly missing; the
    table-format commit log is the lakehouse-scale fix.)

    Cost is O(|snapshot|) per batch — fine for compacted snapshots; for
    large snapshots under small change streams use
    ``merge_into_partitioned_snapshot`` below (same semantics, rewrites
    only partitions containing changed keys, atomic manifest commit).
    """
    recover_swap(snapshot_dir)
    delta = latest_per_key(changes, key, seq)
    ups, dels = _split_deletes(delta, key, delete_when, marker_cols)
    if os.path.exists(snapshot_dir):
        base = spark.read.parquet(snapshot_dir)
        merged = _merge_frames(base, ups, key)
        if unmatched_source_delete is not False:
            # "not matched by source": snapshot keys with NO row (of
            # any op) in this batch; among them, the condition (over
            # the SNAPSHOT row) picks the victims — True-only, so a
            # NULL condition keeps the row, mirroring delete_when
            victims = base.join(delta.select(key), key, "left_anti")
            if isinstance(unmatched_source_delete, str):
                victims = victims.filter(
                    F.coalesce(
                        F.expr(unmatched_source_delete), F.lit(False)
                    )
                )
            merged = merged.join(victims.select(key), key, "left_anti")
    else:
        merged = ups
    if dels is not None:
        merged = merged.join(dels, key, "left_anti")
    tmp = f"{snapshot_dir}.tmp-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    crash_safe_swap(snapshot_dir, tmp)


def _merge_frames(
    base: DataFrame,
    delta: DataFrame,
    key: str,
    update_set_all: bool = False,
) -> DataFrame:
    """The MERGE join: full-outer on the key, update columns win.

    Schema evolution (r04): the merged schema is the UNION of both
    sides' columns, in base order with delta-only columns appended —
    a delta-only column reaches every row (its value for upserted keys,
    typed NULL for untouched keys), and a base-only column persists
    (base value survives an update that doesn't mention it, NULL for
    fresh inserts) — the add-column semantics of Delta/Iceberg
    ``mergeSchema``. Dropping or retyping a column is intentionally NOT
    expressible here (that's a rewrite, not a merge).

    ``update_set_all`` (r06): UPDATE SET * semantics — a key present in
    the delta takes the delta's value for every column the delta
    CARRIES, explicit NULLs included (the default per-column coalesce
    keeps the old value on NULL, which would resurrect attributes an
    enrichment view has just nulled out). Base-only columns still
    persist either way — the delta cannot mention them."""
    base, delta = _widen_shared_columns(base, delta)
    delta_carries = set(delta.columns)
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

    def _pick(c):
        if update_set_all and c in delta_carries:
            return F.when(
                F.col("__k").isNotNull(), F.col(f"__u_{c}")
            ).otherwise(F.col(c))
        return F.coalesce(f"__u_{c}", c)

    d = delta.select(
        F.col(key).alias("__k"), *[F.col(c).alias(f"__u_{c}") for c in cols]
    )
    return base.join(d, F.col(key) == F.col("__k"), "full_outer").select(
        F.coalesce(key, "__k").alias(key),
        *[_pick(c).alias(c) for c in cols],
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


#: rewrite inputs at or above this many bytes get an explicit
#: repartition("__part") before their partitionBy write (r11, VERDICT
#: guide §6): a partitionBy write whose plan has no __part-keyed
#: exchange produces tasks x dirs files — harmless under a couple of
#: scan tasks (the local bench), an explosion at scale. The threshold
#: is derived from the INPUT SIZE on the driver (staged-delta + touched
#: base dir file sizes), so the decision is scale-adaptive rather than
#: tuned to local[32]; below it the inputs fit in 1-2 scan tasks and
#: the write is naturally bounded. Override per deployment with
#: SPARK_GRAFT_WRITE_CLUSTER_BYTES.
WRITE_CLUSTER_BYTES = int(
    os.environ.get("SPARK_GRAFT_WRITE_CLUSTER_BYTES", str(256 * 1024 * 1024))
)


def _dir_bytes(*dirs: str) -> int:
    """Total parquet bytes across directories (driver-side listing of
    already-small immutable dirs; vanished dirs count 0)."""
    total = 0
    for d in dirs:
        try:
            entries = os.listdir(d)
        except OSError:
            continue
        for f in entries:
            if f.endswith(".parquet") and not f.startswith("."):
                try:
                    total += os.path.getsize(os.path.join(d, f))
                except OSError:
                    pass
    return total


class ConcurrentMergeError(RuntimeError):
    """Two merges rewrote the SAME partition concurrently — the loser's
    base read is stale and its result would clobber the winner's rows.
    Unlike disjoint-partition interleavings (auto-resolved by the
    commit retry) this needs the batch re-merged against the new base;
    re-running the same merge call is safe and idempotent."""


def _check_foreign_full_rewrite(table_dir: str, fresh: dict) -> None:
    """Refuse to rebase a merge over a foreign FULL-rewrite commit
    (restore / repartition): the per-partition conflict check compares
    only the merge's own touched pids, so a merge that merely CREATES a
    partition absent from both manifests would compose silently over a
    snapshot whose every other partition was replaced wholesale — the
    merge's base read is stale by definition (r06, ADVICE). Re-running
    the merge against the rewritten snapshot is safe and idempotent."""
    op = str(fresh.get("operation", ""))
    if op == "repartition" or op.startswith("restore("):
        raise ConcurrentMergeError(
            f"a concurrent '{op}' rewrote {table_dir} wholesale; "
            "re-run the merge against the new snapshot (idempotent)"
        )


def _check_key_type_stable(man: dict | None, changes: DataFrame, key: str):
    """Refuse a merge whose batch retypes the MERGE KEY: the partition
    id is xxhash64(key) and Spark's hash functions are type-sensitive
    (int 5 and long 5 hash differently), so a widened key would route
    existing keys to different partitions — a silent mispartition.
    Non-key columns widen freely; a key type change needs a full
    rewrite (repartition_snapshot on a re-typed copy)."""
    sch = _table_read_schema(man)
    if sch is None or key not in sch.fieldNames():
        return
    want = sch[key].dataType.typeName()
    got = changes.schema[key].dataType.typeName()
    if want != got:
        raise ValueError(
            f"merge key '{key}' arrives as {got} but the table was "
            f"created with {want}; hash partitioning is type-sensitive "
            f"— cast the change stream's key to {want} explicitly"
        )


def merge_into_partitioned_snapshot(
    spark: SparkSession,
    table_dir: str,
    changes: DataFrame,
    key: str,
    seq: str,
    num_partitions: int = 32,
    delete_when: str | None = None,
    marker_cols: tuple = (),
    update_set_all: bool = False,
    collect_stats: bool = True,
    app_meta: dict | None = None,
    assume_unique_keys: bool = False,
    pre_commit_check: tuple | None = None,
) -> None:
    """One partition-pruned MERGE step. Same semantics as
    ``merge_into_snapshot`` (update columns win per key, unmatched keys
    insert, untouched keys kept; ``delete_when`` rows tombstone their
    key — r05), different write cost: only the hash partitions of
    ``key`` present in the delta are read, merged, and rewritten as
    fresh immutable ``p-*`` directories; the new manifest reuses every
    untouched partition's directory as-is and commits with the atomic
    pointer flip — a crash at any point leaves the previous manifest
    fully readable (stranded part dirs are GC'd on the next merge) and
    the replayed batch re-merges idempotently. A partition emptied by
    deletes leaves the manifest entirely (its old dir stays readable
    for time travel until expired). The commit is CONDITIONAL (r05):
    if a concurrent merge lands between this merge's manifest read and
    its pointer flip, the commit retries on top of the intervening
    manifest when the two merges touched disjoint partitions, and
    raises :class:`ConcurrentMergeError` when they collided (stale base
    read — rerun the merge; Delta's WriteSerializable rule).

    ``num_partitions`` is fixed at table creation (stored in the
    manifest; the argument is ignored afterwards). Size it so one
    partition ~ a few GB at the target scale — the per-batch rewrite
    unit. One Spark job per merge: touched base partitions are unioned,
    merged against the delta, and written with partitionBy in a single
    pass.

    ``app_meta`` is an application-owned dict committed INSIDE this
    merge's manifest — it lands atomically with the data, or not at
    all. A commit that passes it replaces the previous value; a commit
    that omits it carries the previous manifest's value forward. The
    agg-view sync stamps the fold's target source version here: the
    crash witness that survives even a pure-tombstone fold, which
    leaves no ``__applied`` row behind (r09, ADVICE).

    ``assume_unique_keys`` (r10, guide §2.4) skips the latest-per-key
    window when the CALLER GUARANTEES at most one row per key in
    ``changes`` — true for every batch that is itself the output of a
    groupBy, a keyed diff, or a union of key-disjoint branches (the
    engine's own view folds, postings/band batches, index entries,
    SCD2 transition batches, and base seeds of tables with unique
    source keys). The staged write then sheds the window's
    shuffle+sort entirely (a column repartition on the target
    partition id replaces it, keeping one output file per partition
    dir) — at scale this removes an O(table) sort from every seed
    merge. Identical results only under the guarantee; a caller that
    lies lands duplicate key rows, so flip it only where uniqueness is
    structural. Set ``SPARK_GRAFT_MERGE_DEBUG=1`` to verify the
    guarantee per merge: an exact duplicate-key probe over the (small,
    already-staged) delta — one extra bounded job per merge, zero when
    unset — raises before anything commits (r11, VERDICT #7).

    ``pre_commit_check`` (r11, VERDICT #4) is ``(metrics, validator)``:
    ``metrics`` maps names to AGGREGATE Columns that ride the staged
    write's existing Observation (guide §1.2 — the batch plan executes
    once, the contract check is free), and ``validator(values)`` runs
    after staging but BEFORE anything commits — raising aborts the
    merge leaving only a GC-able staging dir, exactly like the NULL-key
    refusal. Metrics see the reduced delta (post latest-per-key, all
    rows including tombstones) with ``__part``/``__del`` attached.
    """
    from customer_segmentation_pyspark_spark.sources import versioned

    base_version = versioned.latest_version(table_dir)
    man = versioned.read_manifest(table_dir, base_version or None)
    if man is not None:
        num_partitions = int(man["num_partitions"])
        parts = dict(man["parts"])
        stats = dict(man.get("stats", {}))
        rows = dict(man.get("rows", {}))
        deltas = {p: list(v) for p, v in man.get("deltas", {}).items()}
        delta_stats = {
            p: list(v) for p, v in man.get("delta_stats", {}).items()
        }
        if man.get("key", key) != key:
            raise ValueError(
                f"table {table_dir} was created with merge key "
                f"'{man['key']}'; cannot merge on '{key}'"
            )
        versioned.gc_unreferenced_parts(table_dir)
        _check_key_type_stable(man, changes, key)
    else:
        base_version = 0
        parts = {}
        stats = {}
        rows = {}
        deltas = {}
        delta_stats = {}
    if app_meta is None and man is not None:
        app_meta = man.get("app_meta")
    orig_parts = dict(parts)
    orig_deltas = {p: tuple(v) for p, v in deltas.items()}

    # single-execution staging (r10, guide §1.2/§2.3): the old flow ran
    # the batch plan TWICE — a touched-partition discovery collect, then
    # the merged write — which is expensive exactly when the batch is a
    # CDF slice or a view fold (windows, anti-joins, point-reads). Stage
    # the reduced delta ONCE, split by target partition and tombstone
    # flag, with an Observation answering the NULL-key refusal inside
    # the same job; touched partitions fall out of the staging listing
    # (no extra job), and the merged write re-reads the small staged
    # parquet instead of re-running the batch plan. At scale this is
    # guide §8's rule: the delta is decided once, and only O(|delta|)
    # extra bytes are written for it.
    import shutil

    from pyspark.sql import Observation

    tomb = (
        F.coalesce(F.expr(delete_when), F.lit(False))
        if delete_when is not None
        else F.lit(False)
    )
    staged_df = (
        changes.withColumn("__part", _part_expr(key, num_partitions))
        .withColumn("__del", tomb.cast("int"))
        .drop(*marker_cols)
    )
    if assume_unique_keys:
        # caller-guaranteed one row per key: the latest-per-key window
        # (shuffle + sort + row_number) is pure overhead — a column
        # repartition on the target partition id replaces it, so the
        # write still gets one task (and one output file) per dir
        # instead of the no-exchange tasks x dirs file explosion
        staged_df = staged_df.repartition("__part")
    else:
        staged_df = _latest_per_key_clustered(staged_df, key, seq)
    dir_existed = os.path.isdir(table_dir)
    os.makedirs(table_dir, exist_ok=True)
    dstage = os.path.join(table_dir, f".staging-{uuid.uuid4().hex[:8]}")
    obs = Observation()
    metrics = [F.max(F.col(key).isNull()).alias("has_null")]
    if pre_commit_check is not None:
        metrics += [c.alias(nm) for nm, c in pre_commit_check[0].items()]
    (
        staged_df.observe(obs, *metrics)
        .write.mode("overwrite")
        .partitionBy("__part", "__del")
        .parquet(dstage)
    )

    def _abort_staging():
        # delete only what THIS merge created: the staging dir always,
        # the table dir only when it is still empty — dir_existed was
        # sampled BEFORE the (possibly long) staging job, and a
        # concurrent first merge may have committed into the dir since;
        # the old rmtree(table_dir) would have destroyed its committed
        # partitions and manifests (r11, ADVICE). os.rmdir fails
        # harmlessly when anything else landed.
        shutil.rmtree(dstage, ignore_errors=True)
        if not dir_existed:
            try:
                os.rmdir(table_dir)
            except OSError:
                pass

    vals = obs.get
    if vals["has_null"]:
        # NULL merge keys are undefined for an upsert: they never match
        # in the full-outer join (NULL == NULL is false), silently
        # accumulating one phantom row per batch. xxhash64(NULL) is the
        # seed hash — NOT null — so the partition id can't reveal them;
        # refuse loudly on the key itself (nothing was committed; the
        # staged dir is removed here and GC'd on the next merge anyway).
        _abort_staging()
        raise ValueError(
            f"merge key '{key}' contains NULLs; filter them before the "
            "merge or use a non-nullable key"
        )
    if pre_commit_check is not None:
        try:
            pre_commit_check[1](vals)
        except BaseException:
            _abort_staging()
            raise
    if assume_unique_keys and os.environ.get("SPARK_GRAFT_MERGE_DEBUG"):
        # exact duplicate-key probe over the already-staged delta (the
        # window that would have deduped was skipped): one extra
        # O(|delta|) job, debug-gated so production merges pay nothing
        dup = (
            spark.read.parquet(dstage)
            .groupBy(key)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dup:
            _abort_staging()
            raise ValueError(
                f"assume_unique_keys violated for {table_dir}: the "
                f"batch carries duplicate '{key}' rows (caught by "
                "SPARK_GRAFT_MERGE_DEBUG)"
            )
    touched = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(dstage)
        if d.startswith("__part=")
    )
    if not touched:
        # empty batch: leave no trace (the old flow returned before the
        # table dir was even created)
        _abort_staging()
        return

    new_entries: dict[str, str | None] = {}
    if man is None:
        # seed fast path: with no base to merge against, the staged
        # upsert dirs ARE the final partition contents (delete rows of a
        # brand-new table tombstone nothing, and ups/dels are disjoint
        # per key by latest-wins) — adopt them by rename, one Spark job
        # total for the whole seed instead of two full source passes
        schema_fields = [
            f
            for f in spark.read.parquet(dstage)
            .schema.jsonValue()["fields"]
            if f["name"] not in ("__part", "__del")
        ]
        for p in touched:
            src = os.path.join(dstage, f"__part={p}", "__del=0")
            if os.path.isdir(src):
                dest = f"p-{uuid.uuid4().hex[:12]}"
                os.rename(src, os.path.join(table_dir, dest))
                new_entries[str(p)] = dest
            else:
                new_entries[str(p)] = None
        shutil.rmtree(dstage, ignore_errors=True)
    else:
        staged = spark.read.parquet(dstage)
        ups = staged.filter(F.col("__del") == 0).drop("__part", "__del")
        dels = (
            staged.filter(F.col("__del") == 1).select(key)
            if delete_when is not None
            else None
        )
        # current state of the touched partitions: base dirs
        # (mergeSchema — dirs written before a schema-evolving merge
        # lack newer columns) overlaid with any MoR delta logs, which
        # this rewrite folds in
        base = _partition_state(
            spark,
            table_dir,
            man,
            [
                str(p)
                for p in touched
                if str(p) in parts or deltas.get(str(p))
            ],
        )
        if base is not None:
            merged = _merge_frames(
                base, ups, key, update_set_all=update_set_all
            )
        else:
            merged = ups
        if dels is not None:
            merged = merged.join(dels, key, "left_anti")
        schema_fields = merged.schema.jsonValue()["fields"]
        # carry columns that exist elsewhere in the table (this merge
        # read only the touched partitions) and keep the WIDEST type
        # per column across both sources
        schema_fields = _merge_schema_fields(
            schema_fields, man.get("schema", {}).get("fields", [])
        )
        merged = merged.withColumn("__part", _part_expr(key, num_partitions))
        src_dirs = [
            os.path.join(table_dir, parts[str(p)])
            for p in touched
            if str(p) in parts
        ]
        if _dir_bytes(dstage, *src_dirs) >= WRITE_CLUSTER_BYTES:
            # large rewrite: bound output files at one per dir (the
            # merged plan's partitioning is the JOIN key's, so without
            # this the partitionBy write emits tasks x dirs files)
            merged = merged.repartition("__part")

        staging = os.path.join(
            table_dir, f".staging-{uuid.uuid4().hex[:8]}"
        )
        merged.write.mode("overwrite").partitionBy("__part").parquet(
            staging
        )
        for p in touched:
            src = os.path.join(staging, f"__part={p}")
            if os.path.isdir(src):
                dest = f"p-{uuid.uuid4().hex[:12]}"
                os.rename(src, os.path.join(table_dir, dest))
                new_entries[str(p)] = dest
            else:
                # every row of this partition was deleted: partitionBy
                # wrote no dir, so the partition must LEAVE the manifest
                # — keeping the old mapping would resurrect the deleted
                # rows
                new_entries[str(p)] = None
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(dstage, ignore_errors=True)

    while True:
        for pid, dest in new_entries.items():
            # this rewrite folded in any MoR delta log the partition had
            deltas.pop(pid, None)
            delta_stats.pop(pid, None)
            if dest is None:
                parts.pop(pid, None)
                stats.pop(pid, None)
                rows.pop(pid, None)
            else:
                parts[pid] = dest
                # footer-derived data-skipping stats + row counts for
                # the fresh dir; untouched partitions keep their
                # previous entries. collect_stats=False skips the
                # per-column min/max pass (r06) — right for key-only
                # side tables (the index keymap) whose reads prune by
                # partition hash, never by value stats; absence only
                # disables stats pruning, never correctness.
                if collect_stats:
                    stats[pid] = versioned.collect_dir_stats(
                        os.path.join(table_dir, dest)
                    )
                else:
                    # never carry the REPLACED dir's stats — stale
                    # bounds would over-prune reads
                    stats.pop(pid, None)
                rows[pid] = versioned.collect_dir_rowcount(
                    os.path.join(table_dir, dest)
                )
        import time as _time

        v = versioned.commit_manifest(
            table_dir,
            {
                "num_partitions": num_partitions,
                "key": key,
                "parts": parts,
                "stats": stats,
                "rows": rows,
                "deltas": {p: lst for p, lst in deltas.items() if lst},
                "delta_stats": {
                    p: lst
                    for p, lst in delta_stats.items()
                    if deltas.get(p)
                },
                # full-table schema at this version (union-of-columns
                # after evolution) — lets fully-pruned reads build an
                # empty result without touching any part dir
                "schema": {"type": "struct", "fields": schema_fields},
                "operation": "merge",
                "committed_at": _time.time(),
                **({"app_meta": app_meta} if app_meta is not None else {}),
            },
            expected_latest=base_version,
        )
        if v > 0:
            return
        # a foreign commit landed between our manifest read and the
        # flip; rebase onto it when the partition sets are disjoint
        fresh_v = versioned.latest_version(table_dir)
        try:
            fresh = versioned.read_manifest(table_dir, fresh_v)
        except FileNotFoundError:
            # a concurrent committer's withdrawn OCC manifest can leave
            # the pointer transiently referencing a deleted file (r06,
            # ADVICE) — same guard as compact_mor_partitions
            continue
        if int(fresh.get("num_partitions", num_partitions)) != num_partitions:
            # a foreign repartition changed the hash modulus: our
            # staged dirs were bucketed with the OLD modulus, so
            # composing them would put keys in wrong-hash partitions
            # and break point-lookup pruning / overlay folds (r06,
            # ADVICE). Full rewrites (restore/repartition) likewise
            # invalidate the state this merge was computed from.
            raise ConcurrentMergeError(
                f"{table_dir} was repartitioned concurrently "
                f"({num_partitions} -> {fresh['num_partitions']} hash "
                "partitions); re-run the merge (idempotent)"
            )
        _check_foreign_full_rewrite(table_dir, fresh)
        conflicted = [
            p
            for p in new_entries
            if fresh["parts"].get(p) != orig_parts.get(p)
            or tuple(fresh.get("deltas", {}).get(p, ()))
            != orig_deltas.get(p, ())
        ]
        if conflicted:
            raise ConcurrentMergeError(
                f"partitions {sorted(conflicted)} of {table_dir} were "
                "rewritten concurrently; re-run the merge (idempotent)"
            )
        parts = dict(fresh["parts"])
        stats = dict(fresh.get("stats", {}))
        rows = dict(fresh.get("rows", {}))
        deltas = {p: list(v) for p, v in fresh.get("deltas", {}).items()}
        delta_stats = {
            p: list(v) for p, v in fresh.get("delta_stats", {}).items()
        }
        # keep evolved columns/types a foreign merge may have added
        schema_fields = _merge_schema_fields(
            schema_fields, fresh.get("schema", {}).get("fields", [])
        )
        base_version = fresh_v


# ---------------------------------------------------------------------------
# Merge-on-read (r05, VERDICT #2): the copy-on-write merge above rewrites
# O(touched partitions) of DATA per batch — still heavy when a tiny change
# stream drips into huge partitions. The MoR twin appends each batch as a
# small immutable delta dir per touched partition (O(|delta|) write, base
# untouched) and defers the merge to READ time: base rows are overlaid
# with the partition's delta log, latest-wins per key with the same
# per-column coalesce semantics as _merge_frames, tombstones honored.
# compact_mor_partitions folds a partition's log back into its base dir —
# the Delta deletion-vector / Iceberg merge-on-read shape at parquet+JSON
# level. Manifest extension: {"deltas": {pid: [dir, ...]}} oldest-first.
# ---------------------------------------------------------------------------


def _partition_state(
    spark: SparkSession, table_dir: str, man: dict, pids: list[str]
) -> DataFrame | None:
    """Current rows of the given partitions: base dirs overlaid with
    their delta logs. Returns None when the partitions hold nothing.

    Replay semantics per key, ordered base (ord -1) -> deltas
    (oldest 0 .. newest n): an upsert row replaces the row per column
    with NULL-keeps-old (exactly ``_merge_frames``' coalesce); a
    tombstone kills everything at-or-before it, so a later re-insert
    starts fresh with no column carry-over — the fold a sequential CoW
    application would produce, expressed as two windows over one
    key-shuffle: last-tombstone filter, then first-non-null per column
    scanning newest-first. Keys never cross hash partitions, so
    per-partition delta ordinals are globally safe."""
    key = man["key"]
    deltas = man.get("deltas", {})
    base_dirs = [man["parts"][p] for p in pids if p in man["parts"]]
    delta_dirs = [d for p in pids for d in deltas.get(p, [])]
    # explicit manifest schema (when recorded): old narrow/short files
    # up-cast and missing evolved columns surface as typed NULLs —
    # covers both halves of schema evolution in one read
    data_schema = _table_read_schema(man)
    tomb_schema = _table_read_schema(man, with_tomb=True)

    def _read(paths, with_tomb):
        r = spark.read
        sch = tomb_schema if with_tomb else data_schema
        if sch is not None:
            r = r.schema(sch)
        else:
            r = r.option("mergeSchema", "true")
        return r.parquet(*paths)

    base = (
        _read([os.path.join(table_dir, d) for d in base_dirs], False)
        if base_dirs
        else None
    )
    if not delta_dirs:
        return base
    # ordinal = position in the partition's own log; dirs from different
    # partitions may share an ordinal but never a key — so all dirs at
    # the same log position scan as ONE read (plan size O(max log
    # depth), not O(partitions x depth))
    by_ord: dict[int, list[str]] = {}
    for p in pids:
        for i, d in enumerate(deltas.get(p, [])):
            by_ord.setdefault(i, []).append(os.path.join(table_dir, d))
    frames = [
        _read(by_ord[i], True).withColumn("__ord", F.lit(i))
        for i in sorted(by_ord)
    ]
    return _overlay_fold(
        base,
        frames,
        key,
        order=[f["name"] for f in man.get("schema", {}).get("fields", [])],
    )


def _overlay_fold(base, delta_frames, key, order=None):
    """The MoR replay fold, shared by the partition-state reader and
    the append-only CDF fast path: base rows (ord -1) overlaid with
    pre-tagged (__ord, __tomb) delta frames — last-tombstone filter,
    then first-non-null per column scanning newest-first (the exact
    sequential-CoW coalesce semantics)."""
    frames = []
    if base is not None:
        frames.append(
            base.withColumn("__ord", F.lit(-1)).withColumn(
                "__tomb", F.lit(False)
            )
        )
    frames.extend(delta_frames)
    allr = frames[0]
    for f in frames[1:]:
        allr = allr.unionByName(f, allowMissingColumns=True)
    data_cols = [c for c in allr.columns if c not in ("__ord", "__tomb", key)]
    wk = Window.partitionBy(key)
    last_tomb = F.max(
        F.when(F.col("__tomb"), F.col("__ord"))
    ).over(wk)
    live = allr.withColumn("__lt", last_tomb).filter(
        ~F.col("__tomb")
        & (F.col("__lt").isNull() | (F.col("__ord") > F.col("__lt")))
    )
    wd = Window.partitionBy(key).orderBy(F.col("__ord").desc())
    wfull = wd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    picked = live.select(
        F.col(key),
        F.row_number().over(wd).alias("__rn"),
        *[
            F.first(F.col(c), ignorenulls=True).over(wfull).alias(c)
            for c in data_cols
        ],
    )
    out = picked.filter(F.col("__rn") == 1).drop("__rn")
    if order and set(order) <= set(out.columns):
        out = out.select(*order)
    return out


def merge_mor_into_partitioned_snapshot(
    spark: SparkSession,
    table_dir: str,
    changes: DataFrame,
    key: str,
    seq: str,
    num_partitions: int = 32,
    delete_when: str | None = None,
    marker_cols: tuple = (),
    auto_compact_logs: int | None = None,
    assume_unique_keys: bool = False,
) -> None:
    """Merge-on-read MERGE step: identical semantics to
    ``merge_into_partitioned_snapshot`` (latest-wins per key by ``seq``,
    per-column NULL-keeps-old, ``delete_when`` tombstones), but the
    write is O(|delta|): the reduced batch lands as one small immutable
    ``d-*`` dir per touched partition, APPENDED to the partition's
    delta log in the manifest — no base partition is read or rewritten.
    Readers pay the overlay join instead (``_partition_state``); run
    :func:`compact_mor_partitions` when a log grows past taste.

    Concurrency: delta appends COMPOSE — a conditional-commit conflict
    is resolved by rebasing the append onto the intervening manifest
    (commit order defines the log order, the Delta blind-append rule),
    so unlike the CoW merge this never raises ConcurrentMergeError.
    Crash-safe and idempotent like the CoW path: a replayed batch
    re-appends the same latest-per-key rows, and replaying an upsert
    over itself is a no-op at read time.

    ``auto_compact_logs`` (r07): an unattended MoR pipeline otherwise
    accretes delta logs until an operator compacts — pass N to fold
    back, after this merge's commit, every partition whose log has
    grown past N entries (:func:`compact_mor_partitions` with
    ``min_log_len=N+1``); partitions under the threshold keep their
    cheap append-only cadence. The fold commit is conditional per
    partition, so a concurrent appender simply wins that pass."""
    from customer_segmentation_pyspark_spark.sources import versioned

    base_version = versioned.latest_version(table_dir)
    man = versioned.read_manifest(table_dir, base_version or None)
    if man is not None:
        num_partitions = int(man["num_partitions"])
        parts = dict(man["parts"])
        stats = dict(man.get("stats", {}))
        rows = dict(man.get("rows", {}))
        deltas = {p: list(v) for p, v in man.get("deltas", {}).items()}
        delta_stats = {
            p: list(v) for p, v in man.get("delta_stats", {}).items()
        }
        schema_fields = list(man.get("schema", {}).get("fields", []))
        if man.get("key", key) != key:
            raise ValueError(
                f"table {table_dir} was created with merge key "
                f"'{man['key']}'; cannot merge on '{key}'"
            )
        versioned.gc_unreferenced_parts(table_dir)
        _check_key_type_stable(man, changes, key)
    else:
        base_version = 0
        parts, stats, rows, deltas = {}, {}, {}, {}
        delta_stats = {}
        schema_fields = []

    # single-execution staging (r10, guide §1.2): the MoR append already
    # wrote the reduced delta to a staging dir — fold the old discovery
    # collect (a second full batch-plan execution) into that same write:
    # an Observation answers the NULL-key refusal, and the touched
    # partitions fall out of the staging directory listing.
    import shutil

    from pyspark.sql import Observation

    delta = changes.withColumn("__part", _part_expr(key, num_partitions))
    if not assume_unique_keys:
        # dir-clustered dedup (see _latest_per_key_clustered): same
        # latest-per-key result, write-ready hashpartitioning(__part)
        delta = _latest_per_key_clustered(delta, key, seq)
    cond = (
        F.coalesce(F.expr(delete_when), F.lit(False))
        if delete_when is not None
        else F.lit(False)
    )
    dd = delta.withColumn("__tomb", cond).drop(*marker_cols)
    if assume_unique_keys:
        # same rationale as the CoW flag: no window to repartition the
        # write, so do it explicitly (one task/file per delta dir)
        dd = dd.repartition("__part")

    # evolved full-table schema: existing fields + new upsert columns,
    # shared columns widened along the safe chains
    schema_fields = _merge_schema_fields(
        schema_fields,
        dd.drop("__part", "__tomb").schema.jsonValue()["fields"],
    )

    dir_existed = os.path.isdir(table_dir)
    os.makedirs(table_dir, exist_ok=True)
    staging = os.path.join(table_dir, f".staging-{uuid.uuid4().hex[:8]}")
    obs = Observation()
    dd.observe(
        obs, F.max(F.col(key).isNull()).alias("has_null")
    ).write.mode("overwrite").partitionBy("__part").parquet(staging)

    def _abort_staging():
        # same cleanup discipline as the CoW path (r11, ADVICE): remove
        # only this merge's staging dir; the table dir goes only via
        # os.rmdir, which fails harmlessly if a concurrent first merge
        # committed into it during the staging job
        shutil.rmtree(staging, ignore_errors=True)
        if not dir_existed:
            try:
                os.rmdir(table_dir)
            except OSError:
                pass

    if obs.get["has_null"]:
        _abort_staging()
        raise ValueError(
            f"merge key '{key}' contains NULLs; filter them before the "
            "merge or use a non-nullable key"
        )
    if assume_unique_keys and os.environ.get("SPARK_GRAFT_MERGE_DEBUG"):
        # debug-gated exact duplicate-key probe (see the CoW twin)
        dup = (
            spark.read.parquet(staging)
            .groupBy(key)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dup:
            _abort_staging()
            raise ValueError(
                f"assume_unique_keys violated for {table_dir}: the "
                f"batch carries duplicate '{key}' rows (caught by "
                "SPARK_GRAFT_MERGE_DEBUG)"
            )
    new_dirs: dict[str, str] = {}
    for d in sorted(os.listdir(staging)):
        if not d.startswith("__part="):
            continue
        p = int(d.split("=", 1)[1])
        dest = f"d-{uuid.uuid4().hex[:12]}"
        os.rename(os.path.join(staging, d), os.path.join(table_dir, dest))
        new_dirs[str(p)] = dest
    shutil.rmtree(staging, ignore_errors=True)
    if not new_dirs:
        if not dir_existed:
            try:
                os.rmdir(table_dir)
            except OSError:
                pass
        return

    new_dir_stats = {
        pid: versioned.collect_dir_stats(os.path.join(table_dir, dest))
        for pid, dest in new_dirs.items()
    }
    while True:
        for pid, dest in new_dirs.items():
            deltas.setdefault(pid, []).append(dest)
            # footer stats per DELTA dir: where-pruning stays exact on
            # logged partitions (a dir-count mismatch disables pruning
            # for that partition, never correctness)
            delta_stats.setdefault(pid, []).append(new_dir_stats[pid])
        import time as _time

        nxt = {
            "num_partitions": num_partitions,
            "key": key,
            "parts": parts,
            "stats": stats,
            "rows": rows,
            "deltas": {p: v for p, v in deltas.items() if v},
            "delta_stats": {
                p: v for p, v in delta_stats.items() if deltas.get(p)
            },
            "schema": {"type": "struct", "fields": schema_fields},
            "operation": "mor-append",
            "committed_at": _time.time(),
        }
        v = versioned.commit_manifest(
            table_dir, nxt, expected_latest=base_version
        )
        if v > 0:
            if auto_compact_logs is not None:
                compact_mor_partitions(
                    spark, table_dir, min_log_len=auto_compact_logs + 1
                )
            return
        # rebase the append onto the intervening commit (appends compose)
        fresh_v = versioned.latest_version(table_dir)
        try:
            fresh = versioned.read_manifest(table_dir, fresh_v)
        except FileNotFoundError:
            # transiently-withdrawn OCC manifest (r06, ADVICE) — re-read
            continue
        if int(fresh.get("num_partitions", num_partitions)) != num_partitions:
            # appends do NOT compose across a repartition: our delta
            # dirs are keyed by pids from the OLD modulus (r06, ADVICE)
            raise ConcurrentMergeError(
                f"{table_dir} was repartitioned concurrently "
                f"({num_partitions} -> {fresh['num_partitions']} hash "
                "partitions); re-run the merge (idempotent)"
            )
        _check_foreign_full_rewrite(table_dir, fresh)
        parts = dict(fresh["parts"])
        stats = dict(fresh.get("stats", {}))
        rows = dict(fresh.get("rows", {}))
        deltas = {p: list(v) for p, v in fresh.get("deltas", {}).items()}
        delta_stats = {
            p: list(v) for p, v in fresh.get("delta_stats", {}).items()
        }
        schema_fields = _merge_schema_fields(
            list(fresh.get("schema", {}).get("fields", [])), schema_fields
        )
        base_version = fresh_v


def compact_mor_partitions(
    spark: SparkSession, table_dir: str, min_log_len: int = 1
) -> list[str]:
    """Fold each partition's delta log back into its base dir (the MoR
    maintenance job): ONE Spark job materializes ``_partition_state``
    over every logged partition and partitionBy-splits it into fresh
    immutable ``p-*`` dirs, then commits ``parts[pid]=new,
    deltas[pid]=[]`` conditionally — a partition whose (base, log)
    changed since the read is dropped this pass (the concurrent writer
    won; its appended delta must not be folded from a stale read), and
    a partition whose log deleted every row leaves the manifest like
    the CoW empty-partition rule. Data cost is O(partitions with
    deltas); read-side plans over folded partitions drop the overlay
    join entirely. Historical manifests keep referencing the old
    base+delta dirs, so time travel survives until expiry. Returns the
    partition ids folded AND committed.

    ``min_log_len`` (r07) restricts the fold to partitions whose log
    has at least that many entries — the auto-compact policy's
    threshold knob (default 1 = every logged partition, the original
    behavior)."""
    from customer_segmentation_pyspark_spark.sources import versioned

    man = versioned.read_manifest(table_dir)
    if man is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    logged = sorted(
        p
        for p, log in man.get("deltas", {}).items()
        if len(log) >= min_log_len
    )
    if not logged:
        return []
    # ONE Spark job folds every logged partition: keys never cross hash
    # partitions, so the combined overlay is exact, and partitionBy
    # splits the output back into per-partition immutable dirs
    state = _partition_state(spark, table_dir, man, logged)
    key = man["key"]
    num_partitions = int(man["num_partitions"])
    staging = os.path.join(table_dir, f".staging-{uuid.uuid4().hex[:8]}")
    state = state.withColumn("__part", _part_expr(key, num_partitions))
    fold_src = [
        os.path.join(table_dir, d)
        for p in logged
        for d in [man["parts"].get(p), *man.get("deltas", {}).get(p, [])]
        if d
    ]
    if _dir_bytes(*fold_src) >= WRITE_CLUSTER_BYTES:
        # large fold: bound output files at one per dir (guide §6)
        state = state.repartition("__part")
    state.write.mode("overwrite").partitionBy("__part").parquet(staging)
    folds: dict[str, tuple] = {}
    for pid in logged:
        src = os.path.join(staging, f"__part={pid}")
        if os.path.isdir(src):
            dest = f"p-{uuid.uuid4().hex[:12]}"
            os.rename(src, os.path.join(table_dir, dest))
        else:
            dest = None  # the log deleted every row of this partition
        folds[pid] = (
            man["parts"].get(pid),
            tuple(man["deltas"][pid]),
            dest,
        )
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    while True:
        cur_v = versioned.latest_version(table_dir)
        try:
            cur = versioned.read_manifest(table_dir, cur_v)
        except FileNotFoundError:
            continue
        parts = dict(cur["parts"])
        stats = dict(cur.get("stats", {}))
        rows = dict(cur.get("rows", {}))
        deltas = {p: list(v) for p, v in cur.get("deltas", {}).items()}
        delta_stats = {
            p: list(v) for p, v in cur.get("delta_stats", {}).items()
        }
        surviving = []
        for pid, (src_base, src_log, dest) in folds.items():
            if parts.get(pid) != src_base or tuple(
                deltas.get(pid, ())
            ) != src_log:
                continue  # a concurrent writer won this partition
            if dest is None:
                # the log deleted every row: the partition leaves the
                # manifest entirely (mirrors the CoW empty-part rule)
                parts.pop(pid, None)
                stats.pop(pid, None)
                rows.pop(pid, None)
                deltas.pop(pid, None)
                delta_stats.pop(pid, None)
                surviving.append(pid)
            elif os.path.isdir(os.path.join(table_dir, dest)):
                parts[pid] = dest
                stats[pid] = versioned.collect_dir_stats(
                    os.path.join(table_dir, dest)
                )
                rows[pid] = versioned.collect_dir_rowcount(
                    os.path.join(table_dir, dest)
                )
                deltas.pop(pid, None)
                delta_stats.pop(pid, None)
                surviving.append(pid)
        if not surviving:
            return []
        import time as _time

        nxt = dict(cur)
        nxt["parts"] = parts
        nxt["stats"] = stats
        nxt["rows"] = rows
        nxt["deltas"] = {p: v for p, v in deltas.items() if v}
        nxt["delta_stats"] = {
            p: v for p, v in delta_stats.items() if deltas.get(p)
        }
        nxt["operation"] = "mor-fold"
        nxt["committed_at"] = _time.time()
        v = versioned.commit_manifest(table_dir, nxt, expected_latest=cur_v)
        if v > 0:
            return sorted(surviving)


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
    partitions_in=None,
) -> tuple[dict, list[str], list[str]]:
    """The pruning decision, separated for testability: returns
    (manifest, kept partition ids, kept dir names) after key-based and
    stats-based pruning."""
    from customer_segmentation_pyspark_spark.sources import versioned

    man = versioned.read_manifest(table_dir, version)
    if man is None or not (man["parts"] or man.get("deltas")):
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    if where:
        for c, op, v in where:
            if op not in _WHERE_OPS:
                raise ValueError(
                    f"unsupported where op {op!r}; use one of "
                    f"{sorted(_WHERE_OPS)}"
                )
    # a partition can live in base dirs, in a pure MoR delta log, or both
    pids = sorted(set(man["parts"]) | set(man.get("deltas", {})))
    if partitions_in is not None:
        keep = {str(p) for p in partitions_in}
        pids = [p for p in pids if p in keep]
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
        if man.get("schema") is not None:
            from pyspark.sql.types import StructType

            ktype = StructType.fromJson(man["schema"])[key].dataType
        else:
            any_dir = os.path.join(
                table_dir, man["parts"][sorted(man["parts"])[0]]
            )
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
        deltas = man.get("deltas", {})
        dstats = man.get("delta_stats", {})

        def _pid_may_match(p: str) -> bool:
            # a partition survives pruning unless EVERY dir that could
            # contribute a value — its base dir AND each delta-log dir
            # — is provably disjoint from the predicate (overlay values
            # always come from one of the stored dirs, so the union of
            # their ranges bounds the merged rows); a delta log without
            # complete per-dir stats disables pruning for the partition
            checks = []
            if p in man["parts"]:
                checks.append(stats.get(p, {}))
            log = deltas.get(p) or []
            if log:
                ds = dstats.get(p) or []
                if len(ds) != len(log):
                    return True
                checks.extend(ds)
            if not checks:
                return True
            return any(
                all(_dir_may_match(st, c, op, v) for c, op, v in where)
                for st in checks
            )

        pids = [p for p in pids if _pid_may_match(p)]
    return man, pids, [man["parts"][p] for p in pids if p in man["parts"]]


def read_partitioned_snapshot(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    where: list[tuple] | None = None,
    key_in: list | None = None,
    partitions_in: list | None = None,
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
    pruning is never load-bearing for correctness.

    ``partitions_in=[pid, ...]`` is DIFFERENT: an explicit projection
    onto the named hash partitions (ids as stored in the manifest) —
    rows outside them are genuinely absent from the result, so this is
    load-bearing by design. It exists for maintained secondary
    structures that track partition ids themselves (the join-view
    inverted map, r07): the caller proves the excluded partitions
    cannot contain rows it needs, and the reader never lists their
    directories."""
    man, pids, dirs = _snapshot_read_plan(
        spark, table_dir, version, where, key_in, partitions_in
    )
    if any(man.get("deltas", {}).get(p) for p in pids):
        # MoR overlay: at least one kept partition has a pending delta
        # log — merge base+log at read (only for the kept partitions;
        # fully-folded tables never take this branch)
        df = _partition_state(spark, table_dir, man, pids)
    elif dirs:
        # explicit manifest schema when recorded (narrow files up-cast,
        # pre-evolution files surface typed NULLs); mergeSchema is the
        # pre-r05 fallback
        sch = _table_read_schema(man)
        reader = (
            spark.read.schema(sch)
            if sch is not None
            else spark.read.option("mergeSchema", "true")
        )
        df = reader.parquet(*[os.path.join(table_dir, d) for d in dirs])
    elif man.get("schema") is not None:
        # everything pruned: empty result with the full-table schema
        # straight from the manifest — zero part dirs touched (r05,
        # ADVICE: the old path footer-read EVERY dir exactly when
        # nothing needed reading)
        from pyspark.sql.types import StructType

        df = spark.createDataFrame([], StructType.fromJson(man["schema"]))
    else:
        # pre-r05 manifest without a schema record: one dir suffices —
        # every merge writes union-of-columns to the dirs it touches,
        # so the newest dir carries the fully-evolved schema
        newest = max(
            man["parts"].values(),
            key=lambda d: os.path.getmtime(os.path.join(table_dir, d)),
        )
        df = spark.read.option("mergeSchema", "true").parquet(
            os.path.join(table_dir, newest)
        ).filter(F.lit(False))
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


def _append_only_changes(
    spark: SparkSession, table_dir: str, man_a: dict, man_b: dict, key: str
) -> DataFrame | None:
    """CDF fast path for the MoR append cadence: None unless man_b is
    man_a plus appended delta-log entries (same base dirs, every old
    log a prefix of the new one). The appended dirs alone name every
    key that can have changed, so the pre-state is reduced to those
    keys with a semi-join before the diff — join work O(|appended|),
    not O(partition state)."""
    if man_a["parts"] != man_b["parts"]:
        return None
    da = {p: list(v) for p, v in man_a.get("deltas", {}).items()}
    db = {p: list(v) for p, v in man_b.get("deltas", {}).items()}
    appended: dict[str, tuple[int, list[str]]] = {}
    for pid in set(da) | set(db):
        la, lb = da.get(pid, []), db.get(pid, [])
        if lb[: len(la)] != la:
            return None  # a fold or rewrite happened — not append-only
        if len(lb) > len(la):
            appended[pid] = (len(la), lb[len(la):])
    if not appended:
        return None
    tomb_schema = _table_read_schema(man_b, with_tomb=True)
    by_ord: dict[int, list[str]] = {}
    for pid, (off, dirs) in appended.items():
        for i, d in enumerate(dirs):
            by_ord.setdefault(off + i, []).append(
                os.path.join(table_dir, d)
            )
    frames = []
    for i in sorted(by_ord):
        r = (
            spark.read.schema(tomb_schema)
            if tomb_schema is not None
            else spark.read.option("mergeSchema", "true")
        )
        frames.append(r.parquet(*by_ord[i]).withColumn("__ord", F.lit(i)))
    allnew = frames[0].select(key)
    for f in frames[1:]:
        allnew = allnew.unionByName(f.select(key))
    keys = allnew.distinct()
    old_full = _partition_state(spark, table_dir, man_a, sorted(appended))
    old_small = (
        old_full.join(keys, key, "left_semi")
        if old_full is not None
        else None
    )
    order = [f["name"] for f in (man_b.get("schema") or {}).get("fields", [])]
    new_small = _overlay_fold(old_small, frames, key, order=order)
    return _cdf_diff(old_small, new_small, key)


def read_snapshot_changes(
    spark: SparkSession,
    table_dir: str,
    from_version: int,
    to_version: int | None = None,
    fast_append: bool = True,
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
    that produced the changes. When the two versions differ ONLY by
    appended MoR delta logs (the high-frequency CDC cadence), the
    append-only fast path (r05) skips materializing both full states:
    the appended rows name their keys, the pre-state is semi-joined
    down to those keys, and the diff joins O(|delta|) rows instead of
    full-outer-joining two partition-sized states (``fast_append=False``
    forces the generic path — the equality of the two is
    property-tested). Column evolution between the versions is
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
    def _pids(man):
        return set(man["parts"]) | set(man.get("deltas", {}))

    changed = [
        pid
        for pid in _pids(man_a) | _pids(man_b)
        if man_a["parts"].get(pid) != man_b["parts"].get(pid)
        or man_a.get("deltas", {}).get(pid)
        != man_b.get("deltas", {}).get(pid)
    ]

    def _side(man, pids):
        # base+delta overlay per version: a MoR append changes a
        # partition's delta log without touching its base dir, and the
        # diff must see the merged state on both sides
        keep = [p for p in pids if p in man["parts"] or man.get("deltas", {}).get(p)]
        if not keep:
            return None
        return _partition_state(spark, table_dir, man, sorted(keep))

    if fast_append:
        fast = _append_only_changes(spark, table_dir, man_a, man_b, key)
        if fast is not None:
            return fast
    old, new = _side(man_a, changed), _side(man_b, changed)
    if old is None and new is None:  # no structural change at all
        empty = _side(man_b, sorted(_pids(man_b)))
        return empty.filter(F.lit(False)).withColumn(
            "_change_type", F.lit("")
        )
    return _cdf_diff(old, new, key)


def _cdf_diff(old, new, key) -> DataFrame:
    """Row-level diff of two keyed states into the Delta-CDF change
    rows; either side may be None (treated as empty with the other's
    schema)."""
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


def streaming_mor_upsert(
    spark: SparkSession,
    updates: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    key: str,
    seq: str,
    num_partitions: int = 32,
    delete_when: str | None = None,
    marker_cols: tuple = (),
):
    """``streaming_partitioned_upsert`` with the merge-on-read write
    path: each micro-batch appends O(|batch|) delta logs instead of
    rewriting partitions — the natural sink for a high-frequency CDC
    stream into a huge snapshot (run :func:`compact_mor_partitions` on
    a maintenance cadence). Exactly-once like the CoW wrapper: a
    replayed batch re-appends the same latest-per-key rows, and replay
    of an upsert/tombstone over itself is a read-time no-op."""

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_mor_into_partitioned_snapshot(
            spark,
            table_dir,
            batch_df,
            key,
            seq,
            num_partitions,
            delete_when=delete_when,
            marker_cols=marker_cols,
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
    Delta OPTIMIZE conflict rule.

    The commit itself is CONDITIONAL (r05, ADVICE): the new manifest is
    built from the manifest read at validation time, so if a foreign
    commit lands between that read and the pointer flip, committing
    unconditionally would revert it for EVERY partition, not just the
    conflicted ones. ``commit_manifest(..., expected_latest=...)``
    detects the interleaving (the allocated version isn't read+1),
    withdraws, and this loop re-reads + re-validates against the
    intervening manifest — so a concurrent merge can cost a rewrite its
    conflicted partitions but can never be un-committed. Returns the
    partition ids that landed; commits nothing when none survive."""
    from customer_segmentation_pyspark_spark.sources import versioned

    while True:
        cur_v = versioned.latest_version(table_dir)
        try:
            cur = versioned.read_manifest(table_dir, cur_v)
        except FileNotFoundError:
            continue  # pointer raced a withdrawn commit; re-resolve
        nxt = dict(cur)  # carry num_partitions/key/schema/future fields
        parts = dict(cur["parts"])
        stats = dict(cur.get("stats", {}))
        rows = dict(cur.get("rows", {}))
        surviving: list[str] = []
        for pid, (src, dest) in rewrites.items():
            if parts.get(pid) == src and os.path.isdir(
                os.path.join(table_dir, dest)
            ):
                parts[pid] = dest
                stats[pid] = versioned.collect_dir_stats(
                    os.path.join(table_dir, dest)
                )
                rows[pid] = versioned.collect_dir_rowcount(
                    os.path.join(table_dir, dest)
                )
                surviving.append(pid)
        if not surviving:
            return []
        import time as _time

        nxt["parts"] = parts
        nxt["stats"] = stats
        nxt["rows"] = rows
        nxt["operation"] = "rewrite"
        nxt["committed_at"] = _time.time()
        v = versioned.commit_manifest(table_dir, nxt, expected_latest=cur_v)
        if v > 0:
            return sorted(surviving)
        # foreign commit intervened — loop re-validates against it


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


def repartition_snapshot(
    spark: SparkSession, table_dir: str, new_num_partitions: int
) -> None:
    """Partition evolution: rewrite the snapshot under a NEW hash
    partition count — the escape hatch from "num_partitions is fixed
    at table creation" when a table outgrows (or never needed) its
    rewrite unit. One Spark job reads the current state (any MoR logs
    fold in), re-buckets by the same key expression with the new
    modulus, and commits a full manifest conditionally — concurrent
    merges conflict by definition (every partition is rewritten), so
    an intervening commit raises :class:`ConcurrentMergeError`; run it
    in a maintenance window like Iceberg's rewrite with a changed
    partition spec. Historical versions keep their old layout and stay
    readable; point-lookup pruning keeps working on both sides because
    the partition id is always recomputed from the manifest's OWN
    num_partitions. Content is preserved row-for-row; cost is
    O(snapshot) — this is a rewrite, not a merge."""
    from customer_segmentation_pyspark_spark.sources import versioned

    if new_num_partitions < 1:
        raise ValueError("new_num_partitions must be >= 1")
    base_version = versioned.latest_version(table_dir)
    man = versioned.read_manifest(table_dir, base_version or None)
    if man is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    key = man["key"]
    pids = sorted(set(man["parts"]) | set(man.get("deltas", {})))
    state = _partition_state(spark, table_dir, man, pids)
    staging = os.path.join(table_dir, f".staging-{uuid.uuid4().hex[:8]}")
    state = state.withColumn("__part", _part_expr(key, new_num_partitions))
    all_src = [
        os.path.join(table_dir, d)
        for p in pids
        for d in [man["parts"].get(p), *man.get("deltas", {}).get(p, [])]
        if d
    ]
    if _dir_bytes(*all_src) >= WRITE_CLUSTER_BYTES:
        # O(snapshot) rewrite: bound output files at one per new dir
        state = state.repartition("__part")
    state.write.mode("overwrite").partitionBy("__part").parquet(staging)
    parts: dict[str, str] = {}
    stats: dict[str, dict] = {}
    rows: dict[str, int] = {}
    for entry in sorted(os.listdir(staging)):
        if not entry.startswith("__part="):
            continue
        pid = entry.split("=", 1)[1]
        dest = f"p-{uuid.uuid4().hex[:12]}"
        os.rename(os.path.join(staging, entry), os.path.join(table_dir, dest))
        parts[pid] = dest
        stats[pid] = versioned.collect_dir_stats(
            os.path.join(table_dir, dest)
        )
        rows[pid] = versioned.collect_dir_rowcount(
            os.path.join(table_dir, dest)
        )
    import shutil
    import time as _time

    shutil.rmtree(staging, ignore_errors=True)
    nxt = {
        "num_partitions": new_num_partitions,
        "key": key,
        "parts": parts,
        "stats": stats,
        "rows": rows,
        "schema": man.get("schema") or state.schema.jsonValue(),
        "operation": "repartition",
        "committed_at": _time.time(),
    }
    v = versioned.commit_manifest(table_dir, nxt, expected_latest=base_version)
    if v < 0:
        raise ConcurrentMergeError(
            f"a concurrent commit landed on {table_dir} during the "
            "repartition; re-run it in a quiet window (idempotent)"
        )


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
