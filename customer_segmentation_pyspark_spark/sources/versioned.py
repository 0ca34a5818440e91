"""Versioned parquet tables with atomic pointer commits — time travel
for the engine's managed outputs (a lakehouse-format-lite built on the
same crash-safety ideas as sinks.crash_safe_swap, but APPEND-ONLY:
versions are immutable directories, so there is no rename gap at all).

Layout:
    table_dir/
      v1/ v2/ ... vN/     immutable parquet snapshots
      _LATEST              text file holding "N" — the only mutable file

Commit protocol: write the new snapshot under an invisible ``.staging-*``
name, fsync-rename it to ``vN``, then atomically replace ``_LATEST``
(os.replace — POSIX atomic). A crash at ANY point leaves either the old
pointer (new version invisible, stranded staging dir cleaned on next
write) or the new pointer (fully committed). Readers resolve the pointer
once, then only ever touch an immutable directory — no torn reads.

At cluster scale the pointer lives in an object store with
put-if-absent / conditional-put (the same role Delta's _last_checkpoint
or Iceberg's version-hint file plays); the protocol is unchanged.
"""

from __future__ import annotations

import glob as _glob
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


def _pointer(table_dir: str) -> str:
    return os.path.join(table_dir, "_LATEST")


def latest_version(table_dir: str) -> int:
    """0 if the table does not exist yet."""
    try:
        with open(_pointer(table_dir)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return 0


def versions(table_dir: str) -> list[int]:
    """Committed AND still-readable versions (staging and stranded dirs
    excluded; versions retired by :func:`expire_versions` drop out —
    enumerating this list for time travel never yields a version whose
    read would raise). A version is readable while its artifact exists:
    the ``v{N}`` snapshot dir (write_version tables) or the
    ``manifest-v{N}.json`` file (manifest tables)."""
    n = latest_version(table_dir)
    out = []
    for v in range(1, n + 1):
        if os.path.isdir(os.path.join(table_dir, f"v{v}")) or os.path.exists(
            os.path.join(table_dir, f"manifest-v{v}.json")
        ):
            out.append(v)
    return out


#: A ``.staging-*`` / unreferenced ``p-*`` dir younger than this is
#: treated as a possibly-IN-FLIGHT write, not crash debris, and is left
#: alone by cleanup (r04, ADVICE: the single-writer contract was only a
#: docstring — an age guard makes a concurrent writer survivable
#: instead of silently corrupted).
STAGING_GRACE_SEC = 900.0


def _is_stale(path: str, grace_sec: float) -> bool:
    """True when ``path`` is older than the grace window (a vanished dir
    counts as handled — someone else cleaned it)."""
    try:
        return (time.time() - os.path.getmtime(path)) > grace_sec
    except OSError:
        return False


def write_version(df: DataFrame, table_dir: str) -> int:
    """Commit ``df`` as the next version; returns its version number."""
    os.makedirs(table_dir, exist_ok=True)
    # clean staging stranded by a previous crash — safe: committed
    # versions are never under a .staging name, and the age guard
    # spares any concurrent writer's in-flight staging dir
    for stale in _glob.glob(os.path.join(table_dir, ".staging-*")):
        if _is_stale(stale, STAGING_GRACE_SEC):
            shutil.rmtree(stale, ignore_errors=True)
    v = latest_version(table_dir) + 1
    staging = os.path.join(table_dir, f".staging-{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").parquet(staging)
    final = os.path.join(table_dir, f"v{v}")
    os.rename(staging, final)
    tmp = os.path.join(table_dir, f"._LATEST.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        f.write(str(v))
    os.replace(tmp, _pointer(table_dir))  # atomic pointer flip
    return v


def read_table(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the latest (default) or any historical version."""
    v = latest_version(table_dir) if version is None else version
    if v < 1:
        raise FileNotFoundError(f"no committed versions in {table_dir}")
    return spark.read.parquet(os.path.join(table_dir, f"v{v}"))


# ---------------------------------------------------------------------------
# Partitioned manifests: the commit unit for partition-pruned snapshots
# (streaming/merge.py::merge_into_partitioned_snapshot). A manifest maps
# partition id -> immutable data directory; a merge rewrites ONLY the
# manifest entries whose partitions contain changed keys, reusing every
# other entry's directory untouched, then commits the new manifest with
# the SAME atomic pointer flip as write_version. This is the table-format
# shape (Delta commit log / Iceberg manifest list) at parquet+JSON level:
# per-batch write cost is O(touched partitions), not O(snapshot).
# ---------------------------------------------------------------------------


def read_manifest(
    table_dir: str, version: int | None = None
) -> dict | None:
    """The committed manifest at ``version`` (default: latest), or None
    when the table has no committed version yet. Shape:
    ``{"num_partitions": P, "parts": {"<part_id>": "<dir name>"}}``.

    Latest-reads are retried through the OCC-withdrawal window (r07,
    threaded-fuzz finding): a failed conditional commit UNLINKS the
    manifest it just linked, so both the pointer and the glob can
    transiently name a file that vanishes before ``open`` — a reader
    racing it saw FileNotFoundError. A withdrawn manifest disappears
    within the loser's same call, so a bounded re-read always lands on
    a committed file (or None for a still-empty table). Explicit
    ``version`` reads keep raising: the caller named a specific
    version, and its absence is real information (expired/withdrawn)."""
    import json
    import time as _time

    if version is not None:
        v = version
        if v < 1:
            return None
        with open(os.path.join(table_dir, f"manifest-v{v}.json")) as f:
            return json.load(f)
    path = None
    for _ in range(6):
        v = latest_version(table_dir)
        if v < 1:
            return None
        path = os.path.join(table_dir, f"manifest-v{v}.json")
        if not os.path.exists(path):
            # the pointer can transiently reference a version withdrawn
            # by a failed conditional commit if a concurrent
            # pointer-repair flip raced the withdrawal; latest means
            # "highest committed manifest", so fall back to it — the
            # next successful commit repairs the pointer upward
            v = _max_manifest_version(table_dir)
            if v < 1:
                return None
            path = os.path.join(table_dir, f"manifest-v{v}.json")
        try:
            with open(path) as f:
                return json.load(f)
        except FileNotFoundError:
            _time.sleep(0.01)  # mid-withdrawal: re-resolve and retry
    raise FileNotFoundError(path)


def _max_manifest_version(table_dir: str) -> int:
    """Highest version with a committed manifest FILE on disk (the
    authoritative commit record — a manifest is fully written before it
    is linked into place, so its existence means that version is
    complete even if the pointer has not caught up yet)."""
    best = 0
    for p in _glob.glob(os.path.join(table_dir, "manifest-v*.json")):
        try:
            best = max(best, int(os.path.basename(p)[len("manifest-v"):-5]))
        except ValueError:
            continue
    return best


def commit_manifest(
    table_dir: str, manifest: dict, expected_latest: int | None = None
) -> int:
    """Commit ``manifest`` as the next version. Write the full manifest
    file first, then atomically flip ``_LATEST`` — a crash at any point
    leaves either the old pointer (stranded manifest file, collected by
    retention) or the new one (fully committed).

    Version numbers are allocated EXCLUSIVELY: the manifest file is
    hard-linked into place (``os.link`` fails on an existing name), so
    two concurrent committers can never both claim version N and
    silently overwrite each other's manifest — the loser is bumped to
    N+1.

    The pointer flip is a verify loop, not check-then-act (r05, ADVICE):
    after each os.replace the flipper re-reads the pointer AND re-scans
    the committed manifest files, and repeats while the pointer trails
    the highest committed version. A racer that momentarily regresses
    the pointer (read-low, lose-the-race, replace) observes the higher
    manifest file on the next pass and restores it — the pointer
    converges to max(committed versions) under any interleaving, so no
    commit is ever lost. (At object-store scale this whole function is
    one conditional-put; the scan is the local-FS stand-in.)

    OCC hook: pass ``expected_latest`` (the version the caller's
    manifest was DERIVED from) to make the commit conditional — if the
    exclusive allocation lands anywhere other than
    ``expected_latest + 1``, a foreign commit intervened and this
    manifest would revert it; the allocated file is unlinked and ``-1``
    returned so the caller can re-read, re-validate, and retry
    (Delta/Iceberg optimistic-commit shape)."""
    import json

    os.makedirs(table_dir, exist_ok=True)
    tmp = os.path.join(table_dir, f".manifest.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    v = latest_version(table_dir) + 1
    while True:
        try:
            os.link(tmp, os.path.join(table_dir, f"manifest-v{v}.json"))
            break
        except FileExistsError:
            v += 1  # another committer took this version number
    os.remove(tmp)
    if expected_latest is not None and v != expected_latest + 1:
        # conditional commit failed: someone committed since the caller
        # read expected_latest — withdraw (nothing references v yet)
        os.remove(os.path.join(table_dir, f"manifest-v{v}.json"))
        return -1
    while True:
        cur = latest_version(table_dir)
        target = max(v, _max_manifest_version(table_dir))
        if cur >= target:
            break
        ptmp = os.path.join(table_dir, f"._LATEST.tmp-{uuid.uuid4().hex[:8]}")
        with open(ptmp, "w") as f:
            f.write(str(target))
        os.replace(ptmp, _pointer(table_dir))
    return v


#: String min/max longer than this are dropped from manifest stats: a
#: truncated upper bound would need Iceberg's increment-last-byte trick
#: to stay a valid bound, so over-long strings simply opt out of
#: dir-level pruning (absence disables pruning, never correctness).
STATS_MAX_STR = 64


def collect_dir_stats(dir_path: str) -> dict[str, list]:
    """Manifest-level data-skipping stats for one immutable part dir:
    ``{column: [min, max]}`` over every top-level primitive column,
    aggregated from the parquet FOOTERS (driver-side metadata reads
    only — no Spark job; the same source Delta/Iceberg manifests are
    populated from). A column is omitted when ANY row group lacks
    min/max for it, its bounds are not JSON-safe scalars (nested,
    timestamp, binary), or a string bound exceeds ``STATS_MAX_STR`` —
    omission just means that column can't prune this dir.

    Scale shape: O(files in dir) footer reads at write time, amortized
    into the merge/maintenance job that created the dir; the payoff is
    O(P) dict lookups at read time instead of listing+scanning every
    partition dir."""
    import pyarrow.parquet as pq

    agg: dict[str, list] = {}
    dropped: set[str] = set()
    for fname in sorted(os.listdir(dir_path)):
        if not fname.endswith(".parquet") or fname.startswith("."):
            continue
        md = pq.ParquetFile(os.path.join(dir_path, fname)).metadata
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if "." in name or name in dropped:
                    continue
                st = col.statistics
                mn = mx = None
                if st is not None and st.has_min_max:
                    mn, mx = st.min, st.max
                if isinstance(mn, bytes):
                    try:
                        mn, mx = mn.decode(), mx.decode()
                    except UnicodeDecodeError:
                        mn = None
                if isinstance(mn, str) and (
                    len(mn) > STATS_MAX_STR or len(mx) > STATS_MAX_STR
                ):
                    mn = None
                if (
                    mn is None
                    or isinstance(mn, bool)
                    or not isinstance(mn, (int, float, str))
                ):
                    dropped.add(name)
                    agg.pop(name, None)
                    continue
                cur = agg.get(name)
                if cur is None:
                    agg[name] = [mn, mx]
                else:
                    cur[0] = min(cur[0], mn)
                    cur[1] = max(cur[1], mx)
    return agg


def collect_dir_rowcount(dir_path: str) -> int:
    """Exact row count of one immutable part dir from parquet FOOTERS
    (driver-side metadata only, no Spark job) — the per-partition
    ``rows`` manifest entry that makes COUNT(*) a metadata operation
    on fully-folded tables (the Delta stats-based count)."""
    import pyarrow.parquet as pq

    n = 0
    for fname in os.listdir(dir_path):
        if fname.endswith(".parquet") and not fname.startswith("."):
            n += pq.ParquetFile(os.path.join(dir_path, fname)).metadata.num_rows
    return n


def snapshot_row_count(table_dir: str, version: int | None = None) -> int | None:
    """COUNT(*) of a committed snapshot WITHOUT touching any data file:
    the sum of the manifest's per-partition ``rows`` entries. Returns
    None — caller must fall back to a scan — when the version predates
    row-count recording, any partition lacks an entry, or any partition
    has a pending MoR delta log (an overlay changes the count in ways
    only the read can resolve)."""
    man = read_manifest(table_dir, version)
    if man is None:
        return None
    if any(log for log in man.get("deltas", {}).values()):
        return None
    rows = man.get("rows", {})
    if set(rows) != set(man["parts"]):
        return None
    return sum(int(v) for v in rows.values())


def version_as_of(table_dir: str, ts: float) -> int:
    """Timestamp time travel: the newest committed version whose
    ``committed_at`` is <= ts (the Delta TIMESTAMP AS OF rule).
    Versions without a committed_at record (pre-r05) are treated as
    older than any timestamp. Raises when nothing was committed by
    ``ts``."""
    best = 0
    for v in versions(table_dir):
        m = read_manifest(table_dir, v)
        at = (m or {}).get("committed_at", float("-inf"))
        if at <= ts and v > best:
            best = v
    if best < 1:
        raise FileNotFoundError(
            f"no version of {table_dir} committed at or before {ts}"
        )
    return best


def restore_snapshot(table_dir: str, to_version: int) -> int:
    """RESTORE TABLE ... TO VERSION AS OF — roll the table back by
    committing the target version's content as a NEW version (the Delta
    RESTORE shape: history moves forward, never rewrites, so the bad
    versions stay readable for audit and the restore itself is an
    auditable commit).

    Metadata-only on manifest tables: part/delta dirs are immutable and
    shared across manifests, so re-referencing them moves zero bytes of
    data — a 100 TB rollback is one small JSON commit. Schema rolls back
    with the manifest (columns added after ``to_version`` disappear until
    re-evolved). On plain ``v{N}`` tables the new version hard-links the
    old dir's files (same-filesystem metadata op, no data copy).

    Concurrency: the commit is unconditional last-wins — a restore does
    not derive from the latest version, so there is nothing to rebase;
    a concurrent merge that loses the race will fail ITS conditional
    commit and re-validate against the restored state. Returns the new
    version number."""
    try:
        target = read_manifest(table_dir, to_version)
    except FileNotFoundError:
        target = None  # expired manifest — maybe a v{N}-dir table
    if target is not None and "parts" in target:
        nxt = dict(target)
        nxt["operation"] = f"restore(v{to_version})"
        nxt["committed_at"] = time.time()
        return commit_manifest(table_dir, nxt)
    src_dir = os.path.join(table_dir, f"v{to_version}")
    if not os.path.isdir(src_dir):
        raise FileNotFoundError(
            f"version {to_version} of {table_dir} is not readable"
        )
    staging = os.path.join(table_dir, f".staging-{uuid.uuid4().hex[:8]}")
    shutil.copytree(src_dir, staging, copy_function=os.link)
    v = latest_version(table_dir) + 1
    os.rename(staging, os.path.join(table_dir, f"v{v}"))
    tmp = os.path.join(table_dir, f"._LATEST.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        f.write(str(v))
    os.replace(tmp, _pointer(table_dir))
    return v


def clone_snapshot(
    src_table_dir: str, dst_table_dir: str, version: int | None = None
) -> int:
    """Shallow CLONE: create an independent manifest table at
    ``dst_table_dir`` whose v1 references the SOURCE's immutable part and
    delta dirs by relative path — zero data copied, O(1) regardless of
    table size (the Delta SHALLOW CLONE / Iceberg snapshot-ref shape).

    Divergence is copy-on-write at partition granularity: a merge into
    the clone rewrites only its touched partitions into clone-local
    ``p-*`` dirs; untouched partitions keep reading the source's files.
    The source never sees clone commits and vice versa.

    Retention hazard (same as Delta): the source's ``expire_versions`` /
    ``gc_unreferenced_parts`` only know about the source's own manifests,
    so vacuuming the source can delete dirs a shallow clone still
    references. Run retention on the source only after clones are dropped
    or fully localized (e.g. ``repartition_snapshot`` on the clone
    rewrites every partition local)."""
    man = read_manifest(src_table_dir, version)
    if man is None or "parts" not in man:
        raise FileNotFoundError(
            f"no readable manifest version in {src_table_dir}"
        )
    os.makedirs(dst_table_dir, exist_ok=True)
    rel = os.path.relpath(
        os.path.abspath(src_table_dir), os.path.abspath(dst_table_dir)
    )
    nxt = dict(man)
    nxt["parts"] = {
        p: d if os.path.isabs(d) else os.path.join(rel, d)
        for p, d in man["parts"].items()
    }
    nxt["deltas"] = {
        p: [d if os.path.isabs(d) else os.path.join(rel, d) for d in log]
        for p, log in man.get("deltas", {}).items()
    }
    src_v = version if version is not None else latest_version(src_table_dir)
    nxt["operation"] = f"clone({os.path.basename(src_table_dir)}, v{src_v})"
    nxt["committed_at"] = time.time()
    return commit_manifest(dst_table_dir, nxt)


def table_history(table_dir: str) -> list[dict]:
    """DESCRIBE HISTORY for the manifest table: one dict per readable
    version, oldest first — version, operation, committed_at,
    n_partitions, n_logged_partitions, n_rows (None when not
    metadata-derivable). Driver-side O(versions) manifest reads; wrap
    in ``spark.createDataFrame`` for a relational view (bounded by the
    retention policy, not data size)."""
    out = []
    for v in versions(table_dir):
        m = read_manifest(table_dir, v)
        if m is None or "parts" not in m:
            continue
        out.append(
            {
                "version": v,
                "operation": m.get("operation"),
                "committed_at": m.get("committed_at"),
                "n_partitions": len(m["parts"]),
                "n_logged_partitions": sum(
                    1 for log in m.get("deltas", {}).values() if log
                ),
                "n_rows": snapshot_row_count(table_dir, v),
            }
        )
    return out


def gc_unreferenced_parts(
    table_dir: str, grace_sec: float = STAGING_GRACE_SEC
) -> list[str]:
    """Drop part directories referenced by NO committed manifest (debris
    from a crash between the part writes and the pointer flip) plus
    stranded staging dirs. Never touches a directory any committed
    version can reach, so time travel across all committed manifests
    survives. Candidates younger than ``grace_sec`` are spared: an
    unreferenced-but-fresh dir may be a CONCURRENT merge's in-flight
    write that simply has not flipped its pointer yet, so deleting on
    sight would corrupt it mid-commit (pass ``grace_sec=0`` to force
    the old behavior in a provably single-writer context). Returns the
    removed names."""
    n = latest_version(table_dir)
    if n < 1:
        return []
    referenced: set[str] = set()
    for v in range(1, n + 1):
        try:
            m = read_manifest(table_dir, v)
        except FileNotFoundError:
            # a manually-deleted historical manifest must not brick the
            # table's maintenance; its versions are unreadable either
            # way, and the dirs it alone referenced become collectable
            continue
        if m:
            referenced.update(m["parts"].values())
            for log in m.get("deltas", {}).values():
                referenced.update(log)
    removed = []
    for entry in os.listdir(table_dir):
        full = os.path.join(table_dir, entry)
        if not os.path.isdir(full):
            continue
        if entry.startswith(".staging-") or (
            # p-/d- are merge-table partition/delta dirs, c- the IVF
            # index's cell dirs — all manifest-referenced immutables
            entry.startswith(("p-", "d-", "c-")) and entry not in referenced
        ):
            if not _is_stale(full, grace_sec):
                continue  # possibly in-flight — spare it this pass
            shutil.rmtree(full, ignore_errors=True)
            removed.append(entry)
    return removed


# ---------------------------------------------------------------------------
# Merge-on-read deletes: tombstone overlay on an immutable base table.
# The COW path (streaming/merge.py) rewrites the snapshot per batch; this
# is the read-optimized-write twin: deletes append a tiny key file, readers
# anti-join the tombstone union, and compaction folds them in. The pattern
# behind Delta deletion vectors / Iceberg merge-on-read, at parquet level.
# ---------------------------------------------------------------------------


def delete_keys(keys_df: DataFrame, table_dir: str, key_col: str) -> None:
    """Append a tombstone set (O(deleted keys) write — the base table is
    NOT touched). Idempotent: deleting an already-dead key is a no-op at
    read time."""
    out = os.path.join(table_dir, "_deletes", uuid.uuid4().hex[:12])
    keys_df.select(key_col).write.mode("overwrite").parquet(out)


def read_with_deletes(
    spark: SparkSession, table_dir: str, key_col: str
) -> DataFrame:
    """Read the base minus all tombstoned keys: one left_anti join
    against the (small, broadcast-able) tombstone union."""
    base = spark.read.parquet(os.path.join(table_dir, "base"))
    dels = os.path.join(table_dir, "_deletes")
    if not os.path.isdir(dels) or not os.listdir(dels):
        return base
    tomb = spark.read.parquet(os.path.join(dels, "*")).select(key_col)
    return base.join(tomb, key_col, "left_anti")


def write_base(df: DataFrame, table_dir: str) -> None:
    df.write.mode("overwrite").parquet(os.path.join(table_dir, "base"))


def compact_deletes(
    spark: SparkSession, table_dir: str, key_col: str
) -> None:
    """Fold tombstones into the base (the maintenance job): rewrite base
    as the anti-joined survivors via a staging dir + renames, then drop
    the tombstone files. Readers before the swap see base+overlay,
    after it the compacted base — the same survivors either way."""
    merged = read_with_deletes(spark, table_dir, key_col)
    staging = os.path.join(table_dir, f".compact-{uuid.uuid4().hex[:8]}")
    merged.write.mode("overwrite").parquet(staging)
    base = os.path.join(table_dir, "base")
    old = os.path.join(table_dir, f".old-{uuid.uuid4().hex[:8]}")
    os.rename(base, old)
    os.rename(staging, base)
    shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(os.path.join(table_dir, "_deletes"), ignore_errors=True)


def expire_versions(
    table_dir: str, keep_last: int = 1, grace_sec: float = STAGING_GRACE_SEC
) -> list[int]:
    """Retention maintenance (r04): expire every committed version older
    than the newest ``keep_last`` — the Delta VACUUM / Iceberg
    expire_snapshots counterpart. Works on both table styles: plain
    ``v{N}`` snapshot dirs (write_version) are deleted outright;
    manifest tables lose the expired ``manifest-v{N}.json`` files and
    then :func:`gc_unreferenced_parts` collects any part directory only
    those manifests referenced (GC already tolerates missing manifests,
    so a crash mid-expire leaves a GC-able, fully readable table).
    Expired versions raise on read and drop out of :func:`versions`;
    the newest ``keep_last`` (and time travel among them) are
    untouched. Returns the expired version numbers.

    ``grace_sec`` is the retention horizon for the WHOLE operation, not
    just the part-dir GC: a version whose artifact is younger than the
    window is spared this pass, so a reader that just resolved it (or a
    writer that just committed it) cannot have its files deleted
    mid-scan — the Delta VACUUM retention-age model. Readers of
    versions older than the horizon are out of retention, as with
    VACUUM. Pass ``grace_sec=0`` to expire immediately in a provably
    quiescent context."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    n = latest_version(table_dir)
    expired = []
    for v in range(1, max(1, n - keep_last + 1)):
        hit = False
        fresh = False
        m = os.path.join(table_dir, f"manifest-v{v}.json")
        if os.path.exists(m):
            if _is_stale(m, grace_sec) or grace_sec <= 0:
                os.remove(m)
                hit = True
            else:
                fresh = True
        d = os.path.join(table_dir, f"v{v}")
        if os.path.isdir(d):
            if _is_stale(d, grace_sec) or grace_sec <= 0:
                shutil.rmtree(d, ignore_errors=True)
                hit = True
            else:
                fresh = True
        if hit and not fresh:
            expired.append(v)
    if expired:
        gc_unreferenced_parts(table_dir, grace_sec)
    return expired
