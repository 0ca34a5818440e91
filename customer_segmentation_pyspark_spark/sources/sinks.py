"""Write paths: partitioned parquet, bucketed tables, and streaming sinks.

The reference's only sinks are Databricks ``display()`` and driver
``collect()`` for matplotlib (SURVEY.md §2.1 S2-S4) — nothing a pipeline
can consume. This engine writes:

  * partitioned parquet — partition columns become directory keys, so
    downstream readers get partition pruning for free;
  * bucketed saved tables — co-locates join/agg keys at write time, so a
    later equi-join or groupBy on the bucket key needs NO shuffle (the
    classic write-once/join-many optimization for 100 TB fact tables);
  * CSV for interop.
"""

from __future__ import annotations

import glob as _glob
import os as _os
import shutil as _shutil
import uuid as _uuid

from pyspark.sql import DataFrame


def recover_swap(path: str) -> bool:
    """Crash recovery for ``crash_safe_swap`` — call at open, before
    reading or rewriting ``path``.

    If a crash hit the gap between the two renames, ``path`` is missing
    and the previous snapshot is stranded at ``path.old-*``: adopt the
    newest one (the writer's batch replays on top of it idempotently).
    Stale ``.old-*`` / ``.tmp-*`` / ``.compact-*`` leftovers from crashes
    before/after the swap are dropped. Single-writer protocol — callers
    serialize writers externally (foreachBatch already does).

    Returns True when a stranded snapshot was adopted.
    """
    olds = sorted(
        _glob.glob(f"{path}.old-*"), key=lambda p: _os.path.getmtime(p)
    )
    recovered = False
    if olds and not _os.path.exists(path):
        _os.rename(olds[-1], path)
        olds = olds[:-1]
        recovered = True
    for stale in olds + _glob.glob(f"{path}.tmp-*") + _glob.glob(
        f"{path}.compact-*"
    ):
        _shutil.rmtree(stale, ignore_errors=True)
    return recovered


def crash_safe_swap(path: str, tmp: str) -> None:
    """Swap the fully-written directory ``tmp`` into ``path``.

    POSIX has no atomic directory exchange, so this is two renames with a
    recoverable gap: a crash between them leaves the old snapshot at
    ``path.old-*``, which ``recover_swap`` adopts at the next open and
    the (replayed, idempotent) write then rebuilds on the correct base —
    previously-merged keys are never lost. A concurrent reader inside
    the gap can still observe ``path`` briefly missing; a table-format
    commit log (single atomic pointer) is the real fix at lakehouse
    scale, and this helper is its filesystem stand-in.
    """
    old = f"{path}.old-{_uuid.uuid4().hex[:8]}"
    if _os.path.exists(path):
        _os.rename(path, old)
    _os.rename(tmp, path)
    if _os.path.exists(old):
        _shutil.rmtree(old)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (and optionally sorted) managed table. Joins and
    aggregations keyed on ``bucket_cols`` against this table skip their
    exchange."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def write_csv(
    df: DataFrame, path: str, header: bool = True, mode: str = "overwrite"
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def compact_table(
    spark, path: str, target_files: int, order_by: list[str] | None = None
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``target_files`` files (optionally sorted for stats-based pruning),
    atomically swapping the directory.  The operational companion to the
    streaming MERGE sink — micro-batch writes accumulate small files, and
    at 100 TB an over-fragmented table wastes scan tasks (one task per
    tiny file) and NameNode/listing overhead.  Returns the file count
    after compaction.
    """
    import glob
    import uuid

    recover_swap(path)
    df = spark.read.parquet(path)
    out = df.repartition(target_files)
    if order_by:
        out = out.sortWithinPartitions(*order_by)
    tmp = f"{path}.compact-{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(tmp)
    crash_safe_swap(path, tmp)
    return len(glob.glob(_os.path.join(path, "*.parquet")))
