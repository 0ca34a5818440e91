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

from pyspark.sql import DataFrame


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
    import os
    import shutil
    import uuid

    df = spark.read.parquet(path)
    out = df.repartition(target_files)
    if order_by:
        out = out.sortWithinPartitions(*order_by)
    tmp = f"{path}.compact-{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(tmp)
    old = f"{path}.old-{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return len(glob.glob(os.path.join(path, "*.parquet")))
