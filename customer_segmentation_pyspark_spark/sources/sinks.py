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
