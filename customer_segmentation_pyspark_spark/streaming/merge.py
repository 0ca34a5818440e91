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
    """
    recover_swap(snapshot_dir)
    delta = latest_per_key(changes, key, seq)
    if os.path.exists(snapshot_dir):
        base = spark.read.parquet(snapshot_dir)
        cols = [c for c in base.columns if c != key]
        d = delta.select(
            F.col(key).alias("__k"), *[F.col(c).alias(f"__u_{c}") for c in cols]
        )
        merged = base.join(
            d, F.col(key) == F.col("__k"), "full_outer"
        ).select(
            F.coalesce(key, "__k").alias(key),
            *[F.coalesce(f"__u_{c}", c).alias(c) for c in cols],
        )
    else:
        merged = delta
    tmp = f"{snapshot_dir}.tmp-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    crash_safe_swap(snapshot_dir, tmp)


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
