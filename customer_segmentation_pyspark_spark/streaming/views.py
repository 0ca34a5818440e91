"""Incremental materialized-view maintenance (r05): keep an aggregate
table in sync with a lakehouse snapshot by consuming its change data
feed instead of recomputing — the classic delta-maintenance shape
(self-maintainable SUM/COUNT views), applied to the engine's own CDF
(``streaming/merge.py:read_snapshot_changes``).

Cost model at 100 TB: one maintenance step is O(|changes| + |affected
groups|) — the CDF is already partition-pruned to changed partitions,
the signed contributions reduce map-side, and the view merge touches
only groups present in the delta. A full recompute is O(snapshot);
the equality of the two is exactly what the DuckDB oracle on
``incremental_agg_view`` checks.

The reference has no view maintenance (SURVEY.md §2.11 — no streaming
surface at all); this is engine surface for the LLM-pipeline north
star: per-source corpus dashboards that stay fresh per merge wave
without rescanning the corpus.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.sources.sinks import (
    crash_safe_swap,
    recover_swap,
)


#: marker file inside the view dir recording which source-table version
#: the view reflects — swapped atomically WITH the data, so the pair is
#: never torn (files starting with "_" are invisible to parquet reads)
SRC_VERSION_FILE = "_SRC_VERSION"


def _write_marker(dir_path: str, src_version) -> None:
    if src_version is not None:
        with open(os.path.join(dir_path, SRC_VERSION_FILE), "w") as f:
            f.write(str(int(src_version)))


def view_src_version(view_dir: str) -> int | None:
    """The source-table version this view reflects (None for a view
    maintained without markers)."""
    try:
        with open(os.path.join(view_dir, SRC_VERSION_FILE)) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def sync_view_to_snapshot(
    spark: SparkSession,
    table_dir: str,
    view_dir: str,
    group_col: str,
    value_col,
) -> int:
    """Exactly-once incremental maintenance: bring the view up to the
    source table's latest version, folding only the change feed since
    the version recorded IN the view (seeding on first call). The
    version marker swaps atomically with the data, so a crash at any
    point leaves a consistent (data, version) pair and the retry
    either re-folds the same CDF slice onto the OLD pair or no-ops on
    the NEW one — the additive apply can never double-count. This is
    the driver loop the module docstring's exactly-once caveat points
    to; returns the version the view now reflects."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        read_partitioned_snapshot,
        read_snapshot_changes,
    )

    cur = versioned.latest_version(table_dir)
    if cur < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    recover_swap(view_dir)
    v0 = view_src_version(view_dir) if os.path.exists(view_dir) else None
    if v0 is None:
        seed_count_sum_view(
            spark,
            view_dir,
            read_partitioned_snapshot(spark, table_dir, version=cur),
            group_col,
            value_col,
            src_version=cur,
        )
        return cur
    if v0 >= cur:
        return v0  # already current — the idempotent no-op
    update_count_sum_view(
        spark,
        view_dir,
        read_snapshot_changes(spark, table_dir, v0, cur),
        group_col,
        value_col,
        src_version=cur,
    )
    return cur


def update_count_sum_view(
    spark: SparkSession,
    view_dir: str,
    cdf: DataFrame,
    group_col: str,
    value_col,
    src_version: int | None = None,
) -> None:
    """Apply one CDF slice to a (group, n_rows, total) view.

    Signed contributions: ``insert``/``update_postimage`` rows add
    (+1, +value), ``delete``/``update_preimage`` rows subtract — an
    update whose value did not change cancels exactly, NULL values
    count 0 toward the total but still count the row. A group whose
    row count reaches zero LEAVES the view (COUNT/SUM views are
    self-maintainable, no rescan needed — the textbook IVM property).
    Crash-safe like the merge sinks: fresh directory + swap, and
    re-applying the same CDF slice is NOT idempotent (contributions
    are additive) — drive this through
    :func:`sync_view_to_snapshot`, whose version marker makes the
    apply exactly-once, or rebuild from :func:`seed_count_sum_view`
    on doubt."""
    value = F.coalesce(value_col, F.lit(0))
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = cdf.groupBy(group_col).agg(
        F.sum(sign).cast("long").alias("__d_n"),
        F.sum(sign * value).cast("long").alias("__d_sum"),
    )
    recover_swap(view_dir)
    if os.path.exists(view_dir):
        base = spark.read.parquet(view_dir)
        g = F.coalesce(F.col(group_col), F.col("__g")).alias(group_col)
        merged = (
            base.join(
                delta.select(
                    F.col(group_col).alias("__g"), "__d_n", "__d_sum"
                ),
                # eqNullSafe: a NULL group present in both sides must
                # MATCH (plain equality would leave two NULL-group rows
                # with split counters — r06, ADVICE)
                F.col(group_col).eqNullSafe(F.col("__g")),
                "full_outer",
            )
            .select(
                g,
                (
                    F.coalesce(F.col("n_rows"), F.lit(0))
                    + F.coalesce(F.col("__d_n"), F.lit(0))
                ).alias("n_rows"),
                (
                    F.coalesce(F.col("total"), F.lit(0))
                    + F.coalesce(F.col("__d_sum"), F.lit(0))
                ).alias("total"),
            )
            .filter(F.col("n_rows") > 0)
        )
    else:
        merged = delta.filter(F.col("__d_n") > 0).select(
            F.col(group_col),
            F.col("__d_n").alias("n_rows"),
            F.col("__d_sum").alias("total"),
        )
    tmp = f"{view_dir}.tmp-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    _write_marker(tmp, src_version)
    crash_safe_swap(view_dir, tmp)


def seed_count_sum_view(
    spark: SparkSession,
    view_dir: str,
    snapshot: DataFrame,
    group_col: str,
    value_col,
    src_version: int | None = None,
) -> None:
    """Bootstrap (or rebuild) the view from a full snapshot — the one
    O(snapshot) step; every later wave goes through
    :func:`update_count_sum_view` at delta cost."""
    import shutil

    shutil.rmtree(view_dir, ignore_errors=True)
    agg = snapshot.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.coalesce(value_col, F.lit(0))).cast("long").alias("total"),
    )
    tmp = f"{view_dir}.tmp-{uuid.uuid4().hex[:8]}"
    agg.write.mode("overwrite").parquet(tmp)
    _write_marker(tmp, src_version)
    crash_safe_swap(view_dir, tmp)
