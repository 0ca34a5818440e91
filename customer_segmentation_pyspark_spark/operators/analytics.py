"""Order-statistics analytics: Pareto frontier (skyline) and sweep-line
interval concurrency.

Both are classically "imperative" algorithms re-expressed as window
scans so Catalyst keeps them whole-stage-codegen'd and shuffle-minimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(df: DataFrame, minimize: str, maximize: str) -> DataFrame:
    """2-D skyline: rows for which no other row is at-least-as-good on
    both axes (``minimize`` <=, ``maximize`` >=) and strictly better on
    one.  Duplicated optimal points are all kept (neither dominates).

    Not the quadratic NOT-EXISTS self-join: collapse to one row per
    distinct ``minimize`` value (keeping the max of ``maximize`` — any
    same-price row below it is dominated), then a single ordered scan
    keeps the values where the running best strictly improves.  A point
    survives iff its ``maximize`` beats every strictly-cheaper point's
    and ties its own price group's best.  Cost: one hash agg + a window
    over the DISTINCT-price frame (|prices| << n) + a broadcast join
    back; the frontier itself is monotone and tiny.  At 100 TB the
    ordered scan is over distinct prices only; if even that is huge,
    the same recurrence range-partitions into a two-pass prefix-max
    (per-range max, then a cumulative offset per range) — the skyline
    is distributive: skyline(A ∪ B) ⊆ skyline(A) ∪ skyline(B)."""
    pm = df.groupBy(minimize).agg(F.max(maximize).alias("__pmax"))
    w = Window.orderBy(minimize).rowsBetween(
        Window.unboundedPreceding, -1
    )
    front = (
        pm.withColumn("__mlt", F.max("__pmax").over(w))
        .where(
            F.col("__mlt").isNull() | (F.col("__pmax") > F.col("__mlt"))
        )
        .select(minimize, "__pmax")
    )
    return (
        df.join(F.broadcast(front), on=[minimize])
        .where(F.col(maximize) == F.col("__pmax"))
        .drop("__pmax")
    )


def interval_concurrency(
    df: DataFrame,
    part_col: str,
    start_col: str,
    end_col: str,
    id_col: str,
) -> DataFrame:
    """Sweep-line maximum concurrency per partition: how many intervals
    [start, end) overlap at the busiest instant, plus when that peak is
    first reached.  Classic +1/-1 boundary trick: unpivot each interval
    into two events, order by (time, delta, id) — ends before starts at
    the same tick, so touching intervals do NOT overlap — and a running
    sum is the live-interval count.  One union + one window shuffle on
    the partition key; no self-join, no per-interval expansion, so a
    partition with a million intervals costs 2M rows through one sort.
    Start/end must be numeric (e.g. epoch seconds)."""
    starts = df.select(
        F.col(part_col).alias("pk"),
        F.col(start_col).alias("t"),
        F.lit(1).alias("delta"),
        F.col(id_col).alias("tid"),
    )
    ends = df.select(
        F.col(part_col).alias("pk"),
        F.col(end_col).alias("t"),
        F.lit(-1).alias("delta"),
        F.col(id_col).alias("tid"),
    )
    w = (
        Window.partitionBy("pk")
        .orderBy("t", "delta", "tid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = starts.unionByName(ends).withColumn(
        "run", F.sum("delta").over(w)
    )
    peaks = run.groupBy("pk").agg(
        F.max("run").cast("long").alias("max_conc"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_intervals"),
    )
    return (
        run.join(F.broadcast(peaks), on="pk")
        .where(F.col("run") == F.col("max_conc"))
        .groupBy("pk", "max_conc", "n_intervals")
        .agg(F.min("t").cast("long").alias("peak_t"))
        .select(
            F.col("pk").alias(part_col),
            "max_conc",
            "n_intervals",
            "peak_t",
        )
    )
