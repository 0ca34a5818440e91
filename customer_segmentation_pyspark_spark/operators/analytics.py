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


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    hash_col: str,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Snapshot diff: classify every key as added / removed / changed /
    unchanged between two dataset versions.

    Both inputs carry a precomputed payload hash column (md5 of the
    canonicalized payload), so the compare is one full-outer shuffle
    join on the key plus a constant-width hash equality — never a
    column-by-column compare of wide rows.  That is the shape that
    holds at 100 TB: the shuffle carries (key, 128-bit hash) only, and
    co-partitioned/bucketed snapshots would eliminate the exchange
    entirely.  The audit pass every dataset-versioning pipeline runs
    between crawl N and crawl N+1."""
    o = old.select(
        F.col(key_col).alias("k"),
        F.col(hash_col).alias("old_hash"),
        *[F.col(c).alias(f"old_{c}") for c in carry_cols],
    )
    n = new.select(
        F.col(key_col).alias("k"),
        F.col(hash_col).alias("new_hash"),
        *[F.col(c).alias(f"new_{c}") for c in carry_cols],
    )
    joined = o.join(n, "k", "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), "added")
        .when(F.col("new_hash").isNull(), "removed")
        .when(F.col("old_hash") == F.col("new_hash"), "unchanged")
        .otherwise("changed")
    )
    return joined.select(
        F.col("k").alias(key_col),
        status.alias("status"),
        "old_hash",
        "new_hash",
        # carried payload: the surviving (new-side-preferred) value
        *[
            F.coalesce(F.col(f"new_{c}"), F.col(f"old_{c}")).alias(c)
            for c in carry_cols
        ],
    )


def dq_row_checks(df: DataFrame, rules: "dict[str, Column]") -> DataFrame:
    """Declarative data-quality gate, Deequ/Great-Expectations shape:
    ``rules`` maps check name -> boolean Column that is TRUE when a row
    VIOLATES the check. ALL rules evaluate in ONE conditional-sum
    aggregate — one scan of the table regardless of rule count — then
    the 1-row wide result pivots to long form through an inline literal
    struct array (no second shuffle; the explode input is one row).

    Returns (check, n_violations, ok) — union with ``dq_unique`` /
    ``dq_referential`` rows for a full suite.
    """
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
        for name, cond in rules.items()
    ]
    wide = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                F.col(name).alias("n_violations"),
            )
            for name in rules
        ]
    )
    return wide.select(F.explode(pairs).alias("r")).select(
        F.col("r.check").alias("check"),
        F.col("r.n_violations").alias("n_violations"),
        (F.col("r.n_violations") == 0).alias("ok"),
    )


def dq_annotate(df: DataFrame, rules: "dict[str, Column]") -> DataFrame:
    """Row-level expectation ENFORCEMENT, DLT `expect` shape: append a
    ``_failed_checks`` array<string> column naming every rule the row
    violates (``rules`` uses the same TRUE-means-VIOLATES contract as
    :func:`dq_row_checks`). One pure-expression pass — the CASE array +
    null-filter stays inside whole-stage codegen; no shuffle, no UDF —
    so annotating 100 TB costs one scan it was already paying."""
    failed = F.filter(
        F.array(
            *[
                F.when(cond, F.lit(name)).otherwise(F.lit(None))
                for name, cond in rules.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return df.withColumn("_failed_checks", failed)


def dq_split(
    df: DataFrame, rules: "dict[str, Column]"
) -> "tuple[DataFrame, DataFrame]":
    """Quarantine routing (DLT `expect_or_drop` + quarantine table):
    returns (valid, quarantined). Valid rows keep the original schema;
    quarantined rows carry ``_failed_checks`` for triage. Both sides
    derive from ONE annotated plan — cache/persist the annotation when
    writing both sinks to avoid a double scan."""
    ann = dq_annotate(df, rules)
    valid = ann.filter(F.size("_failed_checks") == 0).drop("_failed_checks")
    quarantined = ann.filter(F.size("_failed_checks") > 0)
    return valid, quarantined


def dq_enforce_or_fail(df: DataFrame, rules: "dict[str, Column]") -> DataFrame:
    """DLT `expect_or_fail`: eagerly evaluate the suite (one aggregate
    job via :func:`dq_row_checks`) and raise with per-check violation
    counts if ANY rule fails; otherwise return ``df`` unchanged for the
    pipeline to continue. The admission gate for batches that must be
    all-or-nothing (bounded collect: one row per rule)."""
    bad = {
        r["check"]: r["n_violations"]
        for r in dq_row_checks(df, rules).collect()
        if r["n_violations"] > 0
    }
    if bad:
        raise ValueError(f"data-quality expectations failed: {bad}")
    return df


def dq_unique(df: DataFrame, cols: "list[str]", name: str) -> DataFrame:
    """Uniqueness expectation: n_violations = rows - distinct(cols).
    count + count_distinct in one aggregate (one scan; the distinct
    rides Spark's expand-based partial aggregation, map-side combined).
    """
    wide = df.agg(
        (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols]))
        .cast("long")
        .alias("n_violations")
    )
    return wide.select(
        F.lit(name).alias("check"),
        "n_violations",
        (F.col("n_violations") == 0).alias("ok"),
    )


def dq_referential(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str,
    name: str,
) -> DataFrame:
    """Referential-integrity expectation: count of child rows whose key
    has no parent (left_anti join — broadcast when the parent dim is
    small, hash-partitioned otherwise; Spark picks via AQE)."""
    orphans = child.select(F.col(child_key).alias("k")).join(
        parent.select(F.col(parent_key).alias("k")), "k", "left_anti"
    )
    return orphans.agg(
        F.count(F.lit(1)).cast("long").alias("n_violations")
    ).select(
        F.lit(name).alias("check"),
        "n_violations",
        (F.col("n_violations") == 0).alias("ok"),
    )
