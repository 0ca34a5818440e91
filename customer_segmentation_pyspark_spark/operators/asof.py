"""As-of (most-recent-prior) join — an operator Spark has no primitive for,
composed from union + carry-forward window per SURVEY.md §7's custom-op
rule (a: composition of DataFrame ops).

Semantics: for each left row, attach the right row with the greatest
``right_ts <= left_ts`` within the same key (DuckDB's ``ASOF JOIN``, kdb's
``aj``). Implementation: tag both inputs, union, sort each key group once
by (ts, side), and carry the last-seen right payload forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding window.

Cost shape: ONE shuffle on the key (the window partition), no range
self-join, no per-row probing — the same plan a native implementation
would want at 100 TB. Right rows at equal timestamps sort before left rows
so an exactly-simultaneous match counts; callers must make (key, ts)
unique on the right side for deterministic output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """Columns returned: all of ``left`` + ``payload_cols`` from the
    matched right row (null payload rows dropped when how='inner')."""
    assert how in ("inner", "left")
    payload = F.struct(*[F.col(c) for c in payload_cols])
    l_tagged = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(payload).schema[0].dataType
        ).alias("_r"),
    )
    r_tagged = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns])
            ).schema[0].dataType
        ).alias("_l"),
        payload.alias("_r"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_tagged.unionByName(r_tagged)
        .withColumn("_match", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_is_left") == 1)
    )
    if how == "inner":
        carried = carried.filter(F.col("_match").isNotNull())
    return carried.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_match.{c}").alias(c) for c in payload_cols],
    )
