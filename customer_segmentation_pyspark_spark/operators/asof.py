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


def asof_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Alternative as-of join via cogrouped ``applyInPandas``: both inputs
    shuffle once on the key, each key's two groups meet in one Python
    worker, and ``pd.merge_asof`` does the backward match per group.

    Exists as the cross-check twin of :func:`asof_join` (tested equal) and
    as the template for per-key logic pandas has but Catalyst lacks. Inner
    semantics; same determinism requirement (unique (key, ts) on right).
    """
    import pandas as pd
    from pyspark.sql import types as T

    lcols = list(left.columns)
    out_schema = T.StructType(
        [left.schema[c] for c in lcols]
        + [right.select(*payload_cols).schema[c] for c in payload_cols]
    )

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        if l_pdf.empty:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        l_sorted = l_pdf.sort_values(left_ts)
        if r_pdf.empty:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        r_sorted = r_pdf.sort_values(right_ts)[[right_ts, *payload_cols]]
        merged = pd.merge_asof(
            l_sorted,
            r_sorted,
            left_on=left_ts,
            right_on=right_ts,
            direction="backward",
            suffixes=("", "_r"),
        )
        matched = merged.dropna(subset=[payload_cols[0]])
        out = matched[[*lcols, *payload_cols]].copy()
        # merge_asof promotes int payload columns to float64 when any row
        # missed; restore integer dtypes after the inner-filter
        for f in out_schema.fields:
            if f.name in payload_cols and isinstance(f.dataType, T.LongType):
                out[f.name] = out[f.name].astype("int64")
        return out

    return (
        left.groupBy(left_key)
        .cogroup(right.groupBy(right_key))
        .applyInPandas(merge, schema=out_schema)
    )
