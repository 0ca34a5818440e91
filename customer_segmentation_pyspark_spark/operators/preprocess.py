"""Preprocessing operators from the reference's notebook, Spark-first.

Covers SURVEY.md §2.2 (P1–P8) and §2.4 A6: CASE-WHEN dow bucketing,
weekday naming, casts, seeded shuffling/sampling, and the 2-D histogram
aggregate that replaces driver-side ``plt.hist2d`` (codeText.txt:221 etc.)
with a distributed group-by so density plots scale to 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Reference bucket semantics: {0,1}->0 (weekend-ish), {2,3,4}->1, else->2
# (codeText.txt:26-29).
DOW_BUCKETS = ((0, 1), (2, 3, 4))

WEEKDAY_NAMES = (
    "Monday",
    "Tuesday",
    "Wednesday",
    "Thursday",
    "Friday",
    "Saturday",
    "Sunday",
)


def dow_bucket(dow: Column) -> Column:
    """3-way CASE bucket of a 0-6 day-of-week (codeText.txt:26-29).

    Pure Catalyst expression — constant-folded IN-lists, whole-stage
    codegen; no UDF.
    """
    return (
        F.when(dow.isin(list(DOW_BUCKETS[0])), F.lit(0))
        .when(dow.isin(list(DOW_BUCKETS[1])), F.lit(1))
        .otherwise(F.lit(2))
    )


def weekday_name(dow: Column) -> Column:
    """0->Monday ... 6->Sunday, else 'None' (codeText.txt:32-41)."""
    expr = F.when(dow == 0, F.lit(WEEKDAY_NAMES[0]))
    for i, name in enumerate(WEEKDAY_NAMES[1:], start=1):
        expr = expr.when(dow == i, F.lit(name))
    return expr.otherwise(F.lit("None"))


def dow_from_ts(ts: Column) -> Column:
    """0-6 day-of-week (0=Monday, ISO-style) from a timestamp.

    Spark's ``dayofweek`` is 1=Sunday..7=Saturday; we normalize to the
    reference's 0-6 domain using the ISO weekday so fixtures line up with
    the Instacart-style ``order_dow`` semantics (FIXTURES.md §C).
    """
    return (F.dayofweek(ts) + 5) % 7  # Mon=0 .. Sun=6


def hour_from_ts(ts: Column) -> Column:
    return F.hour(ts)


def histogram2d(
    df: DataFrame,
    xcol: str,
    ycol: str,
    xbin: float = 1.0,
    ybin: float = 1.0,
) -> DataFrame:
    """Distributed 2-D histogram: the engine-side replacement for the
    reference's driver-side ``plt.hist2d`` over a full ``collect()``
    (codeText.txt:209,221 — S3+S4 in SURVEY.md §2.1).

    One hash aggregate; output is ≤ (#x-bins × #y-bins) rows regardless of
    input size, so a 100 TB table reduces to a plottable grid on executors.
    """
    return (
        df.groupBy(
            F.floor(F.col(xcol) / xbin).cast("long").alias("x_bin"),
            F.floor(F.col(ycol) / ybin).cast("long").alias("y_bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def shuffled_sample(df: DataFrame, k: int, seed: int = 42) -> DataFrame:
    """Seeded replacement for ``orderBy(rand()).limit(k)``
    (codeText.txt:53-56, O1/O2/O3).

    Catalyst rewrites sort+limit into TakeOrderedAndProject (top-k per
    partition + driver merge of k·P rows) — no full sort materializes, so
    this is scale-safe; the seed makes it reproducible, which the
    reference's unseeded ``rand()`` is not.
    """
    return df.orderBy(F.rand(seed)).limit(k)


def with_row_index(df: DataFrame, name: str = "row_id") -> DataFrame:
    """Stable per-row ordinal (O4, codeText.txt:83 ``zipWithIndex``).

    ``monotonically_increasing_id`` is non-contiguous but stable and needs
    no extra job or shuffle, unlike RDD ``zipWithIndex`` which runs a
    count-job first. Contiguity is not required by any consumer here.
    """
    return df.withColumn(name, F.monotonically_increasing_id())
