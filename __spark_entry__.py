"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (SURVEY.md §7.2): events scan ->
dow/hour derivation -> CASE bucketing -> fixed-init DataFrame-native K-means
-> per-cluster summary. ``queries()``/``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 plus the LLM-pipeline extensions;
implementations live in ``customer_segmentation_pyspark_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the driver may exec this file by path from any cwd; make the engine
# package importable regardless
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from customer_segmentation_pyspark_spark.queries import CENTROIDS_4, REGISTRY  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Exercises S1, P1, P3-P6, A1-A5, F1, M1 in one pipeline (SURVEY.md §7.2):
    scan events -> derive (hour, dow) -> CASE-bucket dow -> K-means k=4 with
    the reference's exp-3A initial centroids -> assignments + centroid
    summary per cluster.

    The SAME pipeline runs at the bench SF (default sf0.1) as the
    oracled+benched registry query ``flagship_segmentation`` (r09,
    VERDICT #6) — its wall time lands in BENCH.json per round.
    """
    from customer_segmentation_pyspark_spark.operators.preprocess import (
        dow_bucket,
        dow_from_ts,
        hour_from_ts,
    )
    from customer_segmentation_pyspark_spark.plans import kmeans as km
    from customer_segmentation_pyspark_spark.sources import load_table

    ev = load_table(spark, SF0001, "events")
    feat = ev.select(
        hour_from_ts(F.col("ts")).cast("long").alias("hour"),
        dow_from_ts(F.col("ts")).cast("long").alias("dow"),
        dow_bucket(dow_from_ts(F.col("ts"))).cast("long").alias("dow_bucket"),
    )
    res = km.kmeans(
        feat, ["hour", "dow"], k=4, max_iter=10, initial_centroids=CENTROIDS_4
    )
    assigned = km.transform(feat, ["hour", "dow"], res.centroids)
    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.avg("hour"), 4).alias("mean_hour"),
        F.round(F.avg("dow"), 4).alias("mean_dow"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (omitted for non-SQL ops)."""
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }
