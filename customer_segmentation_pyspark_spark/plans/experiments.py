"""The reference's experiment matrix as a library entry point.

The reference notebook runs seven 'queries' (SURVEY.md §2.10): six custom
K-means runs over two feature pairs with K in {3,4,5} and hard-coded
initial centroids, plus one elbow sweep (codeText.txt:190,199,418,426,
636,642,166). This module reproduces that matrix over the fixture events
table (feature mapping per FIXTURES.md §C) with a single cached feature
frame shared across all runs — the reference re-reads and re-shuffles its
CSV for every run.

Initial centroids follow report1.docx §Conclusion / BASELINE.md; they are
semantics templates on fixtures (the fixture data differs from the
Instacart CSV, so final centroids differ — determinism, convergence and
invariants are the checkable contract, enforced in tests/test_kmeans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.operators.preprocess import (
    dow_from_ts,
    hour_from_ts,
)
from customer_segmentation_pyspark_spark.plans import kmeans as km
from customer_segmentation_pyspark_spark.sources import load_table

# (name, features, k, max_iter, initial centroids) — BASELINE.md rows
EXPERIMENTS = [
    ("exp1a_k3_hour_dow", ("hour", "dow"), 3, 10,
     [[17, 0], [13, 0], [8, 3]]),
    ("exp1b_k3_dow_dept", ("dow", "dept"), 3, 10,
     [[0, 16], [4, 14], [6, 19]]),
    ("exp3a_k4_hour_dow", ("hour", "dow"), 4, 10,
     [[9, 6], [7, 1], [9, 3], [16, 3]]),
    ("exp3b_k4_dow_dept", ("dow", "dept"), 4, 20,
     [[0, 14], [0, 19], [3, 13], [0, 16]]),
    ("exp2a_k5_hour_dow", ("hour", "dow"), 5, 10,
     [[11, 0], [18, 2], [19, 6], [13, 6], [17, 1]]),
    ("exp2b_k5_dow_dept", ("dow", "dept"), 5, 20,
     [[6, 4], [5, 16], [6, 4], [6, 7], [0, 19]]),
]


def feature_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(hour, dow, dept) features from events — the fixture analogue of the
    reference's (order_hour_of_day, order_dow, department_id)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        hour_from_ts(F.col("ts")).cast("double").alias("hour"),
        dow_from_ts(F.col("ts")).cast("double").alias("dow"),
        (F.get_json_object("props", "$.k").cast("long") % 21)
        .cast("double")
        .alias("dept"),
    )


def run_reference_experiments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Run the six fixed-init K-means experiments plus the elbow sweep on
    one cached feature frame; returns one row per final centroid plus one
    row for the elbow choice."""
    feat = feature_frame(spark, sf_dir).cache()
    try:
        rows = []
        for name, cols, k, max_iter, init in EXPERIMENTS:
            res = km.kmeans(
                feat, list(cols), k=k, max_iter=max_iter,
                initial_centroids=[[float(v) for v in c] for c in init],
            )
            for i, c in enumerate(res.centroids):
                rows.append(
                    (name, k, i, round(c[0], 6), round(c[1], 6),
                     res.iterations, res.converged)
                )
        optimal, _ = km.elbow_k(feat, ["hour"], k_range=range(2, 12), seed=1)
        rows.append(("elbow_hour", optimal, -1, None, None, 0, True))
        return spark.createDataFrame(
            rows,
            "experiment string, k long, cluster long, c0 double, c1 double,"
            " n_iter long, converged boolean",
        )
    finally:
        feat.unpersist()
