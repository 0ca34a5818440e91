"""K-means: DataFrame-native Lloyd's loop + MLlib path + elbow selection.

Re-expresses the reference's hand-rolled MapReduce K-means
(codeText.txt:79-109, SURVEY.md §2.10 M1/§3.2) Spark-first:

reference (RDD)                          this engine (DataFrame)
---------------------------------------  --------------------------------------
df.rdd.map(list) per-row Python          features stay columns; all math is
                                         Catalyst expressions (codegen)
centroids closure-pickled per task       centroids are a literal array in the
(codeText.txt:91)                        plan — one broadcast, no re-pickle
reduceByKey((vec,1)) then mean           single groupBy().avg() hash aggregate
(codeText.txt:97-103)                    (partial+final, map-side combine)
no caching — full lineage (CSV re-read   .cache() on the projected feature
+ random re-shuffle) per iteration       frame before the loop
collect() of sums per iteration          collect() of k centroid rows only

Preserved reference semantics (SURVEY.md §7.3):
  * argmin tie-break: first (lowest-index) centroid wins (codeText.txt:69);
  * convergence: EXACT float equality of the full centroid list
    (codeText.txt:46-49) — compared in cluster-id order, a documented fix
    (the reference compares in nondeterministic collect() order, §3.2);
  * empty clusters drop out (k may shrink) exactly as reduceByKey drops
    absent keys (codeText.txt:100);
  * injectable initial centroids (hard-coded inits at codeText.txt:667 etc.)
    and seeded random init (the reference's orderBy(rand()).limit(k) at
    codeText.txt:53-56, unseeded there).

Scale notes: per iteration the job is scan(cached) -> codegen'd project ->
one hash-agg shuffle of k rows per partition -> k-row collect. Driver state
is O(k·dim). That plan is unchanged at 1000 executors; there is no
all-to-driver materialization anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.functions.arrays import (
    array_argmin,
    array_lit,
    sq_dist,
)

Centroids = list[list[float]]


def _features_array(df: DataFrame, feature_cols: Sequence[str]) -> DataFrame:
    """Project feature columns into one array<double> column 'point'."""
    return df.select(
        F.array(*[F.col(c).cast("double") for c in feature_cols]).alias("point")
    )


def assign_clusters(points: DataFrame, centroids: Centroids) -> DataFrame:
    """Add 'cluster' = argmin over squared distances to each centroid.

    The centroid list rides inside the plan as a constant-folded literal
    array-of-arrays (k is small by definition), replacing the reference's
    k×N driver nested loop (codeText.txt:280 etc.) with a codegen'd
    per-row expression — the broadcast-crossJoin+argmin of SURVEY.md §2.3
    fused into a single projection, no join or shuffle at all.
    """
    dists = F.array(
        *[sq_dist(F.col("point"), array_lit(c)) for c in centroids]
    )
    return points.withColumn("cluster", array_argmin(dists))


def random_initial_centroids(
    points: DataFrame, k: int, seed: int = 42
) -> Centroids:
    """Seeded pick of k rows (reference: orderBy(rand()).limit(k).collect(),
    codeText.txt:53-56; TakeOrderedAndProject keeps it top-k, not full sort).
    """
    rows = points.orderBy(F.rand(seed)).limit(k).collect()
    return [list(r["point"]) for r in rows]


@dataclass
class KMeansResult:
    centroids: Centroids
    iterations: int
    converged: bool
    history: list[Centroids] = field(default_factory=list)


def kmeans_array(
    points_df: DataFrame,
    k: int,
    max_iter: int = 10,
    initial_centroids: Centroids | None = None,
    seed: int = 42,
    array_col: str = "point",
) -> KMeansResult:
    """Lloyd's loop over an array<double> feature column (e.g. a 64-dim
    embedding) — same semantics as :func:`kmeans`, dimension-agnostic.
    The per-iteration plan is unchanged: one cached scan, one hash-agg
    shuffle, k rows to the driver; cost scales linearly in dim because
    the assignment expression is one fused projection."""
    return _lloyd(
        points_df.select(F.col(array_col).alias("point")),
        k, max_iter, initial_centroids, seed,
    )


def kmeans(
    df: DataFrame,
    feature_cols: Sequence[str],
    k: int,
    max_iter: int = 10,
    initial_centroids: Centroids | None = None,
    seed: int = 42,
) -> KMeansResult:
    """DataFrame-native Lloyd's loop (reference M1, codeText.txt:79-109).

    Returns centroids only, like the reference; call :func:`assign_clusters`
    (or :func:`transform`) for assignments.
    """
    return _lloyd(
        _features_array(df, feature_cols), k, max_iter, initial_centroids, seed
    )


def _lloyd(
    points_plan: DataFrame,
    k: int,
    max_iter: int,
    initial_centroids: Centroids | None,
    seed: int,
) -> KMeansResult:
    points = points_plan.cache()
    try:
        if initial_centroids is not None:
            centroids: Centroids = [
                [float(v) for v in c] for c in initial_centroids
            ]
        else:
            centroids = random_initial_centroids(points, k, seed=seed)

        history = [centroids]
        converged = False
        it = 0
        for it in range(1, max_iter + 1):
            # one hash aggregate: partial avg per partition, final merge;
            # only k rows cross to the driver.
            new_rows = (
                assign_clusters(points, centroids)
                .groupBy("cluster")
                .agg(
                    *[
                        F.avg(F.col("point").getItem(i)).alias(f"c{i}")
                        for i in range(len(centroids[0]))
                    ]
                )
                .collect()
            )
            # cluster-id order (deterministic compare; see module docstring).
            # Empty clusters are simply absent — k shrinks, as in the
            # reference's reduceByKey.
            new_rows.sort(key=lambda r: r["cluster"])
            new_centroids = [
                [float(r[f"c{i}"]) for i in range(len(centroids[0]))]
                for r in new_rows
            ]
            history.append(new_centroids)
            # exact float equality against the previous iteration, in
            # cluster-id order (reference F4, codeText.txt:46-49).
            if new_centroids == centroids:
                converged = True
                break
            centroids = new_centroids
        return KMeansResult(
            centroids=centroids,
            iterations=it,
            converged=converged,
            history=history,
        )
    finally:
        points.unpersist()


def transform(
    df: DataFrame, feature_cols: Sequence[str], centroids: Centroids
) -> DataFrame:
    """df + 'cluster' assignment column (reference M6, executor-side —
    replaces the driver loops at codeText.txt:280,389,...)."""
    arr = F.array(*[F.col(c).cast("double") for c in feature_cols])
    dists = F.array(*[sq_dist(arr, array_lit(c)) for c in centroids])
    return df.withColumn("cluster", array_argmin(dists))


def wcss(
    df: DataFrame, feature_cols: Sequence[str], centroids: Centroids
) -> float:
    """Within-cluster sum of squares (reference A3/F2, codeText.txt:144-145)
    as one aggregate — no per-k RDD repass."""
    arr = F.array(*[F.col(c).cast("double") for c in feature_cols])
    min_sq = F.array_min(
        F.array(*[sq_dist(arr, array_lit(c)) for c in centroids])
    )
    return df.agg(F.sum(min_sq).alias("wcss")).collect()[0]["wcss"]


def cluster_shape_stats(
    df: DataFrame, feature_cols: Sequence[str], centroids: Centroids
) -> DataFrame:
    """Per-cluster covariance eigen-structure via grouped-map
    ``applyInPandas`` — the sanctioned use of the grouped-map API: the
    aggregate (eigenvalues of the within-cluster covariance, i.e. the
    cluster's principal axes) is not expressible as SQL aggregates.

    Scale shape: assignment is the usual zero-shuffle projection; the
    grouped map shuffles rows once by cluster id, and each group reduces
    to ONE output row (k rows total), so output and driver cost are O(k).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    assigned = transform(df, feature_cols, centroids).select(
        "cluster", *[F.col(c).cast("double") for c in feature_cols]
    )
    schema = T.StructType(
        [
            T.StructField("cluster", T.IntegerType()),
            T.StructField("n", T.LongType()),
            T.StructField("eig_max", T.DoubleType()),
            T.StructField("eig_min", T.DoubleType()),
            T.StructField("anisotropy", T.DoubleType()),
        ]
    )

    cols = list(feature_cols)

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[cols].to_numpy(dtype=np.float64)
        cluster = int(pdf["cluster"].iloc[0])
        n = len(x)
        if n < 2:
            return pd.DataFrame(
                [[cluster, n, 0.0, 0.0, 0.0]], columns=schema.fieldNames()
            )
        cov = np.cov(x, rowvar=False)
        eigs = np.sort(np.linalg.eigvalsh(np.atleast_2d(cov)))
        emax, emin = float(eigs[-1]), float(eigs[0])
        aniso = float(emax / emin) if emin > 1e-12 else float("inf")
        return pd.DataFrame(
            [[cluster, n, round(emax, 6), round(emin, 6), round(aniso, 6)]],
            columns=schema.fieldNames(),
        )

    return assigned.groupBy("cluster").applyInPandas(stats, schema=schema)


# ---------------------------------------------------------------------------
# MLlib path (reference M2-M5, codeText.txt:127-162)
# ---------------------------------------------------------------------------

def mllib_kmeans(
    df: DataFrame,
    feature_cols: Sequence[str],
    k: int,
    seed: int = 1,
    max_iter: int = 20,
):
    """VectorAssembler + pyspark.ml KMeans (codeText.txt:132-140; seed=1 as
    pinned there). Returns (model, assembled_df)."""
    from pyspark.ml.clustering import KMeans as MLKMeans
    from pyspark.ml.feature import VectorAssembler

    assembler = VectorAssembler(
        inputCols=list(feature_cols), outputCol="features"
    )
    assembled = assembler.transform(
        df.select(*[F.col(c).cast("double").alias(c) for c in feature_cols])
    )
    model = MLKMeans(k=k, seed=seed, maxIter=max_iter).fit(assembled)
    return model, assembled


def mllib_scaled_pipeline(
    df: DataFrame,
    feature_cols: Sequence[str],
    k: int,
    seed: int = 1,
    max_iter: int = 20,
):
    """pyspark.ml Pipeline: VectorAssembler -> StandardScaler -> KMeans.

    Standardization before clustering removes unit dominance (hour 0-23 vs
    dept 0-20 cluster differently unscaled — the reference never scaled,
    which its report's elongated clusters show). Returns (pipeline_model,
    transformed_df)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.clustering import KMeans as MLKMeans
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    stages = [
        VectorAssembler(inputCols=list(feature_cols), outputCol="raw"),
        StandardScaler(
            inputCol="raw", outputCol="features", withMean=True, withStd=True
        ),
        MLKMeans(k=k, seed=seed, maxIter=max_iter),
    ]
    clean = df.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols]
    )
    model = Pipeline(stages=stages).fit(clean)
    return model, model.transform(clean)


def elbow_k(
    df: DataFrame,
    feature_cols: Sequence[str],
    k_range: Sequence[int] = range(2, 12),
    seed: int = 1,
) -> tuple[int, list[float]]:
    """WCSS sweep + second-difference argmin elbow (reference find_k,
    codeText.txt:127-162; elbow rule np.diff(wcss, 2).argmin()+2 preserved
    as spec'd at codeText.txt:149-150).

    Uses ``model.summary.trainingCost`` (the WCSS MLlib already computed)
    instead of the reference's extra full RDD pass per k
    (codeText.txt:144-145).
    """
    import numpy as np

    costs: list[float] = []
    for k in k_range:
        model, _ = mllib_kmeans(df, feature_cols, k=k, seed=seed)
        costs.append(float(model.summary.trainingCost))
    deltas = np.diff(costs, 2)
    # reference: optimal index = argmin of 2nd difference, +1, then +1 again
    # because k_range starts at 2 (codeText.txt:149-150 semantics).
    optimal = int(np.argmin(deltas)) + 1 + list(k_range)[0] - 1
    return optimal, costs
