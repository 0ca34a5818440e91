"""K-means correctness per SURVEY.md §5.2: fixed-init determinism,
invariants (centroid = mean of assigned points, WCSS non-increasing),
custom-vs-MLlib agreement (the reference's own oracle, codeText.txt:139),
and preserved reference semantics (tie-break, convergence, empty-cluster
shrink)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.operators.preprocess import (
    dow_from_ts,
    hour_from_ts,
)
from customer_segmentation_pyspark_spark.plans import kmeans as km
from customer_segmentation_pyspark_spark.sources import load_table
from tests.conftest import SF_SMOKE

INIT4 = [[9.0, 6.0], [7.0, 1.0], [9.0, 3.0], [16.0, 3.0]]


@pytest.fixture(scope="module")
def feat(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    df = ev.select(
        hour_from_ts(F.col("ts")).alias("hour"),
        dow_from_ts(F.col("ts")).alias("dow"),
    ).cache()
    df.count()
    yield df
    df.unpersist()


def test_fixed_init_deterministic(feat):
    r1 = km.kmeans(feat, ["hour", "dow"], k=4, initial_centroids=INIT4)
    r2 = km.kmeans(feat, ["hour", "dow"], k=4, initial_centroids=INIT4)
    assert r1.centroids == r2.centroids
    assert r1.iterations == r2.iterations


def test_centroid_is_mean_of_assigned_points(feat):
    res = km.kmeans(feat, ["hour", "dow"], k=4, initial_centroids=INIT4)
    assigned = km.transform(feat, ["hour", "dow"], res.centroids)
    means = {
        r["cluster"]: (r["mh"], r["md"])
        for r in assigned.groupBy("cluster")
        .agg(F.avg("hour").alias("mh"), F.avg("dow").alias("md"))
        .collect()
    }
    for i, c in enumerate(res.centroids):
        mh, md = means[i]
        # converged => recomputing means reproduces the centroids
        assert abs(mh - c[0]) < 1e-9 and abs(md - c[1]) < 1e-9


def test_wcss_non_increasing_over_iterations(feat):
    res = km.kmeans(feat, ["hour", "dow"], k=4, initial_centroids=INIT4)
    costs = [km.wcss(feat, ["hour", "dow"], cents) for cents in res.history]
    for earlier, later in zip(costs, costs[1:]):
        assert later <= earlier + 1e-6


def test_custom_close_to_mllib(feat):
    """The reference's implicit oracle: its custom engine and MLlib agree
    (report1.docx §Implementation). WCSS of the converged custom run must
    be within 15% of MLlib's trainingCost (different inits -> different
    local optima, but same ballpark)."""
    res = km.kmeans(feat, ["hour", "dow"], k=4, initial_centroids=INIT4)
    custom_cost = km.wcss(feat, ["hour", "dow"], res.centroids)
    model, _ = km.mllib_kmeans(feat, ["hour", "dow"], k=4, seed=1)
    assert custom_cost <= model.summary.trainingCost * 1.15


def test_argmin_tie_break_first_wins(spark):
    """Equidistant point -> lowest-index centroid (codeText.txt:69)."""
    df = spark.createDataFrame([(5.0, 0.0)], "x double, y double")
    out = km.transform(df, ["x", "y"], [[4.0, 0.0], [6.0, 0.0]]).collect()
    assert out[0]["cluster"] == 0


def test_empty_cluster_shrinks_k(spark):
    """A centroid that captures no points disappears (reduceByKey
    semantics, codeText.txt:100)."""
    df = spark.createDataFrame(
        [(0.0, 0.0), (1.0, 0.0)], "x double, y double"
    )
    res = km.kmeans(
        df, ["x", "y"], k=3,
        initial_centroids=[[0.0, 0.0], [1.0, 0.0], [99.0, 99.0]],
        max_iter=5,
    )
    assert len(res.centroids) == 2


def test_convergence_exact_equality(feat):
    res = km.kmeans(feat, ["hour", "dow"], k=4, initial_centroids=INIT4)
    assert res.converged
    assert res.history[-1] == res.history[-2]


def test_cluster_shape_matches_numpy(feat, spark):
    """Grouped-map covariance eigenvalues equal a driver-side numpy
    computation on the same assignment."""
    import numpy as np

    out = {
        r["cluster"]: (r["n"], r["eig_max"], r["eig_min"])
        for r in km.cluster_shape_stats(feat, ["hour", "dow"], INIT4).collect()
    }
    rows = km.transform(feat, ["hour", "dow"], INIT4).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append((r["hour"], r["dow"]))
    for cl, pts in by_cluster.items():
        x = np.array(pts, dtype=np.float64)
        eigs = np.sort(np.linalg.eigvalsh(np.cov(x, rowvar=False)))
        n, emax, emin = out[cl]
        assert n == len(pts)
        assert abs(emax - round(float(eigs[-1]), 6)) < 1e-6
        assert abs(emin - round(float(eigs[0]), 6)) < 1e-6


def test_kmeans_array_highdim_invariants(spark):
    """64-dim Lloyd's: deterministic under fixed seed; WCSS non-increasing
    over the history."""
    from pyspark.sql import functions as F

    from customer_segmentation_pyspark_spark.functions.arrays import (
        array_lit,
        sq_dist,
    )
    from customer_segmentation_pyspark_spark.sources import load_table

    e = load_table(spark, SF_SMOKE, "embeddings")
    pts = e.select(
        F.transform("embedding", lambda x: x.cast("double")).alias("point")
    ).cache()
    r1 = km.kmeans_array(pts, k=4, max_iter=3, seed=7)
    r2 = km.kmeans_array(pts, k=4, max_iter=3, seed=7)
    assert r1.centroids == r2.centroids

    def wcss_of(cents):
        min_sq = F.array_min(
            F.array(*[sq_dist(F.col("point"), array_lit(c)) for c in cents])
        )
        return pts.agg(F.sum(min_sq)).collect()[0][0]

    costs = [wcss_of(c) for c in r1.history]
    for a, b in zip(costs, costs[1:]):
        assert b <= a + 1e-6
    pts.unpersist()


def test_scaled_pipeline_centers_standardized(feat):
    """After StandardScaler(withMean), cluster centers live in z-space:
    their weighted mean is ~0 per dimension."""
    model, transformed = km.mllib_scaled_pipeline(
        feat, ["hour", "dow"], k=4, seed=1
    )
    centers = model.stages[-1].clusterCenters()
    sizes = model.stages[-1].summary.clusterSizes
    total = sum(sizes)
    for d in range(2):
        weighted = sum(c[d] * s for c, s in zip(centers, sizes)) / total
        assert abs(weighted) < 0.05


def test_elbow_runs_and_costs_decrease(feat):
    optimal, costs = km.elbow_k(feat, ["hour"], k_range=range(2, 6), seed=1)
    assert 2 <= optimal <= 5
    assert costs == sorted(costs, reverse=True) or all(
        costs[i] >= costs[i + 1] - 1e-6 for i in range(len(costs) - 1)
    )


def test_mllib_text_pipeline_clusters_documents(spark):
    """r04: q_doc_clustering moved off MLlib (portable featurization so
    the registry row could be SQL-oracled), which removed the
    Tokenizer -> HashingTF -> IDF coverage from the query surface — this
    test keeps the MLlib TEXT pipeline exercised: the four-stage
    pipeline must fit, assign every document to exactly one of k
    clusters, and be deterministic under seed."""
    from pyspark.ml import Pipeline
    from pyspark.ml.clustering import KMeans as MLKMeans
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer

    from customer_segmentation_pyspark_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    d = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol="text", outputCol="toks"),
            HashingTF(inputCol="toks", outputCol="tf", numFeatures=256),
            IDF(inputCol="tf", outputCol="features"),
            MLKMeans(k=5, seed=1, maxIter=10),
        ]
    )
    pred = pipe.fit(d).transform(d)
    n_docs = d.count()
    per = {
        r["prediction"]: r["n"]
        for r in pred.groupBy("prediction")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sum(per.values()) == n_docs  # a partition of the corpus
    assert 1 <= len(per) <= 5 and all(0 <= c <= 4 for c in per)
    # seed determinism: same pipeline, same assignments
    pred2 = pipe.fit(d).transform(d)
    assert [r["prediction"] for r in pred.orderBy("doc_id").collect()] == [
        r["prediction"] for r in pred2.orderBy("doc_id").collect()
    ]
