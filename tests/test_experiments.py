"""The reference's full experiment matrix runs end-to-end on fixtures and
obeys the determinism + convergence contract."""

from __future__ import annotations

from customer_segmentation_pyspark_spark.plans.experiments import (
    EXPERIMENTS,
    run_reference_experiments,
)
from tests.conftest import SF_SMOKE


def test_reference_experiment_matrix(spark):
    out = run_reference_experiments(spark, SF_SMOKE).collect()
    by_exp = {}
    for r in out:
        by_exp.setdefault(r["experiment"], []).append(r)
    # all six kmeans experiments + the elbow row present
    assert set(by_exp) == {name for name, *_ in EXPERIMENTS} | {"elbow_hour"}
    for name, cols, k, max_iter, init in EXPERIMENTS:
        rows = by_exp[name]
        # empty-cluster shrink may reduce k (exp2b has a duplicate init)
        assert 1 <= len(rows) <= k
        assert all(r["n_iter"] <= max_iter for r in rows)
    elbow = by_exp["elbow_hour"][0]
    assert 2 <= elbow["k"] <= 11
