"""Every rows-only query (the ones the DuckDB oracle can't hash-check)
must still be deterministic: two runs in the same session produce
identical rows. This is the engine's no-unseeded-randomness contract
(SURVEY.md §7 M6) enforced mechanically."""

from __future__ import annotations

import pytest

from customer_segmentation_pyspark_spark.queries import REGISTRY
from tests.conftest import SF_SMOKE

ROWS_ONLY = [n for n, s in REGISTRY.items() if s.oracle is None]


def _rows(spark, name):
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_is_deterministic(spark, name):
    assert _rows(spark, name) == _rows(spark, name)


def test_mllib_model_save_load_roundtrip(spark, tmp_path):
    """Fitted models persist and reload with identical centers — the
    operational path for training once and scoring many times."""
    from pyspark.ml.clustering import KMeansModel

    from customer_segmentation_pyspark_spark.plans import kmeans as km
    from customer_segmentation_pyspark_spark.sources import load_table
    from customer_segmentation_pyspark_spark.operators.preprocess import (
        dow_from_ts,
        hour_from_ts,
    )
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_SMOKE, "events")
    feat = ev.select(
        hour_from_ts(F.col("ts")).alias("hour"),
        dow_from_ts(F.col("ts")).alias("dow"),
    )
    model, assembled = km.mllib_kmeans(feat, ["hour", "dow"], k=3, seed=1)
    path = str(tmp_path / "kmeans_model")
    model.save(path)
    loaded = KMeansModel.load(path)
    orig = [list(c) for c in model.clusterCenters()]
    back = [list(c) for c in loaded.clusterCenters()]
    assert orig == back
    a = sorted(r["prediction"] for r in model.transform(assembled).collect())
    b = sorted(r["prediction"] for r in loaded.transform(assembled).collect())
    assert a == b
