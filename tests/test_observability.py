from __future__ import annotations

from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.observability import (
    funnel_counts,
    with_row_metric,
)
from customer_segmentation_pyspark_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_observed_count_matches_action(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").filter(F.col("l_quantity") > 25)
    observed, obs = with_row_metric(li, "filtered")
    observed.write.mode("overwrite").format("noop").save()
    assert obs.get["n_rows"] == li.count()


def test_funnel_counts(spark):
    d = load_table(spark, SF_SMOKE, "documents")
    counts = funnel_counts(
        {
            "all": d,
            "long_docs": d.filter(F.col("n_chars") >= 200),
        }
    )
    assert counts["all"] == d.count()
    assert 0 < counts["long_docs"] < counts["all"]
