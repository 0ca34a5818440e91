"""The two as-of join implementations (expression window vs cogrouped
pd.merge_asof) must agree exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.operators.asof import (
    asof_join,
    asof_join_cogroup,
)
from customer_segmentation_pyspark_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_asof_implementations_agree(spark):
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "ts"
    )
    o = (
        load_table(spark, SF_SMOKE, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max("o_orderkey").alias("o_orderkey"),
            F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
        )
    )
    kwargs = dict(
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_totalprice"],
    )
    expr_rows = {
        (r["event_id"], r["o_orderkey"], r["o_totalprice"])
        for r in asof_join(ev, o, how="inner", **kwargs).collect()
    }
    cg_rows = {
        (r["event_id"], r["o_orderkey"], r["o_totalprice"])
        for r in asof_join_cogroup(ev, o, **kwargs).collect()
    }
    assert expr_rows == cg_rows
    assert expr_rows, "fixture should produce as-of matches"
