"""Salted aggregation / join must be result-identical to the direct plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.operators.skew import (
    salted_agg,
    salted_broadcast_join,
)
from customer_segmentation_pyspark_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_salted_agg_matches_direct(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    direct = {
        (r["l_returnflag"],): (r["cnt"], round(r["total"], 2))
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("cnt"), F.sum("l_quantity").alias("total")
        )
        .collect()
    }
    salted = {
        (r["l_returnflag"],): (r["cnt"], round(r["total"], 2))
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {"cnt": F.count(F.lit(1)), "total": F.sum("l_quantity")},
            salts=8,
        ).collect()
    }
    assert salted == direct


def test_salted_join_matches_direct(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    part = load_table(spark, SF_SMOKE, "part").withColumnRenamed(
        "p_partkey", "l_partkey"
    )
    direct = (
        li.join(part, "l_partkey")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_broadcast_join(li, part, "l_partkey", salts=8)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, salted.collect())
    )
