"""Opt-in scale smoke (SPARK_GRAFT_SCALE_TEST=1): replicate lineitem 10x
(~6M rows) into /tmp and verify the core aggregate/join plans produce
correct results and near-linear runtime. Excluded from the default suite
to keep CI fast; run manually when touching partitioning/shuffle logic."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.sources import load_table

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_TEST") != "1",
    reason="scale smoke is opt-in (SPARK_GRAFT_SCALE_TEST=1)",
)

SF01 = "/root/testdata/sf0.1"
REPLICAS = 10


@pytest.fixture(scope="module")
def big_lineitem(spark, tmp_path_factory):
    """lineitem x10 with shifted order keys (~6M rows, written once)."""
    path = str(tmp_path_factory.mktemp("scale") / "lineitem_big")
    li = load_table(spark, SF01, "lineitem")
    shift = 10_000_000
    parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * shift))
        for i in range(REPLICAS)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.repartition(32).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def test_agg_correct_and_scales(spark, big_lineitem):
    li = load_table(spark, SF01, "lineitem")
    base = {
        (r["l_returnflag"], r["l_linestatus"]): (r["n"], r["qty"])
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty"))
        .collect()
    }
    t0 = time.perf_counter()
    big = {
        (r["l_returnflag"], r["l_linestatus"]): (r["n"], r["qty"])
        for r in big_lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty"))
        .collect()
    }
    elapsed = time.perf_counter() - t0
    for k, (n, qty) in base.items():
        assert big[k][0] == n * REPLICAS
        assert abs(big[k][1] - qty * REPLICAS) < 1e-4 * qty
    # 6M rows through a hash agg should be a few seconds on local[32]
    assert elapsed < 30, f"agg at 10x took {elapsed:.1f}s"


def test_join_correct_at_scale(spark, big_lineitem):
    part = load_table(spark, SF01, "part")
    joined = (
        big_lineitem.join(
            F.broadcast(part),
            big_lineitem.l_partkey == part.p_partkey,
        )
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    base = (
        load_table(spark, SF01, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {r["p_brand"]: r["n"] for r in joined.collect()}
    expected = {r["p_brand"]: r["n"] * REPLICAS for r in base.collect()}
    assert got == expected
