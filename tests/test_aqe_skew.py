"""AQE skew-join splitting: with a pathologically skewed key, the runtime
re-planner must mark and split the skewed partition (the mechanism that
saves a 100 TB join from one straggler task)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.forceOptimizeSkewedJoin",
        )
    }
    # apply the split even where it would add a shuffle (test determinism)
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # shrink thresholds so test-scale data qualifies as skewed
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    try:
        # 500k rows, 95% on key 0; right side uniform
        big = spark.range(500_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("payload"),
        )
        small = spark.range(30_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        joined = big.join(small, "k").groupBy().agg(F.count(F.lit(1)).alias("n"))
        n = joined.collect()[0]["n"]
        assert n > 0
        # the executed (adaptive) plan must show a skew-handled join
        executed = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in executed, executed[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_coalesces_small_shuffle_partitions(spark):
    """AQE partition coalescing: a tiny aggregate configured with 32
    shuffle partitions must read back through a coalesced AQEShuffleRead
    with far fewer partitions — the runtime fix for over-partitioned
    shuffles (32 000 reducers on a 1 MB group-by at cluster defaults)."""
    from customer_segmentation_pyspark_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    agg = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    agg.collect()  # materialize so AQE finalizes the plan
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan, plan[:800]
    assert "coalesced" in plan, plan[:800]
    n_parts = agg.rdd.getNumPartitions()
    assert n_parts < 32, f"expected coalesced partitions, got {n_parts}"
