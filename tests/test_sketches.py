"""Self-oracles for the non-SQL rows-only ops added with the modern
surface: DataSketches HLL accuracy/merge semantics and the EWMA
applyInPandas operator vs a NumPy recursion twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.queries import REGISTRY
from customer_segmentation_pyspark_spark.sources import load_table
from tests.conftest import SF_ORACLE


def test_hll_estimates_within_5pct_of_exact(spark):
    got = {
        r["dow"]: r["est_users"]
        for r in REGISTRY["hll_daily_users"].fn(spark, SF_ORACLE).collect()
    }
    from customer_segmentation_pyspark_spark.operators.preprocess import (
        dow_from_ts,
    )

    ev = load_table(spark, SF_ORACLE, "events")
    exact = {
        r["dow"]: r["n"]
        for r in ev.withColumn("dow", dow_from_ts("ts"))
        .groupBy("dow")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact[-1] = ev.select("user_id").distinct().count()
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) <= 0.05 * exact[k], (k, est, exact[k])


def test_hll_union_is_merge_of_partials(spark):
    """The unioned estimate must come from merging per-day sketches, not
    re-scanning: build the union two ways (union_agg over partial sketches
    vs one global sketch) and require identical estimates — HLL merge is
    lossless over the same binary representation."""
    ev = load_table(spark, SF_ORACLE, "events")
    one_shot = (
        ev.agg(F.hll_sketch_agg("user_id").alias("sk"))
        .select(F.hll_sketch_estimate("sk").cast("bigint").alias("e"))
        .collect()[0]["e"]
    )
    merged = (
        ev.withColumn("g", F.col("user_id") % 7)
        .groupBy("g")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select(F.hll_sketch_estimate("sk").cast("bigint").alias("e"))
        .collect()[0]["e"]
    )
    assert one_shot == merged


def test_ewma_matches_numpy_recursion(spark):
    rows = REGISTRY["ewma_value"].fn(spark, SF_ORACLE).collect()
    got = {r["user_id"]: (r["n_events"], r["ewma_last"]) for r in rows}

    ev = (
        load_table(spark, SF_ORACLE, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r)
    assert set(got) == set(by_user)
    alpha = 0.3
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: (r["ts"], r["event_id"]))
        state = rs[0]["value"]
        for r in rs[1:]:
            state = alpha * r["value"] + (1 - alpha) * state
        n, last = got[uid]
        assert n == len(rs)
        assert abs(last - round(state, 6)) < 1e-9, uid
