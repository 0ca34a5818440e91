"""Sinks: partition pruning from partitioned writes; bucketed tables
eliminate the join shuffle (plan-asserted)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.sources import load_table
from customer_segmentation_pyspark_spark.sources.sinks import (
    write_bucketed_table,
    write_parquet,
)
from tests.conftest import SF_SMOKE


def _plan(df, mode="formatted"):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    li = load_table(spark, SF_SMOKE, "lineitem")
    path = str(tmp_path / "li_part")
    write_parquet(li, path, partition_by=["l_returnflag"])
    back = spark.read.parquet(path).filter(F.col("l_returnflag") == "A")
    p = _plan(back)
    assert "PartitionFilters" in p
    pf = [ln for ln in p.splitlines() if "PartitionFilters" in ln][0]
    assert "l_returnflag" in pf
    expected = li.filter(F.col("l_returnflag") == "A").count()
    assert back.count() == expected


def test_bucketed_join_has_no_shuffle(spark):
    # managed tables land in the default warehouse (./spark-warehouse,
    # gitignored); warehouse.dir is a static conf and can't be redirected
    o = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    write_bucketed_table(o, "orders_b", ["o_orderkey"], num_buckets=8)
    write_bucketed_table(li, "lineitem_b", ["l_orderkey"], num_buckets=8)
    ob = spark.table("orders_b")
    lib = spark.table("lineitem_b")
    joined = ob.join(
        lib, ob.o_orderkey == lib.l_orderkey
    ).groupBy("o_orderpriority").count()
    # disable auto-broadcast so the bucketed sort-merge path is exercised
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = _plan(joined, mode="simple")
        assert "SortMergeJoin" in p
        # bucketed scans feed the join directly: no exchange below the join
        join_part = p.split("SortMergeJoin")[-1]
        assert "Exchange" not in join_part
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_dynamic_partition_pruning(spark, tmp_path):
    """Joining a partition-columned fact to a filtered dim must inject a
    runtime pruning subquery into the fact scan (DPP) — at 100 TB this is
    the difference between scanning 3 partitions and scanning all of
    them. The filter never mentions the fact table explicitly."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    path = str(tmp_path / "li_dpp")
    write_parquet(li, path, partition_by=["l_returnflag"])
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("A", "keep"), ("N", "drop"), ("R", "drop")],
        "flag string, action string",
    )
    j = fact.join(dim, fact.l_returnflag == dim.flag).filter(
        F.col("action") == "keep"
    )
    p = _plan(j)
    assert "dynamicpruning" in p.lower(), p
    assert j.count() == li.filter(F.col("l_returnflag") == "A").count()


def test_runtime_bloom_filter_join(spark):
    """Runtime bloom-filter injection: a selective filter on the build
    side becomes a might_contain() pre-filter on the probe side's scan —
    the shuffle-join analogue of DPP for non-partition keys. Size
    thresholds are lowered to exercise the rewrite at fixture scale (at
    100 TB the 10 GB default application-side threshold is what actually
    gates it)."""
    saved = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        ),
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    try:
        li = load_table(spark, SF_SMOKE, "lineitem")
        o = load_table(spark, SF_SMOKE, "orders").filter(
            F.col("o_totalprice") > 450000
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        p = _plan(j)
        assert "might_contain" in p.lower(), p
        assert "bloom_filter_agg" in p.lower(), p
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
