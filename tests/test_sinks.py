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
