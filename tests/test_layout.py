"""Data-layout guarantees for scan pruning at scale: range-partitioned
writes produce disjoint per-file key ranges (so min/max row-group stats
prune range predicates), and mergeSchema reads survive schema evolution."""

from __future__ import annotations

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_range_partitioned_write_has_disjoint_file_ranges(spark, tmp_path):
    """repartitionByRange + sortWithinPartitions = the write recipe that
    makes single-column range predicates prunable by parquet min/max
    stats: every output file owns a disjoint o_custkey range."""
    o = load_table(spark, SF_SMOKE, "orders")
    out = str(tmp_path / "orders_ranged")
    (
        o.repartitionByRange(8, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(out)
    )
    files = [str(p) for p in (tmp_path / "orders_ranged").glob("*.parquet")]
    assert len(files) >= 4
    ranges = []
    for f in files:
        pf = pq.ParquetFile(f)
        md = pf.metadata
        col_idx = pf.schema_arrow.names.index("o_custkey")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges {(lo1, hi1)} {(lo2, hi2)}"


def test_merge_schema_reads_evolved_table(spark, tmp_path):
    """Schema evolution: a second write adds a column; mergeSchema=True
    reads both generations, nulling the missing column for old files —
    the append-only evolution contract a long-lived 100 TB table needs."""
    out = str(tmp_path / "evolving")
    ev = load_table(spark, SF_SMOKE, "events")
    gen1 = ev.select("event_id", "user_id").limit(50)
    gen1.write.mode("overwrite").parquet(out + "/gen=1")
    gen2 = ev.select(
        "event_id", "user_id", F.col("value").alias("score")
    ).limit(30)
    gen2.write.mode("overwrite").parquet(out + "/gen=2")

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"event_id", "user_id", "score", "gen"}
    assert merged.count() == 80
    nulls = merged.filter(
        (F.col("gen") == 1) & F.col("score").isNull()
    ).count()
    assert nulls == 50


def test_ignore_corrupt_files_skips_garbage(spark, tmp_path):
    """Operational hardening: with ignoreCorruptFiles a scan survives a
    non-parquet file dropped into the table directory (truncated upload,
    stray artifact) instead of failing a 6-hour batch; without it the
    read must fail loudly."""
    out = str(tmp_path / "tbl")
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id")
    ev.limit(40).write.mode("overwrite").parquet(out)
    (tmp_path / "tbl" / "part-garbage.parquet").write_bytes(
        b"this is not a parquet file"
    )

    import pytest as _pytest

    with _pytest.raises(Exception):
        spark.read.parquet(out).count()

    n = (
        spark.read.option("ignoreCorruptFiles", "true")
        .parquet(out)
        .count()
    )
    assert n == 40


def test_dynamic_partition_overwrite_preserves_other_partitions(
    spark, tmp_path
):
    """INSERT OVERWRITE with partitionOverwriteMode=dynamic replaces only
    the partitions present in the incoming data — the daily-reload
    contract: rewriting day N must not wipe days 1..N-1."""
    out = str(tmp_path / "parted")
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type"
    )
    ev.write.partitionBy("event_type").mode("overwrite").parquet(out)
    before = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(out)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }

    replacement = (
        ev.filter(F.col("event_type") == "click")
        .limit(7)
        .withColumn("user_id", F.lit(-1).cast("long"))
    )
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        replacement.write.partitionBy("event_type").mode(
            "overwrite"
        ).parquet(out)
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", old_mode
        )

    after = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(out)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert after["click"] == 7  # only the incoming partition replaced
    for k in before:
        if k != "click":
            assert after[k] == before[k], k


def test_csv_malformed_rows_permissive_and_dropmalformed(spark, tmp_path):
    """CSV resilience: PERMISSIVE captures broken rows in
    _corrupt_record (nulling typed columns); DROPMALFORMED silently
    drops them — a 100 TB ingest must choose, not crash."""
    src = tmp_path / "raw.csv"
    src.write_text("a,b\n1,2\n3,4\nnot_an_int,5\n6,7\n")
    schema = "a INT, b INT, _corrupt_record STRING"

    perm = (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(src))
    )
    rows = perm.collect()
    assert len(rows) == 4
    corrupt = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(corrupt) == 1 and corrupt[0]["a"] is None

    dropped = (
        spark.read.schema("a INT, b INT")
        .option("header", "true")
        .option("mode", "DROPMALFORMED")
        .csv(str(src))
    )
    assert sorted(r["a"] for r in dropped.collect()) == [1, 3, 6]


def test_compaction_reduces_file_count_preserving_data(spark, tmp_path):
    from customer_segmentation_pyspark_spark.sources.sinks import (
        compact_table,
    )

    out = str(tmp_path / "frag")
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id")
    ev.repartition(24).write.mode("overwrite").parquet(out)
    n_before = len(list((tmp_path / "frag").glob("*.parquet")))
    assert n_before >= 20
    total = spark.read.parquet(out).count()

    n_after = compact_table(spark, out, target_files=3, order_by=["event_id"])
    assert n_after <= 4
    assert spark.read.parquet(out).count() == total
    assert len(list((tmp_path / "frag").glob("*.parquet"))) == n_after


def test_sql_ddl_surface_create_insert_select(spark, tmp_path):
    """Pure-SQL user path: CREATE TABLE USING parquet at an explicit
    LOCATION, INSERT INTO ... SELECT from a temp view, query back — the
    engine is usable without touching the DataFrame API."""
    loc = str(tmp_path / "sqltbl")
    load_table(spark, SF_SMOKE, "nation").createOrReplaceTempView(
        "nation_src"
    )
    spark.sql("DROP TABLE IF EXISTS eng_nations")
    spark.sql(
        f"""CREATE TABLE eng_nations (n_nationkey INT, n_name STRING)
            USING parquet LOCATION '{loc}'"""
    )
    try:
        spark.sql(
            """INSERT INTO eng_nations
               SELECT n_nationkey, n_name FROM nation_src
               WHERE n_nationkey < 10"""
        )
        got = spark.sql(
            "SELECT count(*) AS n, min(n_name) AS first FROM eng_nations"
        ).collect()[0]
        assert got["n"] == 10
        assert got["first"] == "NATION_0"
    finally:
        spark.sql("DROP TABLE IF EXISTS eng_nations")


def test_zorder_sort_narrows_per_file_stats_vs_random(spark, tmp_path):
    """The point of the Z-order key: files written in zkey order have
    much narrower per-file user_id min/max spans than a randomly
    shuffled layout, so a user_id predicate can skip most files on
    parquet stats alone.  Measured, not assumed: mean span must shrink."""
    import pyarrow.parquet as pq

    from customer_segmentation_pyspark_spark.queries import _morton10

    # balanced 5-bit buckets on both dimensions so neither dominates the
    # curve (raw user_id spans 4 bits at this SF vs 9 for value)
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    keyed = ev.withColumn(
        "x_bucket", (F.col("user_id") * 7 % 32).cast("bigint")
    ).withColumn(
        "y_bucket", (F.floor("value").cast("bigint") % 32)
    ).withColumn(
        "zkey", _morton10(F.col("x_bucket"), F.col("y_bucket"))
    )

    def mean_span(path):
        spans = []
        for f in path.glob("*.parquet"):
            pf = pq.ParquetFile(str(f))
            idx = pf.schema_arrow.names.index("x_bucket")
            md = pf.metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            spans.append(max(maxs) - min(mins))
        return sum(spans) / len(spans)

    zdir = tmp_path / "zsorted"
    (
        keyed.repartitionByRange(8, "zkey")
        .sortWithinPartitions("zkey")
        .write.mode("overwrite")
        .parquet(str(zdir))
    )
    rdir = tmp_path / "random"
    keyed.repartition(8).write.mode("overwrite").parquet(str(rdir))

    z_span, r_span = mean_span(zdir), mean_span(rdir)
    assert z_span < r_span * 0.7, (z_span, r_span)
