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
