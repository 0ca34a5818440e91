from __future__ import annotations

import duckdb
import pytest

from customer_segmentation_pyspark_spark import get_spark
from customer_segmentation_pyspark_spark.sources import TABLE_NAMES

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("engine-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_ORACLE}/{name}.parquet'"
        )
    yield con
    con.close()


# ---------------------------------------------------------------------------
# Quick/slow tiering (VERDICT r02 #8): `pytest -m quick` is the < 4 min
# pre-commit loop; the default run (CI) is unchanged and runs everything.
# quick keeps EVERY invariant/unit test under ~4 s plus one representative
# oracle-parity query per operator family; the remaining ~210 parity
# parametrizations and the heavy python-twin / scale tests are `slow`.
# ---------------------------------------------------------------------------

# one parity representative per family — relational, windows, joins,
# clustering, dedup, ANN, text/LM, graph, streaming-adjacent, capstones
QUICK_PARITY = {
    "project_select", "case_when_dow", "filter_isin",
    "groupby_agg", "join_dims", "join_anti", "asof_join", "topk_orders",
    "window_rank", "rollup_agg",
    "centroid_assign", "kmeans_custom",
    "dedup_exact", "minhash_pairs", "simhash", "embedding_neardup",
    "semantic_dedup",
    "cosine_topk", "ann_ivf_fixed", "pq_topk",
    "text_quality", "lang_id", "bm25_topk", "bpe_learn", "bigram_ppl",
    "part_pagerank", "k_core", "sssp_cheapest", "communities_lp",
    "recursive_cte", "cdc_apply", "survival_km", "multimodal_meta",
    "llm_prep_pipeline",
}

# non-parametrized tests measured > ~4 s in the full-suite durations run
SLOW_TESTS = {
    "test_no_python_udfs_in_oracle_queries",
    "test_lakehouse_random_walk_seed1",
    "test_lakehouse_random_walk_seed2",
    "test_lakehouse_random_walk_seed3",
    "test_semantic_dedup_hot_cluster_scale_bounded",
    "test_connected_components_matches_union_find",
    "test_star_cc_matches_label_prop_on_random_graph",
    "test_reference_experiment_matrix",
    "test_streaming_upsert_equals_batch_merge",
    "test_gate_hot_bucket_matches_batch",
    "test_bpe_merge_fold_matches_python",
    "test_sssp_bounded_matches_python_jacobi",
    "test_streaming_partitioned_upsert_equals_batch",
    "test_label_propagation_matches_python_sync",
    "test_ann_lsh_recall_vs_brute_force",
    "test_stream_stream_join_matches_batch",
    "test_streaming_near_dup_gate_matches_batch_lsh",
    "test_star_cc_long_chain_logarithmic_rounds",
    "test_dedup_clusters_same_via_both_cc_bodies",
    "test_bigram_ppl_matches_python",
    "test_segment_dedup_matches_python",
    "test_skyline_keeps_duplicate_optima_and_drops_dominated",
    "test_kmeans_array_highdim_invariants",
    "test_lsh_bucket_cap_hot_bucket_linear",
    "test_pq_recall_vs_brute_force",
    "test_span_profile_matches_python",
    "test_late_rows_dropped_by_watermark",
    "test_semantic_dedup_hot_cluster_routing_equals_cold",
    "test_big_graph_fallback_paths_match_broadcast",
    "test_partitioned_merge_random_batches_match_model",
    # 2.5-5 s invariant tests — correct but not pre-commit-critical
    "test_custom_source_rows_and_determinism",
    "test_pagerank_star_graph_center_dominates",
    "test_complete_and_update_modes_match_batch",
    "test_session3_ops_on_empty",
    "test_new_graph_and_incremental_ops_on_empty",
    "test_lsh_cap_no_behavior_change_on_fixture",
    "test_custom_python_datasource_writer_round_trip",
    "test_incremental_dedup_equals_filtered_full_dedup",
    "test_hits_separates_hub_and_authority_roles",
    "test_personalized_pagerank_mass_concentrates_on_seeds",
    "test_asof_implementations_agree",
    "test_cdc_latest_version_wins_matches_python",
    "test_streaming_reader_matches_batch_rows",
    "test_pagerank_matches_numpy_twin",
    "test_preference_pairs_matches_python",
    "test_streaming_corpus_dedup_by_fingerprint",
    "test_simhash_similar_docs_close_hamming",
    "test_ngram_df_cap_bounds_stop_shingle_join",
    "test_custom_close_to_mllib",
    "test_fixed_init_deterministic",
    "test_wcss_non_increasing_over_iterations",
    # r04 additions measured > ~4 s (merge/ML end-to-end shapes)
    "test_compact_partitioned_snapshot_and_expire_versions",
    "test_expire_versions_plain_snapshot_table",
    "test_merge_schema_evolution_cow",
    "test_merge_schema_evolution_partitioned_untouched_parts_intact",
    "test_evolving_merge_matches_python_model",
    "test_mllib_text_pipeline_clusters_documents",
    "test_copurchase_oversized_basket_without_observer_raises",
    "test_cluster_partitioned_snapshot_sorts_for_skipping",
    "test_maintenance_commit_is_merge_concurrency_safe",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[", 1)[0]
        if base in ("test_oracle_parity",):
            qname = item.name.split("[", 1)[1].rstrip("]")
            fast = qname in QUICK_PARITY
        elif base in (
            "test_rows_only_runs",
            "test_rows_only_query_is_deterministic",
        ):
            fast = False
        else:
            fast = base not in SLOW_TESTS
        item.add_marker(pytest.mark.quick if fast else pytest.mark.slow)
