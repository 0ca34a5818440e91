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
    # r11 re-tier (VERDICT #1): the quick tier had grown to ~38 min on
    # an idle 32-core host (413 tests, 2270 s of call time), far past
    # the driver verify budget — every test base measured >= 4 s in the
    # r11 --durations=0 run moves to the default (CI) tier, EXCEPT one
    # named end-to-end representative per operator family kept above
    # the cut: CoW merge (test_partitioned_merge_matches_cow_twin_and_
    # time_travel), MoR (test_streaming_mor_upsert_equals_batch), join
    # view + jvmap (test_join_view_fuzzed_interleaving), IVM cascade
    # (test_ivm_cascade_view_on_view_fuzz), SCD2
    # (test_scd2_history_equals_time_travel_recompute), BM25 stack
    # (test_bm25_maintained_equals_batch_even_stale), LSH neardup
    # (test_probe_equals_batch_even_stale_and_through_vacuum), IVF
    # (test_split_preserves_content_and_queries), column index
    # (test_colindex_vacuum_shrinks_and_stays_exact), plus the
    # QUICK_PARITY oracle set. Projected quick tier: ~8 min (the 2.5-4 s band
    # below is demoted too).
    "test_agg_merge_view_seed_over_empty_source_then_growth",  # 2.8s
    "test_bpe_learn_matches_python_twin",  # 2.7s
    "test_change_feed_matches_python_diff",  # 2.5s
    "test_checkpoint_restart_processes_only_new_files",  # 3.9s
    "test_cow_snapshot_delete_semantics",  # 2.8s
    "test_delta_stats_prune_logged_partitions",  # 2.6s
    "test_distinct_view_exactly_once_marker",  # 3.0s
    "test_elbow_runs_and_costs_decrease",  # 2.9s
    "test_entry_returns_rows",  # 3.4s
    "test_filtered_search_stats_prune_dirs",  # 3.5s
    "test_indexed_lookup_equals_filter_and_prunes",  # 2.7s
    "test_interval_concurrency_known_answer",  # 2.9s
    "test_ivf_recall_vs_brute_force",  # 3.5s
    "test_lookup_degrades_when_indexed_manifest_expired",  # 3.1s
    "test_lookup_pins_version_against_concurrent_commit",  # 3.4s
    "test_merge_debug_guard_catches_lying_unique_keys_caller",  # 3.2s
    "test_merge_occ_raises_on_concurrent_repartition",  # 2.8s
    "test_merge_occ_raises_on_concurrent_restore",  # 3.5s
    "test_merge_occ_rebases_onto_disjoint_foreign_commit",  # 3.1s
    "test_minhash_estimates_jaccard",  # 2.6s
    "test_minhash_finds_high_jaccard_pairs",  # 3.9s
    "test_mor_compaction_preserves_content_and_history",  # 2.9s
    "test_mor_fold_drops_partition_emptied_by_log",  # 2.7s
    "test_mor_occ_appends_compose_under_conflict",  # 3.0s
    "test_mor_point_lookup_and_stats_prune_safety",  # 2.5s
    "test_mor_schema_evolution_matches_cow",  # 3.5s
    "test_pagerank_mass_conserved",  # 3.0s
    "test_part_pagerank_query_shape",  # 2.5s
    "test_partitioned_delete_semantics_and_idempotent_replay",  # 3.6s
    "test_prefix_jaccard_equals_naive_join",  # 3.0s
    "test_probe_reads_only_probed_cell_dirs",  # 3.1s
    "test_restore_rolls_back_and_keeps_history",  # 2.6s
    "test_sssp_bounded_two_hop_beats_direct",  # 2.7s
    "test_staged_merge_leaves_no_trace_on_empty_or_refused_batches",  # 3.8s
    "test_stateful_sessionize_matches_batch",  # 2.9s
    "test_stream_static_anomaly_equals_batch",  # 2.6s
    "test_streaming_dedup_within_watermark",  # 3.7s
    "test_swap_view_seed_over_emptied_source_is_empty_not_crash",  # 4.0s
    "test_sync_advances_cursor_over_no_change_versions",  # 3.5s
    "test_sync_merge_unmatched_source_delete",  # 3.5s
    "test_text_and_dedup_ops_on_empty",  # 3.9s
    "test_triangle_counts_known_graphs",  # 3.0s
    "test_type_widening_int_to_long",  # 3.6s
    "test_update_rejects_null_keys",  # 3.3s
    "test_agg_merge_view_replay_after_source_advanced",
    "test_agg_merge_view_semi_join_fallback_matches_point_read",
    "test_agg_merge_view_tombstone_fold_replay_after_source_advanced",
    "test_agg_merge_view_tracks_recompute_and_replays_convergently",
    "test_bm25_empty_and_emptied_corpus_query_is_empty",
    "test_bm25_maintained_survives_index_vacuum",
    "test_bm25_query_heals_interrupted_stats_swap",
    "test_build_query_equals_oneshot_ivf",
    "test_cdf_fast_append_path_equals_generic",
    "test_cloned_index_heals_missing_keymap",
    "test_colindex_vacuum_crash_sync_rebuilds",
    "test_composed_pipeline_all_vacuums_under_churn",
    "test_composed_stack_sync_emptied_corpus_seed",
    "test_composed_stack_sync_equals_separate_syncs",
    "test_composed_stack_sync_resumes_from_divergent_cursors",
    "test_concurrent_disjoint_index_updates_both_survive",
    "test_concurrent_same_cell_index_update_raises",
    "test_connected_components_chain_and_islands",
    "test_cursor_advance_does_not_revert_foreign_update",
    "test_custom_source_feeds_engine_operators",
    "test_deletes_and_inserts_route",
    "test_dim_wave_reads_only_dependent_partitions",
    "test_distinct_view_tracks_recompute_through_waves",
    "test_expire_versions_collects_index_cells",
    "test_filtered_probe_no_starvation_keeps_single_pass_plan",
    "test_filtered_search_equals_prefiltered_ivf",
    "test_filtered_search_escalates_to_k",
    "test_incremental_update_equals_rebuild",
    "test_index_random_walk",
    "test_index_superset_after_deletes",
    "test_interrupted_vacuum_marker_forces_keymap_rebuild",
    "test_ivf_random_walk_model",
    "test_ivm_cascade_deep_fuzz_all_levels_lag",
    "test_join_view_dim_wave_after_fact_schema_evolution",
    "test_join_view_seed_over_emptied_fact_then_growth",
    "test_join_view_update_set_all_nulls_deleted_dim",
    "test_jvmap_backfills_for_pre_map_view",
    "test_jvmap_lazy_fact_waves_commit_nothing",
    "test_jvmap_vacuum_crash_sync_heals",
    "test_jvmap_vacuum_shrinks_and_stays_exact",
    "test_lakehouse_random_walk_rollback_heavy",
    "test_large_delta_sync_avoids_wave_sized_in_list",
    "test_large_wave_keys_stay_off_driver",
    "test_lsh_index_tracks_recompute",
    "test_lsh_sync_up_to_pins_slice_then_catches_up",
    "test_merge_occ_raises_on_same_partition_conflict",
    "test_minmax_view_rescans_only_on_extremum_delete",
    "test_mllib_model_save_load_roundtrip",
    "test_mor_auto_compact_bounds_log_length",
    "test_mor_cdf_equals_cow_cdf",
    "test_mor_equals_cow_on_same_change_sequence",
    "test_oracle_output_types_portable",
    "test_payload_column_evolution",
    "test_postings_sync_tracks_recompute",
    "test_pq_null_query_element_paths_agree",
    "test_probe_large_bucket_set_stays_off_driver",
    "test_quantile_view_tracks_recompute_through_waves",
    "test_query_time_travel",
    "test_range_index_vacuum_shrinks_and_stays_exact",
    "test_range_index_width_is_sticky",
    "test_range_lookup_equals_filter_and_prunes",
    "test_rebuild_keymap_shrinks_supersets",
    "test_repartition_snapshot_evolution",
    "test_resplit_widens_and_stays_exact",
    "test_scd2_asof_join_picks_version_in_effect",
    "test_scd2_batch_hkeys_disjoint_under_debug_guard",
    "test_scd2_dim_backfill_wave_exact_and_off_driver",
    "test_scd2_enriched_view_cursors_and_stamp_contract",
    "test_scd2_enriched_view_fuzzed_vs_recompute",
    "test_scd2_fuzzed_interleaving",
    "test_scd2_suppression_replay_converges",
    "test_scd2_sync_exactly_once_replay",
    "test_scd2_tracked_cols_suppress_noop_close_reopen",
    "test_seed_rebuild_equals_incremental",
    "test_skyline_brute_force_agreement",
    "test_snapshot_stats_pruning_skips_disjoint_dirs",
    "test_split_bounds_hot_cell_rows",
    "test_split_raises_on_concurrent_update",
    "test_stack_sync_pipelined_waves_equal_sequential",
    "test_stack_sync_up_to_pins_slice_then_catches_up",
    "test_stale_index_reads_are_exact",
    "test_stream_stream_full_outer_join_matches_batch",
    "test_stream_stream_left_outer_join_matches_batch",
    "test_streaming_ivf_upsert_equals_batch",
    "test_streaming_materialized_view_with_history",
    "test_sub_probe_narrows_io_with_full_recall_on_clustered_data",
    "test_sync_auto_split_bounds_cells_across_waves",
    "test_sync_auto_split_concurrent_commit_raises_then_converges",
    "test_sync_index_follows_corpus_cdf",
    "test_sync_replay_is_idempotent",
    "test_sync_view_exactly_once_marker",
    "test_threaded_sync_split_vacuum_fuzz",
    "test_topk_view_tracks_recompute_through_waves",
    "test_unfiltered_probe_plan_has_no_escalation_artifacts",
    "test_update_reapply_converges",
    "test_update_rebases_over_vacuum_restoring_clipped_entries",
    "test_update_rewrites_only_affected_cells",
    "test_update_routes_through_split_cells_no_ghosts",
    "test_vacuum_crash_at_bracket_leaves_marker_and_update_heals",
    "test_vacuum_inner_merge_failure_repairs_and_raises",
    "test_vacuum_keymap_drops_deleted_keys",
    "test_vacuum_repairs_and_raises_on_concurrent_update",
    "test_view_tracks_recompute_through_waves",
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
