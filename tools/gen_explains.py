#!/usr/bin/env python
"""Regenerate EXPLAINS.md — formatted physical-plan snapshots of headline
queries for human review (the machine-checked plan assertions live in
tests/test_plans.py)."""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAMES = [
    "corpus_delete_wave", "mor_delete_wave", "sync_snapshot_mirror",
    "groupby_agg", "join_dims", "topk_orders", "centroid_assign",
    "kmeans_one_iter", "sessionization", "asof_join", "minhash_pairs",
    "cosine_topk", "shipping_priority", "local_supplier_volume",
    "llm_prep_pipeline", "returned_items", "rfm_segments", "gap_fill",
    "word_freq", "supplier_wait", "small_qty_revenue", "large_orders",
    "trailing_window_sum", "untapped_customers", "market_share",
    "cohort_retention", "funnel_steps", "dedup_canonical",
    # r02 additions: capped LSH, block GEMM, pigeonhole simhash join,
    # deletion-neighborhood fuzzy join, IVF probe, weighted reservoir
    "embedding_neardup", "simhash_pairs", "fuzzy_name_pairs",
    "ann_ivf_topk", "weighted_sample",
    # r02 batch 4-5: segment dedup, CDC compaction, prefix-filtered
    # Jaccard, Bloom-pruned join, skew profile, triangle counting
    "line_dedup", "cdc_apply", "prefix_jaccard", "bloom_prune_join",
    "key_skew_profile", "event_dedup_window", "triangle_count",
    # r02 batch 6: perplexity LM, attribution window, JL projection,
    # bigram LM
    "unigram_ppl", "attribution_last_touch", "jl_projection",
    "bigram_lm",
    # r02 session-2: IR ranking, semantic dedup, fixed-quantizer IVF,
    # DSIR selection, BPE pair stats, winnowing fingerprints
    "bm25_topk", "semantic_dedup", "ann_ivf_fixed", "dsir_select",
    "bpe_pair_counts", "winnowing",
    # r02 session-3: substring dedup, hybrid retrieval, PQ ANN, DQ suite
    "substring_dedup", "rrf_fusion", "hard_negatives", "dq_checks",
    "pq_topk", "training_mix_pipeline", "entity_resolution",
    "audio_frames", "mann_whitney", "ks_test", "moment_stats",
    # r02 session-4: bigram LM perplexity (bpe_learn / bfs_hops are
    # driver-loop queries — their per-round plans don't snapshot as one
    # explain; plan properties live in tests + SCALE.md instead)
    "bigram_ppl", "survival_km", "dedup_incremental",
    # r05 session-2: quarantine routing (one codegen'd pass), the
    # feature-hash embedding top-k (single-fold featurizer), and the
    # maintained-index probe (dir-pruned scan + broadcast probe join);
    # the index build/update/sync are multi-job driver loops — their
    # plan properties live in tests/test_vector_index.py + SCALE.md
    "dq_quarantine", "doc_embed_topk", "ann_index_update",
    "ann_filtered_search", "doc_index_pipeline",
    # r06: split-exact probe, escalating filtered search, join view,
    # hybrid retrieval
    "ann_split_probe", "ann_filtered_search_selective",
    "incremental_join_view", "hybrid_retrieval", "rag_pipeline",
    # r09: the end-to-end reference pipeline (assignment scan + one
    # hash agg after the k-row centroid collect) and the maintained
    # near-dup probe (bucket-pruned read + probe join). The multi-wave
    # sync loops don't snapshot as one explain; their plan properties
    # live in tests/test_neardup.py + SCALE.md
    "flagship_segmentation", "neardup_maintained_index",
    # r10: capstone #18 — the final gate-count plan (maintained-probe
    # anti-join + broadcast decontamination + segment-dedup aggregate)
    "crawl_shard_dedup",
]


def main() -> None:
    from customer_segmentation_pyspark_spark import get_spark
    from customer_segmentation_pyspark_spark.queries import REGISTRY

    spark = get_spark("gen-explains")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# EXPLAINS — formatted physical plans of headline queries",
        "",
        "Generated snapshot (`python tools/gen_explains.py`); the properties that",
        "matter (pushdown, pruning, broadcast, exchange counts) are asserted in",
        "`tests/test_plans.py` on every run — this file is for human review.",
        "",
    ]
    for n in NAMES:
        df = REGISTRY[n].fn(spark, "/root/testdata/sf0.01")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        tree = buf.getvalue().split("\n\n")[0]
        out.append(f"## {n}\n\n```\n{tree}\n```\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "EXPLAINS.md"), "w") as f:
        f.write("\n".join(out))


if __name__ == "__main__":
    main()
