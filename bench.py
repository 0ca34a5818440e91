#!/usr/bin/env python
"""Engine benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>}

Each query is forced to full materialization with the noop sink (no
driver-side collect of large results — the measured work is the
distributed plan, matching how the engine is meant to run at scale).
Per-query values are the MIN over $SPARK_GRAFT_TRIALS runs (default 3,
r07 — single-shot numbers could not separate host drift from code
regressions; see SCALE.md); the record carries "trials".

SPARK_GRAFT_ONLY=q1,q2 restricts the run to those headline queries for
the standalone warm re-time protocol (verify skill: iterative queries
swing ±10-40% inside a full pass; re-time them alone, warm, min-of-4+
before believing a regression). An ONLY run never writes BENCH.json /
BENCH_summary.json — it is a diagnostic, not the comparable record —
and its stdout line carries "only": true.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    # relational core
    "groupby_agg",
    "join_dims",
    "join_facts",
    "join_anti",
    "asof_join",
    "range_join_bands",
    "topk_orders",
    "shipping_priority",
    "returned_items",
    "rfm_segments",
    "window_rank",
    "rollup_agg",
    "percentiles",
    "pivot_event_dow",
    "hist2d_events",
    "time_bucket_hourly",
    "sliding_window",
    "sessionization",
    # subquery / decision-support shapes
    "supplier_wait",
    "small_qty_revenue",
    "large_orders",
    "trailing_window_sum",
    "market_share",
    "cohort_retention",
    # clustering
    "centroid_assign",
    "wcss_fixed",
    "kmeans_custom",
    # LLM-pipeline ops
    "dedup_exact",
    "minhash_pairs",
    "llm_prep_pipeline",
    "simhash",
    "text_quality",
    "lang_id",
    "cosine_topk",
    "embedding_neardup",
    "quantize_error",
    "multimodal_meta",
    # ^^^ R01_SUBSET ends at multimodal_meta — NEVER insert above this
    # line: the r01 cross-round yardstick is the prefix up to here
    # r09: the reference's END-TO-END pipeline at the bench SF (kmeans
    # + full-corpus assignment + cluster summary) — tracks the actual
    # reference workload's scaling, not just the centroid loop
    "flagship_segmentation",
    # late-added operators (r02): SQL-recursion, graph, subquery
    # decorrelation, IVF ANN, fuzzy/simhash pair joins — benched so
    # regressions are visible
    "recursive_cte",
    "part_pagerank",
    "catalyst_decorrelation",
    "ann_ivf_topk",
    "fuzzy_name_pairs",
    # r02 batch 2: bloom-pruned join, degree-oriented triangles,
    # sweep-line concurrency
    "bloom_prune_join",
    "triangle_count",
    "interval_concurrency",
    # r02 batch 3: LLM sequence packing (applyInPandas fold) + Markov
    # transition matrix (lead window)
    "sequence_pack",
    "event_transitions",
    "doc_entropy",
    "snapshot_diff",
    # r02 batch 4: C4-style segment dedup, CDC compaction, telemetry
    # window dedup
    "line_dedup",
    "cdc_apply",
    "event_dedup_window",
    # r02 batch 5: unigram perplexity. prefix_jaccard is oracled but not
    # benched for the same reason as simhash_pairs below: the fixture's
    # 31-word vocabulary packs ~300 shingles/doc into a ~29k shingle
    # space (df ~ 50 at sf0.1), so even rarest-first prefixes collide
    # quadratically HERE — on a real corpus prefix shingles have df ~ 1
    # (the scale smoke pins that: 100k docs w/ a stop shingle -> 0-pair
    # candidate set in seconds)
    "unigram_ppl",
    # r02 session-2: IR + semantic-dedup additions
    "bm25_topk",
    "semantic_dedup",
    "ann_ivf_fixed",
    # simhash_pairs is oracled but not benched: the fixture's 31-word
    # vocabulary makes every doc near-identical, so Hamming<=3 output is
    # inherently quadratic HERE (3.5M pairs at sf0.1) — not an operator
    # property on real corpora
    # r02 session-3: substring dedup, hybrid retrieval, PQ ANN, DQ suite
    "substring_dedup",
    "rrf_fusion",
    "hard_negatives",
    "dq_checks",
    "pq_topk",
    "training_mix_pipeline",
    # r02 session-4: bigram LM perplexity, BPE tokenizer training
    # (iterative), frontier BFS, capstone #5 (train-and-apply
    # tokenization)
    "bigram_ppl",
    "bpe_learn",
    "bfs_hops",
    "tokenizer_pipeline",
    "communities_lp",
    "sssp_cheapest",
    "survival_km",
    "ppr_brand",
    "hits_parts",
    "psi_drift",
    "gini_revenue",
    "order_acf",
    # r03: capstone #6 — pagerank x triangles over ONE shared graph
    # build (the per-query graph rebuild is the dominant cost of the
    # individual graph queries; this measures the amortized pattern)
    "graph_insights_pipeline",
    # r04: capstone #7 — incremental corpus refresh (3 partition-pruned
    # MERGE waves + final-snapshot report); benches the lakehouse write
    # path, not just reads
    "corpus_refresh_pipeline",
    # r09: capstone #17 — maintained LSH near-dup index (bucket MERGE
    # table from the corpus CDF + stale column-index probe)
    "neardup_maintained_index",
    # r10: capstone #18 — daily-crawl-shard dedup gate (exact ->
    # maintained LSH probe -> decontamination -> segment dedup); the
    # dedup family's tracked wall-time (VERDICT #7)
    "crawl_shard_dedup",
    # r04: newly oracled array-feature Lloyd loops — 64-dim and
    # vocab-featurized variants are distinct perf shapes from the 2-dim
    # kmeans_custom (high-dim distance codegen, pivot featurization)
    "kmeans_embeddings",
    "doc_clustering",
    # r04.5: lakehouse read paths — partition-pruned point lookup
    # (key_in dir pruning) and the change data feed (manifest-diff
    # pruned version diff); both include their 2-wave table build
    "snapshot_point_lookup",
    "corpus_changes_feed",
    # r05: the MERGE DELETE verb (3 CoW waves with tombstones) and its
    # merge-on-read twin (delta-log appends + overlay read + fold-back
    # compaction) — same oracle, two storage strategies, so their
    # ratio IS the CoW-vs-MoR write/read tradeoff at bench scale
    "corpus_delete_wave",
    "mor_delete_wave",
    # r05: WHEN NOT MATCHED BY SOURCE sweep (full-mirror sync merge)
    "sync_snapshot_mirror",
    # r05 capstone #8: CDF-driven incremental view maintenance (3 merge
    # waves + seed + 2 delta folds — benches the produce-AND-consume
    # cost of the change feed)
    "incremental_agg_view",
    "snapshot_history_audit",
    # r05 session 2: RESTORE + shallow-clone divergence (metadata-only
    # lakehouse ops — their cost should be the feed-table build, not
    # the rollback/clone), DQ quarantine routing (one codegen'd pass),
    # the maintained IVF index (build + CDC update + probe), and
    # capstone #9 (the same wave through MERGE -> CDF -> index sync:
    # its delta over ann_index_update is the CDF-consumption cost)
    "snapshot_restore_read",
    "snapshot_clone_divergence",
    "dq_quarantine",
    "ann_index_update",
    "corpus_index_sync",
    # r05 session 2: zero-shuffle feature-hash embedding + exact top-k
    "doc_embed_topk",
    # r05 session 2: filtered vector search (stats-pruned probe dirs)
    "ann_filtered_search",
    # r05 capstone #10: text -> feature-hash embedding -> filtered index
    "doc_index_pipeline",
    # r06: hot-cell split + CDC + probe (exactness gate for the split),
    # filtered-search k-guarantee, incremental JOIN view (Δfact+Δdim
    # wave through UPDATE SET * merges), capstone #11 hybrid retrieval
    # (BM25 + IVF dense leg + RRF fusion over one materialized corpus)
    "ann_split_probe",
    "ann_filtered_search_selective",
    "incremental_join_view",
    "hybrid_retrieval",
    # r06 capstone #12: corpus MERGE -> CDF -> index sync -> hybrid
    # retrieval over the maintained state (the full RAG loop)
    "rag_pipeline",
    # r06: the non-self-maintainable IVM case — extremum deletes take
    # the scoped-rescan path (3 waves + 3 cursored syncs)
    "incremental_minmax_view",
    # r07 capstone #13: SCD2 dim history (3 waves + 3 cursored syncs,
    # O(changed-keys) closes) and the as-of enrichment against it
    "scd2_dim_view",
    "scd2_asof_facts",
    # r07: secondary column index — non-key point lookup, read with the
    # index deliberately stale (changed-partition union exactness path)
    "indexed_point_lookup",
    # r07: COUNT-DISTINCT view (support multiset, no rescan path)
    "incremental_distinct_view",
    # r08 capstone #14: SCD2 x join-view composition (as-of enrichment,
    # dim waves append history only — no invalidation read)
    "scd2_enriched_view",
    # r08: bucketed range index on a non-key column, read stale
    "indexed_range_lookup",
    # r08: TOP-K view (bounded buffer, scoped underflow rescan)
    "incremental_topk_view",
    # r08 capstone #15: two-level IVM cascade (gold folds the silver
    # join view's own CDF — view-on-view composability)
    "ivm_cascade",
    # r08: QUANTILE view (bucketized support, delete-capable percentiles)
    "incremental_quantile_view",
    # r08: depth-3 cascade anchored by the merge-backed gold agg view
    "ivm_cascade_deep",
    # r08 capstone #16: maintained BM25 retrieval over postings + views
    "bm25_maintained_index",
]


# The 37 queries benched in round 1 (BENCH_r01.json) — their sum is
# reported as `r01_subset_total` so cross-round comparisons don't
# conflate regressions with queries added since.
R01_SUBSET = set(HEADLINE[: HEADLINE.index("multimodal_meta") + 1])


def _calibrate(iters: int = 1_500_000) -> float:
    """Fixed single-thread xorshift spin — a pure-CPU yardstick with no
    Spark, no I/O. On an idle machine it takes a stable ~0.25 s; under
    host contention it inflates roughly with the steal ratio, so a judge
    can separate noise from plan regressions without a re-run (SCALE.md
    r02: identical-code runs varied 1.1-1.8x with a loaded host)."""
    t0 = time.perf_counter()
    x = 0x9E3779B97F4A7C15
    for _ in range(iters):
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
    return round(time.perf_counter() - t0, 4)


#: spin calibration above this many seconds means the host was busy and
#: the timings are inflated. HOST-RELATIVE: the r01-r09 machine idled at
#: ~0.33-0.39 (threshold 0.40). r10 temporarily raised the default to
#: 0.85 claiming a 1.8x-slower host, but no committed record ever showed
#: an idle spin above 0.50, and the r11 quiet-window calibration (12
#: samples, 2 s apart, loadavg 0.4) measured min 0.327 / median 0.349 /
#: p95 0.371 / max 0.383 — the fast-host profile. At 0.85 the gate
#: accepted visibly contended runs (driver r10: loadavg 3.1->6.7) as
#: idle, so the conservative 0.40 default is restored; a genuinely
#: slower host should set SPARK_GRAFT_SPIN_IDLE per host instead of
#: loosening the global default.
CONTENDED_SPIN_SEC = float(
    os.environ.get("SPARK_GRAFT_SPIN_IDLE", "0.40")
)


def _bench_out_path(here: str, spin_max: float, sf: float = 0.1) -> str:
    """Where this run's record belongs: a CONTENDED run must not
    overwrite an existing IDLE BENCH.json (the idle number is the
    comparable one) — it lands in BENCH.contended.json alongside. A
    non-default-SF run (profiling at sf0.001, scale checks at sf1)
    likewise must not clobber the authoritative sf0.1 record (r06)."""
    if sf != 0.1:
        return os.path.join(here, f"BENCH.sf{sf}.json")
    out_path = os.path.join(here, "BENCH.json")
    if spin_max >= CONTENDED_SPIN_SEC and os.path.exists(out_path):
        try:
            with open(out_path) as f:
                pc = json.load(f).get("contention", {})
            prev_idle = (
                max(
                    pc.get("spin_sec_before", 9.0),
                    pc.get("spin_sec_after", 9.0),
                )
                < CONTENDED_SPIN_SEC
            )
        except (OSError, ValueError):
            prev_idle = False
        if prev_idle:
            return os.path.join(here, "BENCH.contended.json")
    return out_path


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not os.path.isdir(sf_dir):
        sys.exit(f"SPARK_GRAFT_SF_DIR does not exist: {sf_dir}")
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        run_list = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in run_list if n not in HEADLINE]
        if unknown:
            sys.exit(f"SPARK_GRAFT_ONLY names not in HEADLINE: {unknown}")
    else:
        run_list = HEADLINE
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0  # non-standard dir name; timings still valid

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from customer_segmentation_pyspark_spark import get_spark
    from customer_segmentation_pyspark_spark.queries import REGISTRY

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: count() every table (parquet footers + OS page cache) and
    # run one tiny applyInPandas (spins up the Arrow Python worker pool).
    # Without this, whichever query FIRST touches a table or first needs
    # a Python worker absorbs multi-second one-time costs and per-query
    # numbers measure bench ordering, not plans (observed: dedup_exact
    # 2.2s cold vs 0.5s steady-state purely from scan order).
    from customer_segmentation_pyspark_spark.sources import load_table
    from customer_segmentation_pyspark_spark.sources.tables import (
        TABLE_NAMES,
    )

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    spark.createDataFrame([(0, 1.0)], "k int, v double").groupBy(
        "k"
    ).applyInPandas(lambda pdf: pdf, "k int, v double").count()

    # Idle-wait (r06, VERDICT #7): both r05 driver runs self-reported
    # CONTENDED, making the driver-side artifact incomparable. If the
    # host is busy, wait out short contention bursts (bounded) before
    # accepting a contended record. Opt out with SPARK_GRAFT_NO_WAIT=1.
    # The pre-check spins are logged into the contention block (r07,
    # ADVICE) so a record that waited shows it.
    wait_spins: list[float] = []
    if not os.environ.get("SPARK_GRAFT_NO_WAIT"):
        for attempt in range(3):
            s = _calibrate()
            wait_spins.append(s)
            if s < CONTENDED_SPIN_SEC:
                break
            print(
                f"host contended (spin {s}, attempt {attempt + 1}/3) — "
                "sleeping 60s before re-checking",
                file=sys.stderr,
            )
            time.sleep(60)

    cal_before = _calibrate()
    load_before = list(os.getloadavg())

    # Multi-trial protocol (r07, VERDICT #5): same-code idle totals
    # drifted 223->362 s across one day on this host, so a single-shot
    # record cannot separate drift from regression. Each query runs
    # SPARK_GRAFT_TRIALS times (default 3) and records the MIN — the
    # least-interference estimate; compare_bench then judges
    # min-vs-min. Trials are interleaved as full PASSES over the query
    # list (not back-to-back per query): this host shows multi-minute
    # contention episodes the spin yardstick misses, and consecutive
    # trials would hand all of a query's samples to one episode —
    # pass-interleaving spreads each query's samples ~10 minutes
    # apart, so the per-query min survives any episode shorter than a
    # pass. Pass 1 absorbs residual cold costs; the lakehouse queries
    # rebuild their scratch tables per call, so repetition is
    # well-defined.
    trials = max(1, int(os.environ.get("SPARK_GRAFT_TRIALS", "3")))
    timings: dict[str, float] = {}
    for _pass in range(trials):
        for name in run_list:
            fn = REGISTRY[name].fn
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            timings[name] = round(
                min(timings.get(name, float("inf")), dt), 3
            )

    cal_after = _calibrate()
    load_after = list(os.getloadavg())

    total = round(sum(timings.values()), 3)
    contention = {
        "spin_sec_before": cal_before,
        "spin_sec_after": cal_after,
        "loadavg_before": [round(v, 2) for v in load_before],
        "loadavg_after": [round(v, 2) for v in load_after],
        "cpus": os.cpu_count(),
    }
    if wait_spins:
        contention["spin_sec_prewait"] = wait_spins
    # Compact self-contained record: everything a judge needs WITHOUT
    # the per-query map. Lives in three places so truncation at either
    # end can't lose it (r06, VERDICT #6): (1) LAST key of the stdout
    # line — a tail capture that loses the line's head keeps it, and
    # compare_bench parses it back without regex recovery; (2) its own
    # <1 KB BENCH_summary.json; (3) the full BENCH.json.
    summary = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "trials": trials,  # per-query values are min-of-trials (r07)
        "r01_subset_total": round(
            sum(t for n, t in timings.items() if n in R01_SUBSET), 3
        ),
        "contention": contention,
    }
    if only:
        summary["only"] = True
    result_line = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "trials": trials,
            "r01_subset_total": summary["r01_subset_total"],
            "contention": contention,
            **({"only": True} if only else {}),
            "summary": summary,
        }
    )
    # The driver keeps only the TAIL (~2 KB) of stdout and parses it as
    # JSON — r03..r07 artifacts all carried a head-truncated line with
    # "parsed": null (r08, VERDICT #8). The CONTRACTUAL stdout line is
    # therefore size-capped to survive that capture whole: when the
    # full record exceeds the budget, the printed line keeps only the
    # SLOWEST queries (the ones cross-round comparisons care about)
    # plus a count of what was dropped; the untruncated record is in
    # the committed BENCH.json either way.
    stdout_line = result_line
    _TAIL_BUDGET = 1800
    if len(stdout_line) > _TAIL_BUDGET:
        slowest = dict(
            sorted(timings.items(), key=lambda kv: -kv[1])
        )
        kept: dict[str, float] = {}
        for name, secs in slowest.items():
            trial = {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": {**kept, name: secs},
                "queries_omitted": len(timings) - len(kept) - 1,
                "queries_full": "BENCH.json",
                "sf": sf,
                "trials": trials,
                "r01_subset_total": summary["r01_subset_total"],
                "contention": contention,
            }
            line = json.dumps(trial, separators=(",", ":"))
            if len(line) > _TAIL_BUDGET:
                break
            kept[name] = secs
            stdout_line = line
    # Durable artifact FIRST (the driver's tail capture has truncated
    # the stdout line mid-JSON before — BENCH_r03.json lost its total),
    # then the contractual one-line stdout print. A failed file write
    # (read-only checkout, full disk) must never eat the stdout line.
    # A CONTENDED run never overwrites an existing IDLE record (r05):
    # the idle number is the comparable one, so the contended line goes
    # to BENCH.contended.json alongside instead.
    if only:
        # diagnostic subset — never the comparable record
        print(stdout_line, flush=True)
        return
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        out_path = _bench_out_path(here, max(cal_before, cal_after), sf)
        if out_path.endswith("BENCH.contended.json"):
            print(
                "warning: run is CONTENDED and BENCH.json holds an "
                "idle record — writing BENCH.contended.json instead",
                file=sys.stderr,
            )
        with open(out_path, "w") as f:
            f.write(result_line + "\n")
        # the tiny summary twin survives any capture truncation; its
        # name mirrors the main record (contended / non-default SF)
        base = os.path.basename(out_path)
        sum_path = os.path.join(
            here, base.replace("BENCH", "BENCH_summary", 1)
        )
        with open(sum_path, "w") as f:
            f.write(json.dumps(summary) + "\n")
    except OSError as e:
        print(f"warning: could not write BENCH.json: {e}", file=sys.stderr)
    print(stdout_line, flush=True)


if __name__ == "__main__":
    main()
