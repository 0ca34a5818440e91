"""Physical-plan audits: the 100-TB design assertions, checked on every
run. A query that silently loses predicate pushdown, column pruning, its
broadcast join, or its top-k rewrite fails CI — not just a code-review
comment."""

from __future__ import annotations

import contextlib
import io

import pytest

from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.queries import REGISTRY
from tests.conftest import SF_ORACLE


def plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_projection_prunes_scan(spark):
    df = REGISTRY["project_select"].fn(spark, SF_ORACLE)
    p = plan(df)
    assert "ReadSchema" in p
    read_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    # untouched wide columns must NOT be read
    assert "l_comment" not in read_schema and "l_extendedprice" not in read_schema


def test_filter_pushdown_reaches_scan(spark):
    df = REGISTRY["groupby_agg"].fn(spark, SF_ORACLE)
    p = plan(df)
    assert "PushedFilters" in p
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln][0]
    assert "l_shipdate" in pushed and "LessThanOrEqual" in pushed


def test_isin_pushdown(spark):
    df = REGISTRY["filter_isin"].fn(spark, SF_ORACLE)
    p = plan(df)
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln][0]
    assert "In(l_returnflag" in pushed and "GreaterThan(l_quantity" in pushed


def test_dim_join_broadcasts(spark):
    df = REGISTRY["join_dims"].fn(spark, SF_ORACLE)
    p = plan(df)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_topk_uses_take_ordered(spark):
    """sort+limit must become TakeOrderedAndProject (no global sort)."""
    df = REGISTRY["topk_orders"].fn(spark, SF_ORACLE)
    p = plan(df)
    assert "TakeOrderedAndProject" in p
    assert "Exchange rangepartitioning" not in p


def test_weighted_sample_uses_take_ordered(spark):
    """Weighted reservoir sampling must be one TakeOrderedAndProject over
    the scan — no global sort, no shuffle of the corpus."""
    df = REGISTRY["weighted_sample"].fn(spark, SF_ORACLE)
    p = plan(df)
    assert "TakeOrderedAndProject" in p
    assert "Exchange rangepartitioning" not in p


def test_centroid_assign_has_no_shuffle(spark):
    """Assignment is a pure projection — zero exchanges, whole-stage
    codegen ('*(n)' spans in simple mode)."""
    df = REGISTRY["centroid_assign"].fn(spark, SF_ORACLE)
    p = plan(df, mode="simple")
    assert "Exchange" not in p
    assert "*(" in p  # WholeStageCodegen span


def test_kmeans_iteration_single_shuffle(spark):
    """One Lloyd's iteration = exactly one exchange (the k-row hash agg).
    The reference's RDD version shuffles AND re-reads its source every
    iteration (codeText.txt:81-103)."""
    df = REGISTRY["kmeans_one_iter"].fn(spark, SF_ORACLE)
    p = plan(df, mode="simple")
    assert p.count("Exchange hashpartitioning") == 1


def test_groupby_agg_partial_final(spark):
    """Hash aggregation must be partial+final (map-side combine)."""
    df = REGISTRY["groupby_agg"].fn(spark, SF_ORACLE)
    p = plan(df)
    assert p.count("HashAggregate") >= 2


def test_sessionization_single_shuffle(spark):
    """lag window, running-sum window, and the per-session aggregate all
    share the user_id hash partitioning -> exactly one exchange."""
    df = REGISTRY["sessionization"].fn(spark, SF_ORACLE)
    p = plan(df, mode="simple")
    assert p.count("Exchange") == 1


def test_asof_join_two_shuffles(spark):
    """as-of join = one exchange for the right-side dedup aggregate + one
    for the carry-forward window; no range self-join blowup."""
    df = REGISTRY["asof_join"].fn(spark, SF_ORACLE)
    p = plan(df, mode="simple")
    assert p.count("Exchange") == 2
    assert "CartesianProduct" not in p


def test_zscore_window_single_shuffle(spark):
    df = REGISTRY["zscore_window"].fn(spark, SF_ORACLE)
    p = plan(df, mode="simple")
    assert p.count("Exchange") == 1


def test_no_python_udfs_in_oracle_queries(spark):
    """Every oracle-checked query stays JVM-side: no BatchEvalPython /
    ArrowEvalPython stages. Python appears only in sanctioned Arrow
    mapInPandas operators (multimodal kernels, blocked GEMM) — allowed
    because they are batch-vectorized, and oracle-checked where the
    kernel is deterministic (multimodal_embed)."""
    # udtf_bigrams is the deliberate Python-UDTF surface demo (SURVEY.md
    # §2.9); every other oracled query must stay JVM-side.
    for name, spec in REGISTRY.items():
        if spec.oracle is None or name == "udtf_bigrams":
            continue
        p = plan(spec.fn(spark, SF_ORACLE), mode="simple")
        assert "BatchEvalPython" not in p, f"{name} uses a row-at-a-time UDF"
        assert "ArrowEvalPython" not in p, f"{name} uses a Python UDF"


def test_pandas_escape_hatch_matches_expression(spark):
    """The sanctioned pandas_udf fallbacks must agree with the primary
    expression implementations."""
    from pyspark.sql import functions as F

    from customer_segmentation_pyspark_spark.functions import pandas_fns
    from customer_segmentation_pyspark_spark.functions.arrays import (
        cosine_similarity,
        euclidean,
    )
    from customer_segmentation_pyspark_spark.sources import load_table

    e = load_table(spark, SF_ORACLE, "embeddings").limit(50)
    pairs = (
        e.alias("a")
        .join(e.alias("b"), F.col("a.vec_id") + 1 == F.col("b.vec_id"))
        .select(
            F.transform("a.embedding", lambda x: x.cast("double")).alias("va"),
            F.transform("b.embedding", lambda x: x.cast("double")).alias("vb"),
        )
    )
    rows = pairs.select(
        euclidean(F.col("va"), F.col("vb")).alias("d_expr"),
        pandas_fns.euclidean_pandas("va", "vb").alias("d_pd"),
        cosine_similarity(F.col("va"), F.col("vb")).alias("c_expr"),
        pandas_fns.cosine_pandas("va", "vb").alias("c_pd"),
    ).collect()
    assert rows
    for r in rows:
        assert abs(r["d_expr"] - r["d_pd"]) < 1e-9
        assert abs(r["c_expr"] - r["c_pd"]) < 1e-9


def test_returned_items_broadcasts_dims_and_topk(spark):
    """Q10 shape: customer/nation reach the probe side as broadcasts and
    the final sort+limit folds to TakeOrderedAndProject."""
    df = REGISTRY["returned_items"].fn(spark, SF_ORACLE)
    p = plan(df)
    assert p.count("BroadcastHashJoin") >= 2
    assert "TakeOrderedAndProject" in p


def test_returned_items_filter_pushed_to_scan(spark):
    """The returnflag predicate must reach the lineitem parquet scan."""
    df = REGISTRY["returned_items"].fn(spark, SF_ORACLE)
    p = plan(df)
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)" in p


def test_window_rank_uses_window_group_limit(spark):
    """rank()<=k filters must plan through WindowGroupLimit (Spark 3.5+
    optimization): each partition keeps only k rows BEFORE the full
    window sort — the difference between sorting k rows and sorting the
    whole group at 100 TB."""
    p = plan(REGISTRY["window_rank"].fn(spark, SF_ORACLE), mode="simple")
    assert "WindowGroupLimit" in p, p[:800]


def test_lag_features_single_window_pass(spark):
    """Six features over the same (user_id, ts) ordering must fuse into
    ONE Window node behind ONE exchange — per-feature window passes
    would re-sort the 100 TB event stream once per column."""
    p = plan(REGISTRY["lag_features"].fn(spark, SF_ORACLE), mode="simple")
    assert p.count("Window") == 1, p[:800]
    assert p.count("Exchange") == 1, p[:800]


def test_line_dedup_two_hash_shuffles_no_sort(spark):
    """Segment dedup is two hash-partition exchanges (segment-hash agg +
    doc regroup; plus the small-file spread) and never a global sort."""
    df = REGISTRY["line_dedup"].fn(spark, SF_ORACLE)
    p = plan(df)
    assert "Sort [" not in p.replace("SortAggregate", ""), p
    assert p.count("Exchange rangepartitioning") == 0


def test_cdc_apply_single_window_shuffle(spark):
    """CDC compaction is ONE window over the key — no extra exchanges
    beyond the key hash partitioning of the unioned log."""
    df = REGISTRY["cdc_apply"].fn(spark, SF_ORACLE)
    p = plan(df)
    assert p.count("Window") >= 1
    # all exchanges hash-partition on the key k; none range-partition
    assert "Exchange rangepartitioning" not in p


def test_key_skew_profile_take_ordered(spark):
    """Top-20 heavy keys use TakeOrdered, not a global sort of all keys."""
    df = REGISTRY["key_skew_profile"].fn(spark, SF_ORACLE)
    p = plan(df)
    assert "TakeOrderedAndProject" in p


def test_event_dedup_single_window(spark):
    df = REGISTRY["event_dedup_window"].fn(spark, SF_ORACLE)
    p = plan(df)
    # exactly one window operator (formatted mode prints each node twice:
    # tree + detail — count the windowspec itself)
    assert p.count("windowspecdefinition") == 1


def test_bloom_probe_is_scan_side_filter(spark):
    """The Bloom probe runs as a Filter directly over the fact scan —
    before the join exchange — so pruned rows never shuffle."""
    df = REGISTRY["bloom_prune_join"].fn(spark, SF_ORACLE)
    p = plan(df)
    assert "xxhash64" in p, "bloom probe expression missing from plan"
    scan_block = p[p.index("Scan parquet"):] if "Scan parquet" in p else p
    assert "xxhash64" in p.split("Exchange")[0] or "BroadcastExchange" in p


def test_bm25_broadcast_stats_and_take_ordered(spark):
    """BM25: term IN-list filters before any exchange, (N,avgdl) and df
    ride broadcasts, and the top-k folds to TakeOrderedAndProject."""
    df = REGISTRY["bm25_topk"].fn(spark, SF_ORACLE)
    p = plan(df)
    assert "TakeOrderedAndProject" in p
    assert p.count("BroadcastExchange") >= 2
    assert "CartesianProduct" not in p


def test_semantic_dedup_single_cluster_join_no_udf(spark):
    """SemDeDup: centroid assignment is a pure projection (no UDF);
    the only equi-join key is the cluster id; no cartesian product."""
    df = REGISTRY["semantic_dedup"].fn(spark, SF_ORACLE)
    p = plan(df)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "CartesianProduct" not in p


def test_winnowing_single_data_shuffle(spark):
    """Winnowing: window minima + per-doc rollup reuse the doc_id
    partitioning — the gram stream is shuffled once (plus the tiny
    short-doc branch)."""
    df = REGISTRY["winnowing"].fn(spark, SF_ORACLE)
    p = plan(df, mode="simple")
    assert p.count("Exchange") <= 3
    assert "CartesianProduct" not in p


def test_dsir_bucket_model_broadcasts(spark):
    """DSIR: the bucket weight model and corpus totals are broadcast —
    per-doc scoring never shuffles the token stream by bucket."""
    df = REGISTRY["dsir_select"].fn(spark, SF_ORACLE)
    p = plan(df)
    assert p.count("BroadcastExchange") >= 2


def test_bpe_pair_counts_take_ordered(spark):
    df = REGISTRY["bpe_pair_counts"].fn(spark, SF_ORACLE)
    p = plan(df)
    assert "TakeOrderedAndProject" in p


def test_substring_dedup_no_sort_linear_joins(spark):
    """Span-profile must be hash-shuffles only (explode -> count ->
    rejoin): no sort anywhere, no broadcast of the corpus-sized span
    frame, no Python UDF."""
    df = REGISTRY["substring_dedup"].fn(spark, SF_ORACLE)
    p = plan(df)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Exchange rangepartitioning" not in p
    assert "SortMergeJoin" in p or "BroadcastHashJoin" in p or "ShuffledHashJoin" in p


def test_rrf_fusion_take_ordered_lists(spark):
    """Both source rankings and the fused result must end in
    TakeOrderedAndProject — never a global sort of the corpus."""
    df = REGISTRY["rrf_fusion"].fn(spark, SF_ORACLE)
    p = plan(df)
    assert "TakeOrderedAndProject" in p
    assert "Exchange rangepartitioning" not in p
    assert "BatchEvalPython" not in p


def test_hard_negatives_broadcasts_queries(spark):
    """The query side must broadcast; corpus must not sort globally."""
    df = REGISTRY["hard_negatives"].fn(spark, SF_ORACLE)
    p = plan(df)
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "Exchange rangepartitioning" not in p


def test_dq_checks_one_scan_per_row_rule_table(spark):
    """Row rules fold into single aggregates; referential checks are
    left_anti joins (no cartesian, no Python)."""
    df = REGISTRY["dq_checks"].fn(spark, SF_ORACLE)
    p = plan(df)
    assert "BatchEvalPython" not in p
    assert "CartesianProduct" not in p
    assert "LeftAnti" in p


def test_pq_topk_codes_only_adc_no_python(spark):
    """PQ: no Python eval, no global sort; the ADC scan must join
    broadcast (queries) against the encoded frame."""
    df = REGISTRY["pq_topk"].fn(spark, SF_ORACLE)
    p = plan(df)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Exchange rangepartitioning" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_l_diversity_two_aggs_no_window(spark):
    """Entropy l-diversity must be the two-level aggregate form — no
    window sort, dim side broadcast."""
    df = REGISTRY["l_diversity"].fn(spark, SF_ORACLE)
    p = plan(df)
    assert "Window" not in p
    assert "BroadcastHashJoin" in p
    assert "Exchange rangepartitioning" not in p


def test_seasonal_anomaly_broadcast_profiles(spark):
    """Seasonal profile and residual moments are tiny aggregates —
    both joins back to events must broadcast; no sort anywhere."""
    df = REGISTRY["seasonal_anomaly"].fn(spark, SF_ORACLE)
    p = plan(df)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "Exchange rangepartitioning" not in p


def test_join_cardinality_never_executes_the_join(spark):
    """The exact cardinality must come from the key-histogram join
    (post-agg), never by materializing orders x lineitem: the plan's
    joins may only see aggregated inputs."""
    df = REGISTRY["join_cardinality"].fn(spark, SF_ORACLE)
    p = plan(df, mode="simple")
    # histogram join inputs are HashAggregates, so every join in the
    # plan sits above at least one aggregate
    assert "HashAggregate" in p
    assert "CartesianProduct" not in p  # scalar crossJoins broadcast


def test_join_strategy_hints_are_honored(spark):
    """The engine exposes Spark's join-strategy hints: the same
    dim join flips between broadcast and shuffle-hash when hinted —
    the manual override lever when statistics mislead the planner."""
    from customer_segmentation_pyspark_spark.sources import load_table

    li = load_table(spark, SF_ORACLE, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    sup = load_table(spark, SF_ORACLE, "supplier").select("s_suppkey")
    bcast = li.join(
        sup.hint("broadcast"), li.l_suppkey == sup.s_suppkey
    )
    assert "BroadcastHashJoin" in plan(bcast)
    shj = li.join(
        sup.hint("shuffle_hash"), li.l_suppkey == sup.s_suppkey
    )
    p = plan(shj)
    assert "ShuffledHashJoin" in p and "BroadcastHashJoin" not in p
    smj = li.join(
        sup.hint("merge"), li.l_suppkey == sup.s_suppkey
    )
    p = plan(smj)
    assert "SortMergeJoin" in p and "BroadcastHashJoin" not in p


def test_cbo_uses_analyzed_stats_for_broadcast(spark, tmp_path):
    """ANALYZE TABLE COMPUTE STATISTICS feeds the cost-based optimizer:
    a saved small table with fresh stats broadcasts under a tight
    autoBroadcastJoinThreshold that would otherwise see unknown size."""
    from customer_segmentation_pyspark_spark.sources import load_table

    spark.sql("DROP TABLE IF EXISTS cbo_dim")
    loc = str(tmp_path / "cbo_dim")
    load_table(spark, SF_ORACLE, "supplier").select(
        "s_suppkey", "s_nationkey"
    ).write.option("path", loc).saveAsTable("cbo_dim")
    spark.sql("ANALYZE TABLE cbo_dim COMPUTE STATISTICS")
    est = spark.sql("DESC EXTENDED cbo_dim").filter(
        "col_name = 'Statistics'"
    ).collect()
    assert est, "ANALYZE produced no statistics row"
    li = load_table(spark, SF_ORACLE, "lineitem").select("l_suppkey")
    j = li.join(
        spark.table("cbo_dim"), li.l_suppkey == F.col("s_suppkey")
    )
    assert "BroadcastHashJoin" in plan(j)
    spark.sql("DROP TABLE IF EXISTS cbo_dim")


def test_iterative_graph_loop_is_exchange_free(spark):
    """r03 regression pin: the per-iteration pagerank plan — cached
    dst-partitioned edge list, broadcast rank frame, groupBy(dst) —
    must contain ZERO non-broadcast exchanges (cache preserves
    outputPartitioning; swapping it back to localCheckpoint would
    silently reintroduce a per-iteration shuffle)."""
    import re

    edges = spark.createDataFrame(
        [(i, (i * 7) % 50) for i in range(1000)], "src long, dst long"
    )
    ed = (
        edges.repartition("dst").cache()
    )
    ed.count()
    try:
        ranks = ed.select(F.col("src").alias("node")).distinct().withColumn(
            "rank", F.lit(0.01)
        )
        sums = (
            ed.join(F.broadcast(ranks), ed["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum("rank").alias("s"))
        )
        p = plan(sums)
        # partial and final HashAggregate ADJACENT = no exchange between
        # them (the one-time exchanges inside the InMemoryRelation build
        # and the broadcast subtree are expected and excluded)
        assert re.search(
            r"HashAggregate \(\d+\)\n\s*\+- HashAggregate \(\d+\)", p
        ), f"iteration agg re-shuffles (no adjacent partial/final):\n{p}"
        assert "BroadcastHashJoin" in p
        assert "InMemoryTableScan" in p  # cache, not checkpoint
    finally:
        ed.unpersist()


def test_grouped_agg_pandas_udf_matches_expression(spark):
    """r04: the GROUPED_AGG pandas-UDF flavor — weighted_mean_pandas in
    groupBy().agg() AND as a window aggregate — equals the declarative
    sum(v*w)/sum(w) twin, and the plan shows AggregateInPandas (no
    partial agg: the documented scale tradeoff of this UDF flavor)."""
    from pyspark.sql import Window

    from customer_segmentation_pyspark_spark.functions import pandas_fns
    from customer_segmentation_pyspark_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("double").alias("w"),
    )
    got = {
        r["l_returnflag"]: round(r["wm"], 9)
        for r in li.groupBy("l_returnflag")
        .agg(pandas_fns.weighted_mean_pandas("v", "w").alias("wm"))
        .collect()
    }
    twin = {
        r["l_returnflag"]: round(r["wm"], 9)
        for r in li.groupBy("l_returnflag")
        .agg((F.sum(F.col("v") * F.col("w")) / F.sum("w")).alias("wm"))
        .collect()
    }
    assert got.keys() == twin.keys()
    for k in twin:
        assert abs(got[k] - twin[k]) < 1e-6, k

    agg_df = li.groupBy("l_returnflag").agg(
        pandas_fns.weighted_mean_pandas("v", "w").alias("wm")
    )
    # Spark 4.1 names the node ArrowAggregatePython (AggregateInPandas
    # in 3.x) — match either
    p = plan(agg_df)
    assert "ArrowAggregatePython" in p or "AggregateInPandas" in p

    # window flavor: per-partition constant equals the group aggregate
    w = Window.partitionBy("l_returnflag")
    win_rows = (
        li.withColumn("wm", pandas_fns.weighted_mean_pandas("v", "w").over(w))
        .select("l_returnflag", "wm")
        .distinct()
        .collect()
    )
    assert len(win_rows) == len(twin)
    for r in win_rows:
        assert abs(r["wm"] - twin[r["l_returnflag"]]) < 1e-6


def test_grouped_agg_pandas_udf_null_and_zero_weight_edges(spark):
    """The UDF must not drift from the twin on the edges lineitem never
    exercises: all-NULL values (twin NULL, not 0.0), and rows where v
    and w have DIFFERENT null masks (sum(v*w) and sum(w) skip different
    row sets). Zero total weight is the ONE pinned difference: the raw
    twin RAISES DIVIDE_BY_ZERO under Spark 4's ANSI default; the UDF
    matches the try_divide twin and returns NULL (an Arrow grouped-agg
    scalar cannot carry NaN — it arrives as NULL)."""
    from customer_segmentation_pyspark_spark.functions import pandas_fns

    rows = [
        # g=all_null_v: every v NULL, w non-null -> sum(v*w) NULL -> NULL
        ("all_null_v", None, 1.0), ("all_null_v", None, 2.0),
        # g=zero_w: sum(v*w)=0.0, sum(w)=0.0
        ("zero_w", 1.0, 0.0), ("zero_w", 2.0, 0.0),
        # g=mixed: (v NULL, w=10) contributes to sum(w) only ->
        # sum(v*w)=3*2=6, sum(w)=12 -> 0.5
        ("mixed", 3.0, 2.0), ("mixed", None, 10.0),
        # g=null_w: (v=5, w NULL) drops from BOTH sums -> 7*2/2 = 7
        ("null_w", 5.0, None), ("null_w", 7.0, 2.0),
    ]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    for expr in (
        pandas_fns.weighted_mean_pandas("v", "w"),
        F.try_divide(F.sum(F.col("v") * F.col("w")), F.sum("w")),
    ):
        got = {
            r["g"]: r["wm"]
            for r in df.groupBy("g").agg(expr.alias("wm")).collect()
        }
        assert got["all_null_v"] is None, expr
        assert got["null_w"] == 7.0, expr
        assert abs(got["mixed"] - 0.5) < 1e-12, expr
        assert got["zero_w"] is None, expr

    # the RAW twin raises on the zero-weight group under ANSI — the
    # divergence the UDF's try_divide semantics deliberately smooths
    import pyspark.errors

    with pytest.raises(pyspark.errors.exceptions.base.ArithmeticException):
        df.groupBy("g").agg(
            (F.sum(F.col("v") * F.col("w")) / F.sum("w")).alias("wm")
        ).collect()
