"""Opt-in scale smoke (SPARK_GRAFT_SCALE_TEST=1): replicate lineitem 10x
(~6M rows) into /tmp and verify the core aggregate/join plans produce
correct results and near-linear runtime. Excluded from the default suite
to keep CI fast; run manually when touching partitioning/shuffle logic."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.sources import load_table

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_TEST") != "1",
    reason="scale smoke is opt-in (SPARK_GRAFT_SCALE_TEST=1)",
)

SF01 = "/root/testdata/sf0.1"
REPLICAS = 10


@pytest.fixture(scope="module")
def big_lineitem(spark, tmp_path_factory):
    """lineitem x10 with shifted order keys (~6M rows, written once)."""
    path = str(tmp_path_factory.mktemp("scale") / "lineitem_big")
    li = load_table(spark, SF01, "lineitem")
    shift = 10_000_000
    parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * shift))
        for i in range(REPLICAS)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.repartition(32).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def test_agg_correct_and_scales(spark, big_lineitem):
    li = load_table(spark, SF01, "lineitem")
    base = {
        (r["l_returnflag"], r["l_linestatus"]): (r["n"], r["qty"])
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty"))
        .collect()
    }
    t0 = time.perf_counter()
    big = {
        (r["l_returnflag"], r["l_linestatus"]): (r["n"], r["qty"])
        for r in big_lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty"))
        .collect()
    }
    elapsed = time.perf_counter() - t0
    for k, (n, qty) in base.items():
        assert big[k][0] == n * REPLICAS
        assert abs(big[k][1] - qty * REPLICAS) < 1e-4 * qty
    # 6M rows through a hash agg should be a few seconds on local[32]
    assert elapsed < 30, f"agg at 10x took {elapsed:.1f}s"


def test_join_correct_at_scale(spark, big_lineitem):
    part = load_table(spark, SF01, "part")
    joined = (
        big_lineitem.join(
            F.broadcast(part),
            big_lineitem.l_partkey == part.p_partkey,
        )
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    base = (
        load_table(spark, SF01, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {r["p_brand"]: r["n"] for r in joined.collect()}
    expected = {r["p_brand"]: r["n"] * REPLICAS for r in base.collect()}
    assert got == expected


def test_lsh_hot_bucket_at_scale(spark):
    """1M identical minhash signatures (the boilerplate-web-corpus worst
    case): the capped LSH pipeline must finish in bounded time/memory
    with LINEAR star-pair output, where uncapped in-bucket expansion
    would attempt ~4e12 pairs."""
    from customer_segmentation_pyspark_spark.operators import dedup

    n = 1_000_000
    sig = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array(*[F.lit(i * 31 + 5).cast("long") for i in range(16)]).alias(
            "sig"
        ),
    )
    t0 = time.perf_counter()
    pairs = dedup.lsh_candidate_pairs(sig, max_bucket_size=1024)
    assert pairs.count() == n - 1
    elapsed = time.perf_counter() - t0
    assert elapsed < 120, f"hot-bucket LSH at 1M took {elapsed:.1f}s"


def test_star_cc_deep_chain_at_scale(spark):
    """100k-node path (diameter ~1e5 — label propagation would need 1e5
    shuffle rounds): star CC must converge in O(log n) rounds with the
    exact single-component answer."""
    from customer_segmentation_pyspark_spark.operators import dedup

    n = 100_000
    edges = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    labels, rounds = dedup.star_connected_components(edges)
    assert rounds <= 25, f"expected O(log n) rounds, got {rounds}"
    agg = labels.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("component").alias("s"),
        F.max("component").alias("m"),
    ).collect()[0]
    assert (agg["n"], agg["s"], agg["m"]) == (n, 0, 0)


def test_block_gemm_neardup_at_scale(spark):
    """Block-pair GEMM on 50k synthetic 32-dim vectors: bounded task
    memory (rows_per_block=4096 -> ~70 block pairs), exact pair count
    for the planted duplicate pairs."""
    from customer_segmentation_pyspark_spark.operators import dedup

    n = 50_000
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(31)),
            lambda i: F.when((F.col("id") + i) % 97 < 48, 1.0).otherwise(-1.0),
        ).alias("embedding"),
    )
    # vec 0 is all-ones (its whole window [id, id+31] stays < 48 mod 97);
    # for +-1 vectors cos >= 0.999 forces bit-identity, so its neighbors
    # are exactly the other all-ones ids (residues 0..16 mod 97)
    pairs = dedup.embedding_neardup_pairs(
        base.filter(F.col("vec_id") < 10_000),
        threshold=0.999,
        rows_per_block=4096,
    )
    got = pairs.filter(F.col("id_a") == 0).count()
    expected = sum(
        1
        for x in range(1, 10_000)
        if all((x + i) % 97 < 48 for i in range(32))
    )
    assert got == expected


def test_segment_dedup_hot_boilerplate_at_scale(spark):
    """500k docs all sharing one boilerplate segment: the corpus-wide
    frequency agg must stay a hash aggregate on the segment hash (the
    hot segment COMPRESSES map-side, it never materializes a per-doc
    list) and every doc must lose exactly the boilerplate."""
    import time

    from customer_segmentation_pyspark_spark.operators.dedup import (
        segment_dedup,
    )

    n = 500_000
    boiler = " ".join(f"b{i}" for i in range(8))
    docs = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit(boiler + " unique"),
                F.col("id").cast("string"),
                F.lit(" words here padding out segment two"),
            ).alias("text"),
        )
    )
    t0 = time.perf_counter()
    out = segment_dedup(docs, seg_words=8, min_docs=2)
    agg = out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_dup_segs").alias("dropped"),
    ).collect()[0]
    elapsed = time.perf_counter() - t0
    assert agg["n_docs"] == n
    assert agg["dropped"] == n  # exactly the boilerplate segment per doc
    assert elapsed < 120, f"hot-segment dedup took {elapsed:.0f}s"


def test_prefix_jaccard_stop_shingle_at_scale(spark):
    """100k docs sharing a universal (stop) shingle but pairwise-distinct
    elsewhere: rarest-first prefix selection must keep the hot shingle
    OUT of every prefix, so the candidate join stays ~empty instead of
    quadratic. Completes fast and returns zero >=0.5 pairs."""
    import time

    from customer_segmentation_pyspark_spark.operators.dedup import (
        prefix_jaccard_pairs,
    )

    n = 100_000
    docs = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("common stop shingle "),
                F.col("id").cast("string"),
                F.lit("a "),
                F.col("id").cast("string"),
                F.lit("b "),
                F.col("id").cast("string"),
                F.lit("c "),
                F.col("id").cast("string"),
                F.lit("d "),
                F.col("id").cast("string"),
                F.lit("e"),
            ).alias("text"),
        )
    )
    t0 = time.perf_counter()
    n_pairs = prefix_jaccard_pairs(docs, n=3, threshold=0.5).count()
    elapsed = time.perf_counter() - t0
    assert n_pairs == 0
    assert elapsed < 120, f"stop-shingle prefix join took {elapsed:.0f}s"


def test_substring_dedup_hot_span_at_scale(spark):
    """500k docs all sharing one boilerplate license block (the
    million-copy hot-span case): span multiplicity is a summed counter,
    never a bucket array, so the profile completes in seconds and every
    doc reports the boilerplate spans as duplicated."""
    import time

    from customer_segmentation_pyspark_spark.operators.dedup import (
        duplicated_span_profile,
    )

    n = 500_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("LICENSE: this block is identical in every document "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    t0 = time.perf_counter()
    out = duplicated_span_profile(docs, span_len=24, stride=6)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("n_dup_spans").alias("min_dup"),
    ).collect()[0]
    elapsed = time.perf_counter() - t0
    assert agg["n"] == n
    # the shared prefix alone yields several duplicated spans per doc
    assert agg["min_dup"] >= 3
    assert elapsed < 120, f"hot-span profile took {elapsed:.0f}s"


def test_bfs_long_chain_at_scale(spark):
    """BFS on a 200k-node directed path with max_hops=12: the frontier
    loop must stay O(rounds) with single-row frontiers (worst case for
    per-round overhead) and return exactly hops 0..12."""
    from customer_segmentation_pyspark_spark.operators.graph import (
        bfs_hops,
    )

    n = 200_000
    edges = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    t0 = time.perf_counter()
    out = {r["node"]: r["hops"] for r in bfs_hops(edges, 0, 12).collect()}
    elapsed = time.perf_counter() - t0
    assert out == {i: i for i in range(13)}
    assert elapsed < 60, f"13-round BFS took {elapsed:.0f}s"


def test_bpe_learn_wide_vocab_at_scale(spark):
    """BPE training over a 1M-token synthetic corpus (200k docs, skewed
    Zipf-ish vocab): rounds run over the DISTINCT vocab so the loop
    must finish fast, and the top merge must be the planted dominant
    bigram 'qx' (present in every doc's hot word)."""
    from customer_segmentation_pyspark_spark.operators import textops

    docs = spark.range(200_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("qxqx"),  # dominant word: 'qx' pair count 2 per doc
            F.lit(" word"),
            (F.col("id") % 997).cast("string"),  # 997-word tail vocab
            F.lit(" filler"),
        ).alias("text"),
    )
    t0 = time.perf_counter()
    merges = textops.bpe_learn(docs, n_merges=3).collect()
    elapsed = time.perf_counter() - t0
    assert merges[0]["left"] == "q" and merges[0]["right"] == "x"
    assert merges[0]["pair_count"] == 400_000
    assert elapsed < 90, f"3 BPE rounds took {elapsed:.0f}s"


def test_sssp_long_chain_at_scale(spark):
    """Bounded Bellman-Ford on a 150k-node weighted path, 10 rounds:
    per-round cost must stay O(edges) with the broadcast dist frame
    (worst case for round overhead — single-row growth per round), and
    distances must be the exact prefix sums."""
    from customer_segmentation_pyspark_spark.operators.graph import (
        sssp_bounded,
    )

    n = 150_000
    edges = spark.range(n - 1).select(
        F.col("id").alias("src"),
        (F.col("id") + 1).alias("dst"),
        F.lit(0.5).alias("w"),
    )
    t0 = time.perf_counter()
    out = {
        r["node"]: r["dist"]
        for r in sssp_bounded(edges, 0, n_rounds=10).collect()
    }
    elapsed = time.perf_counter() - t0
    assert out == {i: i * 0.5 for i in range(11)}
    assert elapsed < 60, f"10 Bellman-Ford rounds took {elapsed:.0f}s"


def test_label_propagation_planted_cliques_at_scale(spark):
    """LPA over 2,000 planted 50-cliques (100k nodes, ~2.45M directed
    edges): 4 sync rounds must label every clique uniformly by its own
    minimum (no cross-clique edges -> 2,000 distinct communities) in
    bounded time."""
    from customer_segmentation_pyspark_spark.operators.graph import (
        label_propagation,
    )

    k, n_cliques = 50, 2_000
    nodes = spark.range(k * n_cliques).select(
        (F.col("id") / k).cast("long").alias("c"), F.col("id")
    )
    edges = (
        nodes.alias("a")
        .join(nodes.alias("b"), "c")
        .filter(F.col("a.id") != F.col("b.id"))
        .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
    )
    t0 = time.perf_counter()
    out = label_propagation(edges, n_rounds=4)
    agg = out.groupBy("community").agg(F.count(F.lit(1)).alias("n"))
    rows = agg.collect()
    elapsed = time.perf_counter() - t0
    assert len(rows) == n_cliques
    assert all(r["n"] == k for r in rows)
    assert elapsed < 90, f"4 LPA rounds took {elapsed:.0f}s"


def test_streaming_gate_probe_is_incremental_at_scale(spark, tmp_path):
    """VERDICT r02 #7: against a 100k-doc signature index, a 1k-doc
    batch's probe POPULATION (touched index docs + batch, counted via
    Observation — no extra scan) stays O(batch x bucket), not O(index);
    planted duplicates are all flagged."""
    from pyspark.sql import Observation

    from customer_segmentation_pyspark_spark.streaming.neardup import (
        batch_signatures,
        probe_and_update_index,
    )

    n_index, n_dup, n_new = 100_000, 500, 500
    text_expr = (
        "concat_ws(' ', transform(sequence(0, 11), "
        "j -> concat('w', cast(pmod(hash(id, j, {salt}), 999983) as string))))"
    )
    index_docs = spark.range(n_index).selectExpr(
        "id as doc_id", text_expr.format(salt=1) + " as text"
    )
    index_dir = str(tmp_path / "idx")
    # seed the index directly in its on-disk format (signature rows)
    batch_signatures(index_docs).write.parquet(index_dir)

    dups = spark.range(n_dup).selectExpr(
        "id + 200000 as doc_id", text_expr.format(salt=1) + " as text"
    )  # same text generator + same ids 0..499 -> exact dups of index docs
    news = spark.range(n_new).selectExpr(
        "id + 300000 as doc_id", text_expr.format(salt=2) + " as text"
    )
    batch = dups.unionByName(news)

    obs = Observation("probe")
    flagged = probe_and_update_index(
        batch, index_dir, probe_observation=obs
    ).collect()

    probe_docs = obs.get["probe_docs"]
    n_batch = n_dup + n_new
    # O(batch), emphatically not O(index): even with every dup touching
    # its original's buckets plus hash-accident collisions, the probe
    # population stays a small multiple of the batch
    assert probe_docs <= 10 * n_batch, probe_docs
    assert probe_docs < n_index / 5, probe_docs

    # every planted dup flags against its lower-id original
    pairs = {(a, b) for a, b in ((r["doc_a"], r["doc_b"]) for r in flagged)}
    planted = {(i, i + 200000) for i in range(n_dup)}
    assert planted <= pairs, f"missing {len(planted - pairs)} planted dups"


def test_graph_spine_zero_exchange_holds_at_10x(spark):
    """r04 (VERDICT item 5a): the r03 exchange-free iteration spine at
    10x the sf0.1 graph scale — a 2M-edge / 200k-node cached
    dst-partitioned edge list must still let Catalyst plan each
    iteration's groupBy(dst) with ADJACENT partial/final HashAggregates
    (zero non-broadcast exchange), exactly as the small-graph plan pin
    in test_plans.py asserts. Cache partitioning is size-independent,
    but this is the receipt."""
    import re

    edges = spark.range(2_000_000).select(
        (F.col("id") % 200_000).alias("src"),
        ((F.col("id") * 7919 + 17) % 200_000).alias("dst"),
    )
    ed = edges.repartition("dst").cache()
    ed.count()
    try:
        ranks = (
            ed.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("rank", F.lit(1.0 / 200_000))
        )
        sums = (
            ed.join(F.broadcast(ranks), ed["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum("rank").alias("s"))
        )
        from tests.test_plans import plan

        p = plan(sums)
        assert re.search(
            r"HashAggregate \(\d+\)\n\s*\+- HashAggregate \(\d+\)", p
        ), f"iteration agg re-shuffles at 10x:\n{p[:1200]}"
        assert "BroadcastHashJoin" in p
        assert "InMemoryTableScan" in p
    finally:
        ed.unpersist()


def test_graph_spine_operators_at_10x_with_fallback(spark):
    """r04 (VERDICT item 5b): pagerank / label_propagation /
    sssp_bounded run end-to-end on the 2M-edge graph, and lowering
    broadcast_max_nodes to 1 (forcing the shuffle fallback on a graph
    where the guard genuinely matters) produces matching answers —
    round(7) for the spectral loop, exact for the min-based ones."""
    from customer_segmentation_pyspark_spark.operators.graph import (
        label_propagation,
        pagerank,
        sssp_bounded,
    )

    n_nodes = 200_000
    edges = (
        spark.range(2_000_000)
        .select(
            (F.col("id") % n_nodes).alias("src"),
            ((F.col("id") * 7919 + 17) % n_nodes).alias("dst"),
        )
        .localCheckpoint()
    )

    t0 = time.perf_counter()
    pr_fast = pagerank(edges, n_iter=4)
    mass = pr_fast.agg(F.sum("rank").alias("m")).collect()[0]["m"]
    assert abs(mass - 1.0) < 1e-6
    assert pr_fast.count() == n_nodes
    t_fast = time.perf_counter() - t0

    # fallback triggers (broadcast guard lowered below the node count).
    # Order by the ROUNDED rank with a node tie-break: the two paths'
    # summation orders differ below round-off, so exact-rank ordering
    # could swap near-tied nodes across the rank-100 boundary
    pr_slow = pagerank(edges, n_iter=4, broadcast_max_nodes=1)

    def top100(df):
        return [
            (r["node"], r["r7"])
            for r in df.select(
                "node", F.round("rank", 7).alias("r7")
            )
            .orderBy(F.desc("r7"), "node")
            .limit(100)
            .collect()
        ]

    assert top100(pr_fast) == top100(pr_slow)

    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    lp = label_propagation(sym, n_rounds=2)
    assert lp.count() == n_nodes

    wedges = edges.withColumn(
        "w", (F.col("src") % 5 + 1).cast("double")
    )
    ss = sssp_bounded(wedges, 0, n_rounds=3)
    assert ss.filter(F.col("node") == 0).collect()[0]["dist"] == 0.0
    assert ss.count() > 0
    # smoke-level runtime sanity: the broadcast path at 10x must stay
    # interactive on local[32] (generous bound — this is a canary for
    # accidental quadratic regressions, not a benchmark)
    assert t_fast < 180, t_fast


def test_mor_append_write_bytes_at_scale(spark, tmp_path):
    """MoR at size: a 1M-row base snapshot takes a 1k-row change batch
    as an O(|delta|) append — base dirs byte-identical (same names,
    same sizes), total new bytes ~ the delta, and the overlay read
    returns the merged truth. The fold then restores the no-overlay
    read. This is the write-amplification contract that justifies MoR
    at 100 TB."""
    import os as _os

    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        compact_mor_partitions,
        merge_mor_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )

    table = str(tmp_path / "t")
    n = 1_000_000
    base = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 997).cast("double").alias("val"),
        F.lit(0).cast("long").alias("seq"),
        F.lit("U").alias("op"),
    )
    merge_mor_into_partitioned_snapshot(
        spark, table, base, "k", "seq", num_partitions=16,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    compact_mor_partitions(spark, table)

    def dir_bytes(d):
        full = _os.path.join(table, d)
        return sum(
            _os.path.getsize(_os.path.join(full, f))
            for f in _os.listdir(full)
            if not f.startswith(".")
        )

    man1 = versioned.read_manifest(table)
    sizes1 = {d: dir_bytes(d) for d in man1["parts"].values()}
    total_before = sum(sizes1.values())

    delta = spark.range(1_000).select(
        (F.col("id") * 977).alias("k"),  # spread over partitions
        F.lit(-1.0).alias("val"),
        F.lit(1).cast("long").alias("seq"),
        F.when(F.col("id") % 10 == 0, "D").otherwise("U").alias("op"),
    )
    t0 = time.perf_counter()
    merge_mor_into_partitioned_snapshot(
        spark, table, delta, "k", "seq",
        delete_when="op = 'D'", marker_cols=("op",),
    )
    append_sec = time.perf_counter() - t0
    man2 = versioned.read_manifest(table)
    assert man2["parts"] == man1["parts"]  # base untouched
    for d, sz in sizes1.items():
        assert dir_bytes(d) == sz
    new_bytes = sum(
        dir_bytes(d) for log in man2["deltas"].values() for d in log
    )
    # the append cost is the delta, not the snapshot
    assert new_bytes < total_before / 50, (new_bytes, total_before)

    # overlay read is correct at size: spot-check survivors + deletes
    got = {
        r["k"]: r["val"]
        for r in read_partitioned_snapshot(
            spark, table, key_in=[0, 977, 9770, 42]
        ).collect()
    }
    assert got[977] == -1.0 and got[42] == float(42 % 997)
    assert 0 not in got and 9770 not in got  # id 0 and 10 were deletes
    assert versioned.snapshot_row_count(table) is None  # log pending
    folded = compact_mor_partitions(spark, table)
    assert folded
    assert versioned.snapshot_row_count(table) == n - 100
    print(f"\nMoR append over {n} rows: {append_sec:.2f}s, "
          f"{new_bytes/1e3:.0f} kB vs base {total_before/1e6:.1f} MB")


def test_ivf_index_probe_and_update_locality_at_scale(spark, tmp_path):
    """The maintained IVF index's two 100 TB contracts, pinned at 500k
    vectors: (a) a probe query OPENS only the probed cells' dirs
    (inputFiles ⊆ those dirs — the object-store prefix-pruning claim),
    and (b) a small CDC batch rewrites only the affected cells — every
    other cell dir is carried into the new manifest verbatim and its
    bytes are untouched."""
    import os as _os

    import numpy as np

    from customer_segmentation_pyspark_spark.operators.vector_index import (
        build_ivf_index,
        query_ivf_index,
        update_ivf_index,
    )
    from customer_segmentation_pyspark_spark.sources import versioned

    dim, n_cells = 16, 32
    cells = np.random.RandomState(5).normal(size=(n_cells, dim)).tolist()
    n = 500_000
    corpus = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: F.sin(F.col("id") * i).cast("double"),
        ).alias("embedding"),
    )
    idx = str(tmp_path / "idx")
    t0 = time.perf_counter()
    build_ivf_index(spark, idx, corpus, cells)
    build_sec = time.perf_counter() - t0

    # (a) probe locality: the scan behind the result reads only dirs of
    # the probed cells (<= n_probe * |queries| distinct, here 3 queries)
    q = corpus.filter(F.col("vec_id") < 3)
    out = query_ivf_index(spark, idx, q, n_probe=3, k=5)
    assert out.count() == 15
    touched = {
        _os.path.basename(_os.path.dirname(f)) for f in out.inputFiles()
    }
    assert len(touched) <= 9, touched  # <= 3 queries x 3 probes
    man1 = versioned.read_manifest(idx)
    assert touched <= set(man1["parts"].values())

    def dir_bytes(d):
        full = _os.path.join(idx, d)
        return sum(
            _os.path.getsize(_os.path.join(full, f))
            for f in _os.listdir(full)
            if not f.startswith(".")
        )

    sizes1 = {d: dir_bytes(d) for d in man1["parts"].values()}

    # (b) update locality: a CELL-LOCAL batch (100 keys from one cell,
    # re-embedded onto one center so the new cell is also a single dir)
    # rewrites <= 2 cell dirs; every other entry is carried verbatim
    # with identical bytes. This is the realistic CDC shape — a locality
    # -preserving re-embed — and the contract that makes updates
    # O(affected cells) instead of O(index).
    some_cell_dir = next(iter(man1["parts"].values()))
    victim_ids = [
        r["vec_id"]
        for r in spark.read.parquet(_os.path.join(idx, some_cell_dir))
        .select("vec_id")
        .limit(100)
        .collect()
    ]
    target_center = [float(x) for x in cells[7]]
    delta = spark.createDataFrame(
        [(int(k),) for k in victim_ids], "vec_id long"
    ).select(
        "vec_id",
        F.array(*[F.lit(x) for x in target_center]).alias("embedding"),
        F.lit(1).cast("long").alias("seq"),
        F.lit("U").alias("op"),
    )
    t0 = time.perf_counter()
    update_ivf_index(spark, idx, delta)
    update_sec = time.perf_counter() - t0
    man2 = versioned.read_manifest(idx)
    rewritten = {
        c
        for c in set(man1["parts"]) | set(man2["parts"])
        if man1["parts"].get(c) != man2["parts"].get(c)
    }
    assert 1 <= len(rewritten) <= 2, rewritten
    carried = {
        c: d for c, d in man2["parts"].items() if man1["parts"].get(c) == d
    }
    assert len(carried) >= len(man1["parts"]) - 2  # some cells are empty
    for d in carried.values():
        assert dir_bytes(d) == sizes1[d], "untouched cell dir rewritten"
    # the update should be cheaper than the full build; the REAL
    # locality contract is the byte-identical untouched dirs above, so
    # allow 2x slack — this host has multi-minute contention episodes
    # (SCALE.md r07) that once inflated the update leg past the build
    # leg in the same test run
    assert update_sec < 2 * build_sec, (update_sec, build_sec)
    print(
        f"\nivf-scale: build {build_sec:.1f}s, update {update_sec:.1f}s, "
        f"rewrote {len(rewritten)}, carried {len(carried)}/{len(man2['parts'])}"
    )


def test_split_bounds_skewed_ingest_at_scale(spark, tmp_path):
    """r06 (VERDICT #2 done-criteria): a skewed ingest routes ~80% of
    500k vectors into one cell; split maintenance must end with bounded
    max-cell rows, byte-identical untouched dirs, and an unchanged
    probe result."""
    import numpy as np

    from customer_segmentation_pyspark_spark.operators.vector_index import (
        build_ivf_index,
        query_ivf_index,
        split_ivf_cells,
    )
    from customer_segmentation_pyspark_spark.sources import versioned

    dim, n = 8, 500_000
    rng = np.random.RandomState(3)
    centers = (rng.normal(size=(4, dim)) * 10).tolist()
    # 80% of vectors tightly around center 0, the rest spread over 1-3
    hot = F.col("id") % 5 < 4
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.when(hot, F.element_at(F.array(*[F.lit(float(x)) for x in centers[0]]), i.cast("int") + 1) + (F.pmod(F.xxhash64(F.col("id"), i), 100).cast("double") - 50.0) / 500.0)
            .otherwise(F.element_at(F.array(*[F.lit(float(x)) for x in centers[1]]), i.cast("int") + 1) + (F.pmod(F.xxhash64(F.col("id"), i), 100).cast("double") - 50.0) / 500.0),
        ).alias("embedding"),
    )
    idx = str(tmp_path / "idx")
    t0 = time.time()
    build_ivf_index(spark, idx, base, centers, keymap_partitions=32)
    man0 = versioned.read_manifest(idx)
    hot_cell = max(man0["rows"], key=lambda c: man0["rows"][c])
    assert man0["rows"][hot_cell] >= int(n * 0.75)
    q = spark.createDataFrame(
        [(999_999_999, centers[0])],
        "vec_id long, embedding array<double>",
    )
    before = sorted(
        map(tuple, query_ivf_index(spark, idx, q, n_probe=1, k=10).collect())
    )
    split_ivf_cells(spark, idx, cell_ids=[hot_cell], sub_k=8, seed=5)
    man1 = versioned.read_manifest(idx)
    # bounded: no resulting dir holds more than half the hot cell
    subs = man1["subcells"][hot_cell]["ids"]
    assert len(subs) >= 2
    assert max(man1["rows"].get(str(i), 0) for i in subs) <= int(
        man0["rows"][hot_cell] * 0.75
    ), "split must actually divide the hot cell"
    # untouched dirs carried byte-identical (same dir names in manifest)
    for c in set(man0["parts"]) - {hot_cell}:
        assert man1["parts"][c] == man0["parts"][c]
    after = sorted(
        map(tuple, query_ivf_index(spark, idx, q, n_probe=1, k=10).collect())
    )
    assert after == before, "split must not change probe results"
    print(f"skewed split smoke: {time.time() - t0:.1f}s")


def test_colindex_point_lookup_locality_at_scale(spark, tmp_path):
    """r07: the secondary column index's 100 TB contract at 1M rows /
    64 partitions — a point lookup on a rare non-key value opens a
    SMALL fraction of the table's partition dirs (the indexed set plus
    any dirs changed since the sync), and a stale lookup (post-sync
    wave) is still exact."""
    import os as _os

    from customer_segmentation_pyspark_spark.streaming.colindex import (
        read_by_column_value,
        sync_column_index,
    )
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )

    n, nparts = 1_000_000, 64
    base = spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("t"), (F.col("id") % 99_991).cast("string"))
        .alias("tag"),
        (F.col("id") * 2).alias("v"),
        F.lit(0).cast("long").alias("seq"),
    )
    d = str(tmp_path / "t")
    merge_into_partitioned_snapshot(
        spark, d, base, key="k", seq="seq", num_partitions=nparts
    )
    sync_column_index(spark, d, "tag", num_partitions=16)
    # ~10 rows per tag over 64 partitions -> <= 10 dirs per value
    got = read_by_column_value(spark, d, "tag", ["t12345"])
    assert got.count() == len([i for i in range(n) if i % 99991 == 12345])
    dirs = {_os.path.dirname(f) for f in got.inputFiles()}
    assert len(dirs) <= 12, len(dirs)
    # stale exactness: one post-sync row with a brand-new tag is found
    merge_into_partitioned_snapshot(
        spark, d,
        spark.createDataFrame([(n + 1, "fresh", 1, 1)],
                              "k long, tag string, v long, seq long"),
        key="k", seq="seq",
    )
    stale = read_by_column_value(spark, d, "tag", ["fresh"])
    assert [r["k"] for r in stale.collect()] == [n + 1]
    dirs2 = {_os.path.dirname(f) for f in stale.inputFiles()}
    assert len(dirs2) <= 2, len(dirs2)  # only the changed partition
    full = read_partitioned_snapshot(spark, d)
    assert len({_os.path.dirname(f) for f in full.inputFiles()}) == nparts


def test_range_index_locality_at_scale(spark, tmp_path):
    """r08: the bucketed range index's 100 TB contract at 1M rows /
    64 partitions — a SELECTIVE range on a non-key value column opens
    only the overlapping buckets' dirs (value has no correlation with
    the key hash, so footer stats could never prune this), and a stale
    range read after a post-sync wave adds only the changed
    partition."""
    import os as _os

    from customer_segmentation_pyspark_spark.streaming.colindex import (
        read_by_column_range,
        sync_range_index,
    )
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )

    n, nparts = 1_000_000, 64
    # value = a hash-scrambled permutation of [0, n): uniformly spread,
    # zero correlation with the key hash — the worst case for stats
    base = spark.range(n).select(
        F.col("id").alias("k"),
        F.pmod(F.xxhash64(F.col("id")), F.lit(n)).cast("double")
        .alias("score"),
        F.lit(0).cast("long").alias("seq"),
    )
    d = str(tmp_path / "t")
    merge_into_partitioned_snapshot(
        spark, d, base, key="k", seq="seq", num_partitions=nparts
    )
    # ~1000 values per bucket; a 2-bucket range matches ~0.2% of rows
    sync_range_index(
        spark, d, "score", bucket_width=1000.0, num_partitions=16
    )
    got = read_by_column_range(spark, d, "score", 5000.0, 6999.0)
    want = read_partitioned_snapshot(spark, d).filter(
        F.col("score").between(5000.0, 6999.0)
    )
    assert got.count() == want.count() > 0
    # ~2000 matching rows spread over 64 partitions: every dir likely
    # holds a few, so the honest claim is bucket-level: the read's
    # PLAN opens only the two buckets' mapped dirs — with a uniform
    # spread that is still all 64. Tighten the scenario: a range
    # narrower than one bucket containing ~20 rows via a second
    # indexed table.
    m = 100_000
    base2 = spark.range(m).select(
        F.col("id").alias("k"),
        (F.pmod(F.xxhash64(F.col("id")), F.lit(m)) * 100).cast("double")
        .alias("score"),
        F.lit(0).cast("long").alias("seq"),
    )
    d2 = str(tmp_path / "t2")
    merge_into_partitioned_snapshot(
        spark, d2, base2, key="k", seq="seq", num_partitions=nparts
    )
    # width 100 over values spaced 100 apart -> ~1 row per bucket
    sync_range_index(
        spark, d2, "score", bucket_width=100.0, num_partitions=16
    )
    sel = read_by_column_range(spark, d2, "score", 500_000.0, 501_999.0)
    want2 = read_partitioned_snapshot(spark, d2).filter(
        F.col("score").between(500_000.0, 501_999.0)
    )
    assert sel.count() == want2.count() > 0
    dirs = {_os.path.dirname(f) for f in sel.inputFiles()}
    assert len(dirs) <= 24, len(dirs)  # ~20 rows -> ~20 of 64 dirs
    # stale range read: the post-sync row lands in exactly one more dir
    merge_into_partitioned_snapshot(
        spark, d2,
        spark.createDataFrame([(m + 1, 500_050.0, 1)],
                              "k long, score double, seq long"),
        key="k", seq="seq",
    )
    stale = read_by_column_range(spark, d2, "score", 500_000.0, 501_999.0)
    assert stale.count() == want2.count() + 1
    dirs2 = {_os.path.dirname(f) for f in stale.inputFiles()}
    assert len(dirs2) <= len(dirs) + 1
    full = read_partitioned_snapshot(spark, d2)
    assert len({_os.path.dirname(f) for f in full.inputFiles()}) == nparts


def test_agg_merge_view_wave_locality_at_scale(spark, tmp_path):
    """r08: the merge-backed aggregate view's 100 TB contract at 1M
    source rows / ~100k groups / 64 view partitions — a wave touching
    20 groups rewrites ONLY those groups' hash partitions (manifest
    diff), leaves every other partition's dir untouched, and the
    folded groups match a recompute."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )
    from customer_segmentation_pyspark_spark.streaming.views import (
        read_agg_merge_view,
        sync_agg_merge_view,
    )

    n, ngroups, nparts = 1_000_000, 100_003, 64
    base = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % ngroups).cast("long").alias("grp"),
        (F.col("id") % 1_000).cast("long").alias("val"),
        F.lit(0).cast("long").alias("seq"),
    )
    table = str(tmp_path / "t")
    view = str(tmp_path / "v")
    merge_into_partitioned_snapshot(
        spark, table, base, key="k", seq="seq", num_partitions=32
    )
    sync_agg_merge_view(
        spark, table, view, "grp", F.col("val"), num_partitions=nparts
    )
    man_before = versioned.read_manifest(view)
    assert len(man_before["parts"]) == nparts

    # wave: 40 rows spread over 20 groups (updates + 2 deletes)
    wave = spark.createDataFrame(
        [(g * 17, (g * 17) % ngroups, 999, 1, "U") for g in range(18)]
        + [(18 * 17, (18 * 17) % ngroups, None, 1, "D"),
           (19 * 17, (19 * 17) % ngroups, None, 1, "D")],
        "k long, grp long, val long, seq long, op string",
    )
    merge_into_partitioned_snapshot(
        spark, table, wave, key="k", seq="seq",
        delete_when="op = 'D'", marker_cols=("op",),
    )
    sync_agg_merge_view(spark, table, view, "grp", F.col("val"))
    man_after = versioned.read_manifest(view)
    changed = {
        p
        for p in man_after["parts"]
        if man_after["parts"][p] != man_before["parts"].get(p)
    }
    # <= 20 distinct groups -> <= 20 view hash partitions rewritten
    assert 0 < len(changed) <= 20, len(changed)

    # folded groups equal the recompute (spot-check the touched set)
    touched_groups = [int((g * 17) % ngroups) for g in range(20)]
    got = {
        r["grp"]: (r["n_rows"], r["total"])
        for r in read_agg_merge_view(spark, view)
        .filter(F.col("grp").isin(touched_groups))
        .collect()
    }
    want = {
        r["grp"]: (r["n"], r["t"])
        for r in read_partitioned_snapshot(spark, table)
        .filter(F.col("grp").isin(touched_groups))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.coalesce("val", F.lit(0))).cast("long").alias("t"),
        )
        .collect()
    }
    assert got == want


def test_lsh_index_wave_locality_at_scale(spark, tmp_path):
    """r09 capstone #17 at 100k docs / 256 bucket partitions: a wave
    touching 3 docs rewrites only those docs' band-key hash partitions
    (<= 3 docs x 8 bands x 2 for moved keys), every other dir is
    carried byte-identical, and a 2-doc probe returns exactly the
    pairs a from-scratch band computation over the corpus yields."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )
    from customer_segmentation_pyspark_spark.streaming.neardup import (
        _band_rows,
        neardup_probe_maintained,
        sync_lsh_index,
    )

    n = 100_000
    # 5-token texts over a 1000-word rolling vocab: docs with the same
    # id % 1000 share all shingles (dup families of ~100)
    text = F.concat_ws(
        " ",
        *[F.concat(F.lit("w"), ((F.col("id") + i) % 1000)) for i in range(5)],
    )
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.lit(0).cast("long").alias("seq"),
        F.lit("U").alias("op"),
    )
    corpus = str(tmp_path / "c")
    idx = str(tmp_path / "i")
    merge_into_partitioned_snapshot(
        spark, corpus, base, key="doc_id", seq="seq", num_partitions=32,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    t0 = time.time()
    sync_lsh_index(spark, corpus, idx, num_partitions=256)
    seed_s = time.time() - t0
    man_before = versioned.read_manifest(idx)

    wave = spark.createDataFrame(
        [(7, "totally new words appearing here", 1, "U"),
         (1007, "totally new words appearing here", 1, "U"),
         (2007, None, 1, "D")],
        "doc_id long, text string, seq long, op string",
    )
    merge_into_partitioned_snapshot(
        spark, corpus, wave, key="doc_id", seq="seq",
        delete_when="op = 'D'", marker_cols=("op",),
    )
    t0 = time.time()
    sync_lsh_index(spark, corpus, idx)
    wave_s = time.time() - t0
    man_after = versioned.read_manifest(idx)
    changed = {
        p
        for p in set(man_before["parts"]) | set(man_after["parts"])
        if man_after["parts"].get(p) != man_before["parts"].get(p)
    }
    # 3 docs x 8 bands, old + new keys
    assert 0 < len(changed) <= 48, len(changed)
    # the incremental fold must not cost like the seed build
    assert wave_s < seed_s, (wave_s, seed_s)

    probe = read_partitioned_snapshot(spark, corpus).filter(
        F.col("doc_id").isin(7, 5)
    ).select("doc_id", "text")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in neardup_probe_maintained(spark, idx, probe).collect()
    }
    # from-scratch expectation: probe band keys joined against the
    # whole corpus's one-shot band computation (probe-side bounded)
    corpus_bands = _band_rows(
        read_partitioned_snapshot(spark, corpus).select("doc_id", "text"),
        "doc_id", "text", 3, 16, 8, 2,
    )
    probe_bands = _band_rows(probe, "doc_id", "text", 3, 16, 8, 2)
    want = {
        (min(a, b), max(a, b))
        for a, b in corpus_bands.join(
            probe_bands.select(
                "bucket", F.col("doc_id").alias("__p")
            ),
            "bucket",
        ).filter(F.col("doc_id") != F.col("__p"))
        .select("doc_id", "__p").collect()
    }
    assert got == want
    # doc 7 was re-texted away from its %1000 family; doc 5 still has
    # its ~99 family members
    assert len(got) >= 90


def test_lsh_index_probe_bounded_at_1m_docs(spark, tmp_path):
    """r10 (VERDICT #5): the maintained MinHash-LSH index at 1M docs /
    8M band keys — sketches are ~17 ints per doc, so the index itself
    is trivial at this scale; what must hold is LOCALITY: (a) a 3-doc
    wave rewrites only those docs' band-key hash partitions, far
    cheaper than the seed build; (b) a 2-doc probe's index-side READ —
    witnessed by the probe_observation row count, no extra scan —
    touches O(probe buckets x bucket occupancy) stored rows, five
    orders of magnitude under the 8M-row index; (c) the probe's pairs
    equal a from-scratch band computation."""
    from pyspark.sql import Observation

    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.colindex import (
        sync_column_index,
    )
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )
    from customer_segmentation_pyspark_spark.streaming.neardup import (
        _band_rows,
        neardup_probe_maintained,
        sync_lsh_index,
    )

    n = 1_000_000
    # 5-token texts over a 100k-word rolling vocab: docs with the same
    # id % 100_000 share all shingles (dup families of ~10)
    text = F.concat_ws(
        " ",
        *[
            F.concat(F.lit("w"), ((F.col("id") + i) % 100_000))
            for i in range(5)
        ],
    )
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.lit(0).cast("long").alias("seq"),
        F.lit("U").alias("op"),
    )
    corpus = str(tmp_path / "c")
    idx = str(tmp_path / "i")
    merge_into_partitioned_snapshot(
        spark, corpus, base, key="doc_id", seq="seq", num_partitions=32,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    t0 = time.time()
    sync_lsh_index(spark, corpus, idx, num_partitions=256)
    seed_s = time.time() - t0
    sync_column_index(spark, idx, "bucket", num_partitions=64)
    man_before = versioned.read_manifest(idx)

    wave = spark.createDataFrame(
        [(7, "totally new words appearing here", 1, "U"),
         (100_007, "totally new words appearing here", 1, "U"),
         (200_007, None, 1, "D")],
        "doc_id long, text string, seq long, op string",
    )
    merge_into_partitioned_snapshot(
        spark, corpus, wave, key="doc_id", seq="seq",
        delete_when="op = 'D'", marker_cols=("op",),
    )
    t0 = time.time()
    sync_lsh_index(spark, corpus, idx)
    wave_s = time.time() - t0
    man_after = versioned.read_manifest(idx)
    changed = {
        p
        for p in set(man_before["parts"]) | set(man_after["parts"])
        if man_after["parts"].get(p) != man_before["parts"].get(p)
    }
    # 3 docs x 8 bands, old + new keys
    assert 0 < len(changed) <= 48, len(changed)
    # the incremental fold must not cost like the 1M-doc seed build
    assert wave_s < seed_s, (wave_s, seed_s)

    probe = read_partitioned_snapshot(spark, corpus).filter(
        F.col("doc_id").isin(7, 5)
    ).select("doc_id", "text")
    obs = Observation("probe-1m")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in neardup_probe_maintained(
            spark, idx, probe, probe_observation=obs
        ).collect()
    }
    idx_rows = obs.get["probe_idx_rows"]
    # O(probe): 2 docs x <=16 distinct buckets, family occupancy ~10,
    # plus hash accidents — emphatically not the 8M stored band rows
    assert idx_rows <= 2_000, idx_rows
    # correctness of the bounded read: pairs == from-scratch bands
    corpus_bands = _band_rows(
        read_partitioned_snapshot(spark, corpus).select("doc_id", "text"),
        "doc_id", "text", 3, 16, 8, 2,
    )
    probe_bands = _band_rows(probe, "doc_id", "text", 3, 16, 8, 2)
    want = {
        (min(a, b), max(a, b))
        for a, b in corpus_bands.join(
            probe_bands.select(
                "bucket", F.col("doc_id").alias("__p")
            ),
            "bucket",
        ).filter(F.col("doc_id") != F.col("__p"))
        .select("doc_id", "__p").collect()
    }
    assert got == want
    # doc 7 was re-texted away from its family; doc 5 keeps ~9 members
    assert len(got) >= 8


def test_bm25_stack_wave_locality_at_scale(spark, tmp_path):
    """r10 (VERDICT #3): the composed BM25 stack sync at 100k docs /
    500k postings — a 3-doc wave must (a) rewrite only the postings
    hash partitions of the terms those docs touched (the deleted and
    replaced texts' ~15 distinct terms, not the 1000-term vocab),
    (b) fold far cheaper than the seed build, and (c) leave the
    maintained query path — stale term index included — equal to the
    batch BM25 over the final corpus snapshot."""
    from customer_segmentation_pyspark_spark.operators import textops
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.colindex import (
        sync_column_index,
    )
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )
    from customer_segmentation_pyspark_spark.streaming.retrieval import (
        bm25_query_maintained,
        sync_bm25_stack,
    )

    n = 100_000
    # 5-token texts over a 1000-word rolling vocab: each term appears
    # in ~500 docs (5 alignments x ~100 docs per id%1000 family)
    text = F.concat_ws(
        " ",
        *[F.concat(F.lit("w"), ((F.col("id") + i) % 1000)) for i in range(5)],
    )
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("fr").alias("lang"),
        F.lit(0).cast("long").alias("seq"),
        F.lit("U").alias("op"),
    )
    corpus = str(tmp_path / "c")
    post = str(tmp_path / "p")
    dfv = str(tmp_path / "df")
    stats = str(tmp_path / "s")
    merge_into_partitioned_snapshot(
        spark, corpus, base, key="doc_id", seq="seq", num_partitions=32,
        delete_when="op = 'D'", marker_cols=("op",),
    )
    t0 = time.time()
    sync_bm25_stack(spark, corpus, post, dfv, stats, num_partitions=128)
    seed_s = time.time() - t0
    # term column index synced once; the waves below leave it stale,
    # exercising the stale-exact escape hatch at scale
    sync_column_index(spark, post, "term", num_partitions=16)
    man_before = versioned.read_manifest(post)

    wave = spark.createDataFrame(
        [(7, "quite fresh words arriving now", "en", 1, "U"),
         (1007, "quite fresh words arriving now", "fr", 1, "U"),
         (2007, None, "en", 1, "D")],
        "doc_id long, text string, lang string, seq long, op string",
    )
    merge_into_partitioned_snapshot(
        spark, corpus, wave, key="doc_id", seq="seq",
        delete_when="op = 'D'", marker_cols=("op",),
    )
    t0 = time.time()
    sync_bm25_stack(spark, corpus, post, dfv, stats, num_partitions=128)
    wave_s = time.time() - t0
    man_after = versioned.read_manifest(post)
    changed = {
        p
        for p in set(man_before["parts"]) | set(man_after["parts"])
        if man_after["parts"].get(p) != man_before["parts"].get(p)
    }
    # the wave touches <= 3 docs x 5 old terms + 5 new terms ~ 20
    # distinct terms -> at most that many of the 128 term-hash
    # partitions; the seed filled all 128
    assert 0 < len(changed) <= 24, len(changed)
    assert len(man_before["parts"]) > 100, len(man_before["parts"])
    # the incremental fold must not cost like the seed build
    assert wave_s < seed_s, (wave_s, seed_s)

    # maintained query == batch BM25 over the final snapshot, mixing a
    # vocab term (df ~500), a wave-new term (stale index), and a
    # deleted doc's term
    terms = ["w500", "fresh"]
    got = sorted(
        (r["doc_id"], r["bm25"])
        for r in bm25_query_maintained(
            spark, post, dfv, stats, terms, k=10
        ).collect()
    )
    snap = read_partitioned_snapshot(spark, corpus).select("doc_id", "text")
    want = sorted(
        (r["doc_id"], r["bm25"])
        for r in textops.bm25_topk(snap, terms, k=10).collect()
    )
    assert got == want
    assert len(got) == 10


def test_nonunique_merge_write_files_bounded_at_scale(spark, tmp_path):
    """r11 witness (VERDICT #5): a NON-unique merge batch at real input
    parallelism must not explode into tasks x dirs staged files. The
    dir-clustered dedup window (merge._latest_per_key_clustered) keys
    the window exchange by __part, so the staging write gets exactly
    one task — and one file — per touched dir at any input size, with
    no extra exchange. 200k rows x 32 input partitions x 8 dirs; before
    the change the staged write's task count followed the window's
    key-hash partitions (up to shuffle.partitions tasks x 8 dirs
    files)."""
    import glob
    import os
    import time

    from pyspark.sql import functions as F

    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )

    n = 200_000
    batch = (
        spark.range(n)
        .repartition(32)
        .select(
            F.col("id").alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
            (F.col("id") % 3).alias("seq"),
        )
    )
    t = str(tmp_path / "t")
    # keep AQE from collapsing the window exchange to one task — at
    # real scale the delta is many 100-MB partitions; locally we lower
    # the advisory size instead of inflating the data
    old = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
    try:
        t0 = time.perf_counter()
        merge_into_partitioned_snapshot(
            spark, t, batch, key="k", seq="seq", num_partitions=8
        )
        elapsed = time.perf_counter() - t0
    finally:
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", old
        )
    man = versioned.read_manifest(t)
    assert len(man["parts"]) == 8
    for pid, d in man["parts"].items():
        files = [
            f
            for f in os.listdir(os.path.join(t, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (pid, len(files))
    assert read_partitioned_snapshot(spark, t).count() == n
    assert not glob.glob(os.path.join(t, ".staging-*"))
    print(f"bounded non-unique seed merge: {elapsed:.2f}s")
