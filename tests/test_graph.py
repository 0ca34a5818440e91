"""PageRank self-oracles: NumPy power-iteration twin on the collected
edge list, probability-mass invariant, and a hand-checkable tiny graph."""

from __future__ import annotations

import numpy as np
import pytest

from customer_segmentation_pyspark_spark.operators.graph import (
    copurchase_edges,
    pagerank,
)
from customer_segmentation_pyspark_spark.queries import REGISTRY
from customer_segmentation_pyspark_spark.sources import load_table
from tests.conftest import SF_SMOKE


def _numpy_pagerank(edge_list, alpha, n_iter):
    nodes = sorted({s for s, _ in edge_list})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for s, _ in edge_list:
        out_deg[idx[s]] += 1
    ranks = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        sums = np.zeros(n)
        for s, d in edge_list:
            if d in idx:
                sums[idx[d]] += ranks[idx[s]] / out_deg[idx[s]]
        ranks = (1.0 - alpha) / n + alpha * sums
    return {v: ranks[i] for v, i in idx.items()}


def test_pagerank_matches_numpy_twin(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    edges = copurchase_edges(li)
    edge_list = [(r["src"], r["dst"]) for r in edges.collect()]
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges, alpha=0.85, n_iter=6).collect()
    }
    want = _numpy_pagerank(edge_list, 0.85, 6)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-8, v


def test_pagerank_mass_conserved(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    ranks = pagerank(copurchase_edges(li), alpha=0.85, n_iter=8)
    total = sum(r["rank"] for r in ranks.collect())
    assert abs(total - 1.0) < 1e-6


def test_pagerank_star_graph_center_dominates(spark):
    """Undirected star: the hub must outrank every leaf, and leaves are
    symmetric (equal ranks)."""
    edges = []
    for leaf in range(1, 6):
        edges.append((0, leaf))
        edges.append((leaf, 0))
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank"] for r in pagerank(df, n_iter=20).collect()
    }
    hub = got[0]
    leaves = [got[i] for i in range(1, 6)]
    assert all(hub > leaf for leaf in leaves)
    assert max(leaves) - min(leaves) < 1e-12


def test_part_pagerank_query_shape(spark):
    df = REGISTRY["part_pagerank"].fn(spark, SF_SMOKE)
    rows = df.collect()
    assert 0 < len(rows) <= 20
    assert [f.name for f in df.schema.fields] == ["part_key", "rank"]
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def test_pagerank_empty_graph_returns_empty(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    out = pagerank(empty, n_iter=3)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["node", "rank"]


def test_triangle_counts_known_graphs(spark):
    from customer_segmentation_pyspark_spark.operators.graph import (
        triangle_counts,
    )

    # K4: every one of the 4 triangles touches 3 nodes -> each node in 3
    k4 = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)], ["pa", "pb"]
    )
    got = {r["node"]: r["n_tri"] for r in triangle_counts(k4).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}

    # 4-cycle: no triangles at all
    square = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], ["pa", "pb"]
    )
    assert triangle_counts(square).collect() == []

    # star + one chord: exactly one triangle (hub, 2, 3)
    star = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5), (2, 3)], ["pa", "pb"]
    )
    got = {r["node"]: r["n_tri"] for r in triangle_counts(star).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_k_core_planted_clique_survives_chain_peels(spark):
    """A 5-clique is its own 3-core (every member keeps degree 4); a
    long chain has max degree 2 and must peel away entirely."""
    from customer_segmentation_pyspark_spark.operators.graph import k_core

    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    chain = [(100 + i, 101 + i) for i in range(30)]
    e = spark.createDataFrame(clique + chain, ["pa", "pb"])
    out = {r["node"]: r["degree_in_core"] for r in k_core(e, k=3).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    assert all(d == 4 for d in out.values())


def test_k_core_membership_invariant(spark):
    """Every node reported in the 3-core has in-core degree >= 3 (the
    defining property), on the real co-purchase graph."""
    from customer_segmentation_pyspark_spark.operators.graph import (
        copurchase_pairs,
        k_core,
    )
    from customer_segmentation_pyspark_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    li = load_table(spark, SF_SMOKE, "lineitem")
    out = k_core(copurchase_pairs(li), k=3)
    assert out.filter("degree_in_core < 3").count() == 0
    assert out.count() > 0  # dense co-purchase graph has a 3-core


def test_bfs_hops_chain_and_unreachable(spark):
    """BFS on a directed chain: exact hop counts, the max_hops cap
    truncates, and the disconnected component never appears."""
    from customer_segmentation_pyspark_spark.operators.graph import (
        bfs_hops,
    )

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (9, 10)], "src bigint, dst bigint"
    )
    out = sorted(tuple(r) for r in bfs_hops(e, 1, max_hops=2).collect())
    assert out == [(1, 0), (2, 1), (3, 2)]


def test_bfs_hops_cycle_terminates_with_min_distance(spark):
    """A cycle must not loop forever and each node keeps its MIN hop
    distance (4 reachable two ways: 1->4 direct at h=1 wins over the
    1->2->3->4 path)."""
    from customer_segmentation_pyspark_spark.operators.graph import (
        bfs_hops,
    )

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 4)],
        "src bigint, dst bigint",
    )
    out = dict(
        (r["node"], r["hops"])
        for r in bfs_hops(e, 1, max_hops=10).collect()
    )
    assert out == {1: 0, 2: 1, 4: 1, 3: 2}


def test_label_propagation_bridge_keeps_communities_separate(spark):
    """Two triangles joined by ONE bridge edge: LPA must keep them as
    two communities (where connected components would merge them), and
    each triangle must be internally uniform."""
    import itertools

    from customer_segmentation_pyspark_spark.operators.graph import (
        label_propagation,
    )

    tri1 = list(itertools.permutations([1, 2, 3], 2))
    tri2 = list(itertools.permutations([10, 11, 12], 2))
    bridge = [(3, 10), (10, 3)]
    e = spark.createDataFrame(
        tri1 + tri2 + bridge, "src bigint, dst bigint"
    )
    out = dict(
        (r["node"], r["community"])
        for r in label_propagation(e, 4).collect()
    )
    assert out[1] == out[2] == out[3]
    assert out[10] == out[11] == out[12]
    assert out[1] != out[10]


def test_sssp_bounded_two_hop_beats_direct(spark):
    """Weighted relaxation: the 2-hop path 1->2->3 (0.1+0.1) must beat
    the direct 1->3 edge (0.9), the hop bound must truncate (n_rounds=1
    sees only the direct edge), and unreachable nodes stay absent."""
    from customer_segmentation_pyspark_spark.operators.graph import (
        sssp_bounded,
    )

    e = spark.createDataFrame(
        [(1, 2, 0.1), (2, 3, 0.1), (1, 3, 0.9), (8, 9, 1.0)],
        "src bigint, dst bigint, w double",
    )
    full = {
        r["node"]: round(r["dist"], 6)
        for r in sssp_bounded(e, 1, n_rounds=3).collect()
    }
    assert full == {1: 0.0, 2: 0.1, 3: 0.2}
    one = {
        r["node"]: round(r["dist"], 6)
        for r in sssp_bounded(e, 1, n_rounds=1).collect()
    }
    assert one == {1: 0.0, 2: 0.1, 3: 0.9}


def test_personalized_pagerank_mass_concentrates_on_seeds(spark):
    """PPR on two 3-cliques joined by one bridge, seeded on clique A:
    every clique-A node must outrank every clique-B node, and total
    rank mass stays <= 1 (teleport returns mass only to seeds)."""
    import itertools

    from customer_segmentation_pyspark_spark.operators.graph import (
        personalized_pagerank,
    )

    tri1 = list(itertools.permutations([1, 2, 3], 2))
    tri2 = list(itertools.permutations([10, 11, 12], 2))
    bridge = [(3, 10), (10, 3)]
    e = spark.createDataFrame(
        tri1 + tri2 + bridge, "src bigint, dst bigint"
    )
    seeds = spark.createDataFrame([(1,), (2,), (3,)], "node bigint")
    out = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(e, seeds, n_iter=12).collect()
    }
    assert min(out[i] for i in (1, 2, 3)) > max(out[i] for i in (10, 11, 12))
    assert sum(out.values()) <= 1.0 + 1e-9


def test_hits_separates_hub_and_authority_roles(spark):
    """Directed star graphs: one hub pointing at many authorities and
    one authority pointed at by many hubs. HITS must give the broad
    hub the top hub score and the popular sink the top authority score
    — the role separation PageRank cannot express."""
    from customer_segmentation_pyspark_spark.operators.graph import (
        hits,
    )

    # hub 1 -> {10,11,12}; {20,21,22} -> 30; plus 1 -> 30
    e = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (20, 30), (21, 30), (22, 30), (1, 30)],
        "src bigint, dst bigint",
    )
    hubs, auths = hits(e, n_iter=8)
    h = {r["node"]: r["score"] for r in hubs.collect()}
    a = {r["node"]: r["score"] for r in auths.collect()}
    assert max(h, key=h.get) == 1
    assert max(a, key=a.get) == 30
    assert abs(sum(h.values()) - 1.0) < 1e-9
    assert abs(sum(a.values()) - 1.0) < 1e-9


def test_big_graph_fallback_paths_match_broadcast(spark):
    """The 100 TB story depends on the non-broadcast fallbacks
    (broadcast_max_nodes exceeded -> shuffle joins on the partitioned
    edge list) producing the same answers as the broadcast path. Force
    the fallback with broadcast_max_nodes=1 on a small graph and compare
    — exact for integer/min-based algorithms (BFS, LPA, SSSP), round(7)
    for the spectral ones (summation order may differ across join
    strategies)."""
    from customer_segmentation_pyspark_spark.operators.graph import (
        bfs_hops,
        hits,
        label_propagation,
        pagerank,
        personalized_pagerank,
        sssp_bounded,
    )

    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 40) for i in range(200)]
        + [(i, (i * 11 + 1) % 40) for i in range(100)],
        "src long, dst long",
    )
    from pyspark.sql import functions as F

    wedges = edges.withColumn(
        "w", (F.col("src") % 5 + 1).cast("double")
    )
    seeds = spark.createDataFrame([(3,), (7,)], "node long")

    def r7(df, col):
        return {
            r["node"]: round(r[col], 7) for r in df.collect()
        }

    for kw_fast, kw_slow in [
        (dict(broadcast_max_nodes=10**7), dict(broadcast_max_nodes=1))
    ]:
        assert r7(pagerank(edges, n_iter=4, **kw_fast), "rank") == r7(
            pagerank(edges, n_iter=4, **kw_slow), "rank"
        )
        assert r7(
            personalized_pagerank(edges, seeds, n_iter=4, **kw_fast),
            "rank",
        ) == r7(
            personalized_pagerank(edges, seeds, n_iter=4, **kw_slow),
            "rank",
        )
        hf, af = hits(edges, n_iter=3, **kw_fast)
        hs, as_ = hits(edges, n_iter=3, **kw_slow)
        assert r7(hf, "score") == r7(hs, "score")
        assert r7(af, "score") == r7(as_, "score")
        assert {
            (r["node"], r["hops"])
            for r in bfs_hops(edges, 0, max_hops=5, **kw_fast).collect()
        } == {
            (r["node"], r["hops"])
            for r in bfs_hops(edges, 0, max_hops=5, **kw_slow).collect()
        }
        assert {
            (r["node"], r["community"])
            for r in label_propagation(edges, n_rounds=3, **kw_fast).collect()
        } == {
            (r["node"], r["community"])
            for r in label_propagation(edges, n_rounds=3, **kw_slow).collect()
        }
        assert {
            (r["node"], r["dist"])
            for r in sssp_bounded(wedges, 0, n_rounds=4, **kw_fast).collect()
        } == {
            (r["node"], r["dist"])
            for r in sssp_bounded(wedges, 0, n_rounds=4, **kw_slow).collect()
        }


def test_copurchase_basket_cap_bounds_hot_basket(spark):
    """r03: the basket cap is enforced, not assumed — a pathological
    50k-line order is dropped BEFORE collect_set/pair explosion (window
    count shares the one shuffle), surfaced via free Observation
    metrics, and normal baskets are unaffected."""
    from pyspark.sql import Observation

    from customer_segmentation_pyspark_spark.operators.graph import (
        copurchase_pair_weights,
    )

    rows = [(999_999, i) for i in range(50_000)]  # one hot basket
    for o in range(20):
        for p in (o, o + 1, o + 2):  # 20 normal 3-part baskets
            rows.append((o, p))
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")

    obs = Observation("basket_cap")
    pairs = {
        (r["pa"], r["pb"], r["w"])
        for r in copurchase_pair_weights(li, observation=obs).collect()
    }
    m = obs.get
    assert m["oversized_baskets"] == 1
    assert m["max_basket_lines_seen"] == 50_000
    # only normal-basket pairs survive; every part id < 22
    assert pairs and all(pb < 25 for _, pb, _ in pairs)
    expected = set()
    for o in range(20):
        for a, b in [(o, o + 1), (o, o + 2), (o + 1, o + 2)]:
            expected.add((a, b))
    assert {(a, b) for a, b, _ in pairs} == expected


def test_copurchase_oversized_basket_without_observer_raises(spark):
    """r04 (ADVICE): with no Observation attached there is nobody to
    see a dropped basket, so the operator must refuse loudly instead of
    silently diverging from its SQL oracles — a conditional raise_error
    fires at execution; conforming data is unaffected."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from customer_segmentation_pyspark_spark.operators.graph import (
        copurchase_pair_weights,
    )

    rows = [(1, p) for p in range(10)] + [(2, 1), (2, 2), (2, 3)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    with pytest.raises(
        (SparkRuntimeException, Py4JJavaError), match="max_basket_size"
    ):
        copurchase_pair_weights(li, max_basket_size=4).collect()
    # conforming data still works observer-less: C(10,2)=45 distinct
    # pairs (basket 2's three pairs fold into their weights)
    ok = {(r["pa"], r["pb"]): r["w"] for r in
          copurchase_pair_weights(li, max_basket_size=64).collect()}
    assert len(ok) == 45 and ok[(1, 2)] == 2 and ok[(0, 1)] == 1
