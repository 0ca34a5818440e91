"""Property-based checks (hypothesis): the Catalyst expression
implementations of argmin/distance/bucketing agree with plain Python on
arbitrary inputs, including ties, negatives, and degenerate values."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.functions.arrays import (
    array_argmin,
    array_lit,
    euclidean,
    sq_dist,
)

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(finite, finite), min_size=1, max_size=8))
def test_argmin_matches_python(spark, pts):
    """array_argmin == Python min-index with first-min tie-break."""
    df = spark.range(1)
    dists = [
        sq_dist(array_lit([0.0, 0.0]), array_lit(list(p))) for p in pts
    ]
    got = df.select(
        array_argmin(F.array(*dists)).alias("i")
    ).collect()[0]["i"]
    py = [p[0] ** 2 + p[1] ** 2 for p in pts]
    expected = py.index(min(py))
    assert got == expected


@settings(max_examples=12, deadline=None)
@given(
    st.lists(finite, min_size=1, max_size=8),
    st.lists(finite, min_size=1, max_size=8),
)
def test_euclidean_matches_python(spark, a, b):
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    got = (
        spark.range(1)
        .select(euclidean(array_lit(a), array_lit(b)).alias("d"))
        .collect()[0]["d"]
    )
    expected = math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))
    assert math.isclose(got, expected, rel_tol=1e-9, abs_tol=1e-9)


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=12, deadline=None)
def test_connected_components_matches_union_find(spark, edges):
    """Min-label propagation == a driver-side union-find reference on
    arbitrary small graphs (self-loops and duplicate edges included)."""
    from customer_segmentation_pyspark_spark.operators.dedup import (
        connected_components,
    )

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for node in parent:
        root = find(node)
        expected.setdefault(root, set()).add(node)
    want = {n: min(m) for m in expected.values() for n in m}

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: r["component"] for r in connected_components(df).collect()
    }
    assert got == want


def test_morton_key_is_bijective_and_decodable(spark):
    """Z-order key property: _morton10 is a bijection on 10-bit pairs —
    decoding the interleaved bits recovers (x, y) exactly (checked on a
    random sample of the domain plus the corners)."""
    import random

    from pyspark.sql import functions as F

    from customer_segmentation_pyspark_spark.queries import _morton10

    rng = random.Random(7)
    pts = [(rng.randrange(1024), rng.randrange(1024)) for _ in range(300)]
    pts += [(0, 0), (1023, 1023), (0, 1023), (1023, 0)]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.select(
        "x", "y", _morton10(F.col("x"), F.col("y")).alias("z")
    ).collect()

    def decode(z):
        x = y = 0
        for i in range(10):
            x |= ((z >> (2 * i)) & 1) << i
            y |= ((z >> (2 * i + 1)) & 1) << i
        return x, y

    seen = set()
    for r in rows:
        assert decode(r["z"]) == (r["x"], r["y"])
        seen.add(r["z"])
    assert len(seen) == len(set(pts))


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=1, max_size=6),
        min_size=1,
        max_size=8,
    )
)
def test_segment_dedup_matches_python(spark, docs):
    """segment_dedup (2-word segments) == a plain-Python reference on
    arbitrary tiny corpora: per-doc segment count, dup-segment count
    (distinct-doc frequency >= 2), and retained text."""
    from customer_segmentation_pyspark_spark.operators.dedup import (
        segment_dedup,
    )

    texts = [" ".join(w for w in doc) for doc in docs]
    sdf = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_segs"], r["n_dup_segs"], r["clean_text"])
        for r in segment_dedup(sdf, seg_words=2, min_docs=2).collect()
    }

    def segs(t):
        ws = t.split(" ")
        return [
            " ".join(ws[i : i + 2]) for i in range(0, len(ws), 2)
        ]

    seg_docs = {}
    for i, t in enumerate(texts):
        for s in set(segs(t)):
            seg_docs.setdefault(s, set()).add(i)
    for i, t in enumerate(texts):
        ss = segs(t)
        dup = [s for s in ss if len(seg_docs[s]) >= 2]
        kept = [s for s in ss if len(seg_docs[s]) < 2]
        assert got[i] == (len(ss), len(dup), " ".join(kept)), (
            texts,
            got[i],
        )


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(1, 4), st.integers(0, 99)),
        min_size=1,
        max_size=20,
    )
)
def test_cdc_latest_version_wins_matches_python(spark, log):
    """Latest-version-wins over an arbitrary (key, version, payload) log
    (ties broken arbitrarily are avoided: hypothesis may emit duplicate
    (k, v) rows, so dedupe to the max payload per (k, v) first)."""
    from pyspark.sql import Window

    dedup = {}
    for k, v, p in log:
        dedup[(k, v)] = max(p, dedup.get((k, v), -1))
    rows = [(k, v, p) for (k, v), p in dedup.items()]
    sdf = spark.createDataFrame(rows, ["k", "version", "payload"])
    w = Window.partitionBy("k").orderBy(F.desc("version"))
    got = {
        r["k"]: (r["version"], r["payload"])
        for r in sdf.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .collect()
    }
    expected = {}
    for k, v, p in rows:
        if k not in expected or v > expected[k][0]:
            expected[k] = (v, p)
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=60),
        min_size=1,
        max_size=8,
    )
)
def test_span_profile_matches_python(spark, texts):
    """duplicated_span_profile == a plain-Python reference on arbitrary
    corpora over a tiny alphabet (maximizing span collisions): same
    span positions, same global multiplicity rule, same ratios."""
    import hashlib
    from collections import Counter

    from customer_segmentation_pyspark_spark.operators import dedup

    L, S = 6, 2
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
        for r in dedup.duplicated_span_profile(
            df, span_len=L, stride=S
        ).collect()
    }

    spans = {}  # doc -> list of hashes
    counts = Counter()
    for i, t in rows:
        hs = []
        p = 0
        while p + L <= len(t):
            h = hashlib.md5(t[p : p + L].encode()).hexdigest()[:16]
            hs.append(h)
            counts[h] += 1
            p += S
        spans[i] = hs
    for i, _t in rows:
        n = len(spans[i])
        nd = sum(1 for h in spans[i] if counts[h] >= 2)
        assert got[i] == (n, nd), f"doc {i}: {got[i]} != {(n, nd)}"


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(1, 50)),
        min_size=1,
        max_size=12,
    )
)
def test_preference_pairs_matches_python(spark, rows):
    """preference_pairs == Python max/min with the documented
    tie-breaks (max score -> lowest id wins chosen; min score ->
    lowest id wins rejected) on arbitrary (group, score) data."""
    from customer_segmentation_pyspark_spark.operators import textops

    data = [(f"g{g % 3}", i, s) for i, (g, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "source string, doc_id long, s long")
    out = {
        r["source"]: (
            r["chosen_id"], r["chosen_score"],
            r["rejected_id"], r["rejected_score"],
        )
        for r in textops.preference_pairs(
            df, group_col="source", score=F.col("s")
        ).collect()
    }
    groups = {}
    for g, i, s in data:
        groups.setdefault(g, []).append((i, s))
    for g, members in groups.items():
        chosen = max(members, key=lambda t: (t[1], -t[0]))
        rejected = min(members, key=lambda t: (t[1], t[0]))
        assert out[g] == (chosen[0], chosen[1], rejected[0], rejected[1])


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "ab", "ba", "b", "cc c", "x"]),
            min_size=2,
            max_size=8,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_bpe_merge_fold_matches_python(spark, docs):
    """The Catalyst aggregate-fold greedy merger inside bpe_learn agrees
    with the plain-Python reference on arbitrary short corpora,
    including overlap-heavy runs ('aa'*k words) and merged-symbol
    reuse across rounds."""
    from customer_segmentation_pyspark_spark.operators import textops
    from tests.test_llm_ops import _bpe_learn_twin

    texts = [" ".join(ws) for ws in docs]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = [tuple(r) for r in textops.bpe_learn(d, n_merges=4).collect()]
    assert got == _bpe_learn_twin(texts, 4)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["u", "v", "w", "uu", "uv"]),
            min_size=2,
            max_size=10,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_bigram_ppl_matches_python(spark, docs):
    """Interpolated bigram-LM cross-entropy agrees with a plain-Python
    model (same 0.7/0.3 interpolation, corpus-trained counts) to 1e-6
    on arbitrary corpora."""
    import math as m
    from collections import Counter

    texts = [" ".join(ws) for ws in docs]
    # python reference
    toks = {i: t.split() for i, t in enumerate(texts)}
    uni = Counter(w for ws in toks.values() for w in ws)
    total = sum(uni.values())
    big = Counter(
        (a, b) for ws in toks.values() for a, b in zip(ws, ws[1:])
    )
    ctx = Counter()
    for (a, _b), c in big.items():
        ctx[a] += c
    expected = {}
    for i, ws in toks.items():
        ps = [
            0.7 * big[(a, b)] / ctx[a] + 0.3 * uni[b] / total
            for a, b in zip(ws, ws[1:])
        ]
        if ps:
            expected[i] = -sum(m.log(p) for p in ps) / len(ps)
    # spark side: the SHARED operator body q_bigram_ppl also uses
    from customer_segmentation_pyspark_spark.operators import textops

    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["ce"]
        for r in textops.bigram_interpolated_ce(d).collect()
    }
    assert set(got) == set(expected)
    for i in expected:
        assert abs(got[i] - expected[i]) < 1e-6, (i, got[i], expected[i])


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 6),
            st.integers(0, 6),
            st.floats(0.1, 5.0, allow_nan=False),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_sssp_bounded_matches_python_jacobi(spark, raw_edges):
    """sssp_bounded == a plain-Python SYNCHRONOUS (Jacobi) Bellman-Ford
    on arbitrary small weighted digraphs: d_{i+1}(v) = min(d_i(v),
    min over edges u->v of d_i(u)+w) — including self-loops, parallel
    edges, cycles, and the hop-bound truncation."""
    from customer_segmentation_pyspark_spark.operators.graph import (
        sssp_bounded,
    )

    edges = [(a, b, round(w, 3)) for a, b, w in raw_edges]
    n_rounds = 4
    dist = {0: 0.0}
    for _ in range(n_rounds):
        nxt = dict(dist)
        for a, b, w in edges:
            if a in dist:
                cand = dist[a] + w
                if b not in nxt or cand < nxt[b]:
                    nxt[b] = cand
        dist = nxt
    e = spark.createDataFrame(edges, "src bigint, dst bigint, w double")
    got = {
        r["node"]: r["dist"]
        for r in sssp_bounded(e, 0, n_rounds=n_rounds).collect()
    }
    assert set(got) == set(dist)
    for k in dist:
        assert abs(got[k] - dist[k]) < 1e-9, (k, got[k], dist[k])


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=1,
        max_size=20,
    )
)
def test_label_propagation_matches_python_sync(spark, raw_edges):
    """label_propagation == a plain-Python synchronous LPA with the
    same deterministic rule (most frequent in-neighbor label, ties to
    the smallest; keep own label with no in-neighbors) on arbitrary
    small digraphs."""
    from collections import Counter

    from customer_segmentation_pyspark_spark.operators.graph import (
        label_propagation,
    )

    edges = list(raw_edges)
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n_rounds = 3
    lbl = {v: v for v in nodes}
    for _ in range(n_rounds):
        nxt = {}
        for v in nodes:
            votes = Counter(lbl[a] for a, b in edges if b == v)
            if votes:
                best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
                nxt[v] = best[0]
            else:
                nxt[v] = lbl[v]
        lbl = nxt
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r["node"]: r["community"]
        for r in label_propagation(e, n_rounds=n_rounds).collect()
    }
    assert got == lbl


@settings(max_examples=8, deadline=None)
@given(
    st.lists(  # a change log: batches of (key, colset-mask, value)
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=5),   # key
                st.integers(min_value=1, max_value=3),   # which cols: a/b/both
                st.integers(min_value=-99, max_value=99),
            ),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=3,
    )
)
def test_evolving_merge_matches_python_model(spark, tmp_path_factory, log):
    """r04 schema evolution property: an arbitrary sequence of merge
    batches — each carrying column 'a', column 'b', or both (so the
    schema evolves mid-stream and updates omit columns at random) —
    equals a plain Python dict model with keep-absent-column semantics
    (a batch that omits a column never clobbers it)."""
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_snapshot,
    )

    snap = str(tmp_path_factory.mktemp("evmerge") / "snap")
    model: dict[int, dict[str, object]] = {}
    seq = 0
    for batch in log:
        rows, seen = [], set()
        for key, mask, val in batch:
            if key in seen:
                continue  # one row per key per batch (seq uniqueness)
            seen.add(key)
            seq += 1
            a = float(val) if mask in (1, 3) else None
            b = val * 10 if mask in (2, 3) else None
            rows.append((key, a, b, seq))
            m = model.setdefault(key, {"a": None, "b": None})
            if mask in (1, 3):
                m["a"] = float(val)
            if mask in (2, 3):
                m["b"] = val * 10
        df = spark.createDataFrame(
            rows, "k long, a double, b long, seq long"
        )
        # drop the columns this batch doesn't carry AT ALL, so the
        # batch's schema genuinely omits them (evolution path)
        if all(r[1] is None for r in rows):
            df = df.drop("a")
        if all(r[2] is None for r in rows):
            df = df.drop("b")
        merge_into_snapshot(spark, snap, df, key="k", seq="seq")
    got = {
        r["k"]: (r["a"] if "a" in r.__fields__ else None,
                 r["b"] if "b" in r.__fields__ else None)
        for r in spark.read.parquet(snap).collect()
    }
    want = {k: (m["a"], m["b"]) for k, m in model.items()}
    assert got == want
