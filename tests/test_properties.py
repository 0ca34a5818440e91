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
