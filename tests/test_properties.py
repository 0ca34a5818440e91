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
