"""Array-column vector math as pure Catalyst expressions.

The reference computes Euclidean distance per point-centroid pair in driver
Python / RDD closures (codeText.txt:61-72, SURVEY.md §2.8 F1-F3). Here every
distance is a JVM-side higher-order-function expression (`zip_with` +
`aggregate`), so the hot path never crosses the Python-worker boundary and
stays inside whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def array_lit(values: Sequence[float]) -> Column:
    """A literal array<double> column from driver-side floats (how broadcast
    centroids enter the plan — constant-folded, shipped once in the plan,
    not re-pickled per task like the reference's closure capture at
    codeText.txt:91).

    Built as ONE SQL string parsed JVM-side: F.array(*map(F.lit, ...))
    costs a py4j round-trip per element, which adds up fast when a plan
    embeds k x dim centroid arrays per iteration (see SCALE.md
    "Plan-literal & lambda-HOF cost model"). repr() of a Python float
    round-trips exactly through Spark's double parser."""
    if not values:
        return F.expr("CAST(array() AS array<double>)")
    return F.expr(
        "array(" + ",".join(f"CAST({float(v)!r} AS DOUBLE)" for v in values) + ")"
    )


def sq_dist(a: Column, b: Column) -> Column:
    """Squared Euclidean distance between two array<numeric> columns (F2)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def euclidean(a: Column, b: Column) -> Column:
    """Euclidean distance (F1, codeText.txt:63-66)."""
    return F.sqrt(sq_dist(a, b))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns; 0.0 for zero-norm
    inputs rather than NaN so downstream top-k stays total-ordered."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def array_argmin(arr: Column) -> Column:
    """0-based index of the minimum element; ties -> lowest index.

    Matches the reference's strict ``<`` scan (codeText.txt:61-72, A5):
    ``array_position(arr, array_min(arr))`` returns the FIRST position of
    the min (1-based), giving the same tie-break.
    """
    return (F.array_position(arr, F.array_min(arr)) - 1).cast("int")
