"""Skew mitigation: salted two-phase aggregation and salted broadcast join.

AQE's skew-join splitting handles most cases automatically
(session.py turns it on); these helpers cover the two patterns AQE does
not: a single hot GROUP BY key that overwhelms one reducer, and a
broadcast join where one probe-side key dominates task runtimes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    Phase 1 groups by (keys + random salt) — the hot key's rows spread over
    ``salts`` reducers; phase 2 merges the partials by the real keys. Only
    decomposable aggregates are supported: pass phase-1 expressions in
    ``aggs`` (e.g. {'cnt': F.count(F.lit(1)), 'total': F.sum('x')}) — the
    merge phase re-aggregates each with SUM, so count/sum compose; avg must
    be expressed as sum+count and divided afterwards.
    """
    salted = df.withColumn("_salt", (F.rand(seed=0) * salts).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(name).alias(name) for name in aggs]
    )


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salts: int = 16,
) -> DataFrame:
    """Equi-join a skewed big side against a small side by replicating the
    small side ``salts`` times and salting the big side's key — every hot
    key's rows land on ``salts`` tasks instead of one. The small side is
    broadcast, so the replication costs memory on executors, not a shuffle.
    """
    big_s = big.withColumn("_salt", (F.rand(seed=0) * salts).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return big_s.join(F.broadcast(small_s), on=[key, "_salt"]).drop("_salt")
