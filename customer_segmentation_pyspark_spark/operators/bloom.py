"""Expression-level Bloom filter for join pruning.

The 100 TB motivation: a fact-to-dim join where the dim's matching key
set is far smaller than the fact table, but still too big to broadcast
as a hash relation.  A Bloom filter of the dim keys is a few hundred KB
regardless of key width, broadcasts to every executor for free, and
filters the fact table BEFORE the join shuffle — the dominant cost at
scale is moving fact rows, so discarding non-matching rows map-side cuts
shuffle bytes by the join's selectivity (false-positive rate adds a few
percent back).  Spark's own runtime row-level filtering does this
opportunistically for some plans; this operator makes the pattern
explicit, tunable, and usable from any query.

Correctness is preserved by construction: the Bloom pass can only emit
false POSITIVES, never false negatives, and the exact join that follows
removes them — so `bloom_prune + join ≡ join`, which is exactly what the
DuckDB oracle checks (the oracle is the plain join; no need to mirror
the filter).

Everything is Catalyst expressions — k xxhash64 probes into a one-row
map<word_index, bit_word> that rides a broadcast nested-loop join; no
Python UDFs, no driver-side bit array, no shuffle added.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_build(df: DataFrame, key_col: str, num_bits: int = 1 << 20,
                k: int = 5) -> DataFrame:
    """Aggregate the distinct values of ``df[key_col]`` into a one-row
    Bloom filter: ``{bloom: map<long, long>}`` mapping 64-bit word index
    to its OR-ed bit word.  Absent words mean "no bit set" (the probe
    side coalesces misses to 0), so the map is naturally sparse — an
    almost-empty filter costs almost nothing to broadcast.

    Sizing: for n keys, num_bits ≈ 10n and k = 5 gives ~1% false
    positives; the map tops out at num_bits/8 bytes ≈ 128 KiB per
    2^20 bits.  One hash aggregation over the (small) build side."""
    probes = F.array(
        *[
            F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(num_bits))
            for i in range(k)
        ]
    )
    pos = df.select(F.explode(probes).alias("p"))
    words = pos.select(
        F.expr("p div 64").alias("w"),
        F.expr("shiftleft(1L, cast(p % 64 AS int))").alias("m"),
    )
    agg = words.groupBy("w").agg(F.bit_or("m").alias("mask"))
    # Densify the sparse (word -> mask) entries into an array indexed by
    # word — ONCE, in this one-row aggregate.  Spark's map element_at is
    # a linear scan over ArrayBasedMapData, so probing a 16k-entry map
    # per fact row would be O(words) per probe; array element_at is O(1).
    n_words = num_bits // 64
    return agg.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "mask"))).alias(
            "bloom_map"
        )
    ).select(
        F.expr(
            f"transform(sequence(0, {n_words - 1}), "
            "i -> coalesce(element_at(bloom_map, cast(i AS bigint)), 0L))"
        ).alias("bloom")
    )


def bloom_prune(probe: DataFrame, key_col: str, bloom_row: DataFrame,
                num_bits: int = 1 << 20, k: int = 5) -> DataFrame:
    """Keep only probe rows whose key MIGHT be in the filter (all k bits
    set).  The one-row filter joins in via broadcast nested-loop (no
    shuffle of the probe side); the membership test is a pure projection
    so it pipelines inside the probe scan's codegen stage.  num_bits/k
    must match the values used in :func:`bloom_build`."""
    tagged = probe.crossJoin(F.broadcast(bloom_row))
    hits = []
    for i in range(k):
        p = f"pmod(xxhash64({key_col}, {i}), {num_bits}L)"
        m = f"shiftleft(1L, cast({p} % 64 AS int))"
        hits.append(
            f"(element_at(bloom, cast({p} div 64 AS int) + 1) & {m}) = {m}"
        )
    return tagged.where(F.expr(" AND ".join(hits))).drop("bloom")
