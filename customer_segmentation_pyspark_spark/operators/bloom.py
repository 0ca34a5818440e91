"""Expression-level Bloom filter for join pruning.

The 100 TB motivation: a fact-to-dim join where the dim's matching key
set is far smaller than the fact table, but still too big to broadcast
as a hash relation.  A Bloom filter of the dim keys is a few hundred KB
regardless of key width, ships to every executor for free, and filters
the fact table BEFORE the join shuffle — the dominant cost at scale is
moving fact rows, so discarding non-matching rows map-side cuts shuffle
bytes by the join's selectivity (false-positive rate adds a few percent
back).  Spark's own runtime row-level filtering does this
opportunistically for some plans; this operator makes the pattern
explicit, tunable, and usable from any query.

Correctness is preserved by construction: the Bloom pass can only emit
false POSITIVES, never false negatives, and the exact join that follows
removes them — so `bloom_prune + join ≡ join`, which is exactly what the
DuckDB oracle checks (the oracle is the plain join; no need to mirror
the filter).

The built filter travels as a PLAN LITERAL, not a joined column: the
build side aggregates to one 16k-word array (128 KiB for 2^20 bits),
which the driver collects and embeds in the probe's filter expression —
the same mechanism Spark uses for scalar subqueries and this engine uses
for the ANN hyperplanes.  A broadcast-join alternative would splice the
whole array into every fact row's UnsafeRow during evaluation; as a
literal it is one shared constant per executor, the membership test is
k xxhash64 probes + O(1) array indexing inside the scan's codegen
stage, and nothing is added to the row.  No Python UDFs, no shuffle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_build(df: DataFrame, key_col: str, num_bits: int = 1 << 20,
                k: int = 5) -> DataFrame:
    """Aggregate the distinct values of ``df[key_col]`` into a one-row
    Bloom filter ``{bloom: array<long>}`` of num_bits/64 OR-ed bit
    words, dense-indexed so the probe side reads words O(1).

    Sizing: for n keys, num_bits ≈ 10n and k = 5 gives ~1% false
    positives; 2^20 bits = 128 KiB.  One hash aggregation over the
    (small) build side; the sparse word->mask entries densify in the
    final one-row projection."""
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
    n_words = num_bits // 64
    # Densify driver-side: the sparse agg is <= min(n_keys*k, n_words)
    # rows (the whole filter is 128 KiB by construction — the build side
    # is small by contract). A previous expression-level densify via
    # element_at(map_literal) was O(n_words * map_size): Catalyst's
    # ArrayBasedMapData does a LINEAR scan per lookup (~20 s for 16k
    # words — measured); this is one tiny collect + an O(n) Python loop.
    dense = [0] * n_words
    for r in agg.collect():
        dense[r["w"]] = r["mask"]
    return df.sparkSession.createDataFrame(
        [(dense,)], "bloom: array<bigint>"
    )


def bloom_prune(probe: DataFrame, key_col: str, bloom_row,
                num_bits: int = 1 << 20, k: int = 5) -> DataFrame:
    """Keep only probe rows whose key MIGHT be in the filter (all k bits
    set).  ``bloom_row`` is the one-row frame from :func:`bloom_build`
    (collected here — one job over the small build side) or an already-
    collected list of bit words.  The words become a single array
    literal in the filter expression, so the test pipelines inside the
    probe scan with zero per-row data added.  num_bits/k must match the
    values used in :func:`bloom_build`."""
    if isinstance(bloom_row, DataFrame):
        words = list(bloom_row.first()["bloom"])
    else:
        words = list(bloom_row)
    # One py4j string transfer + JVM-side parse. F.lit(words) crosses the
    # py4j bridge once PER ELEMENT (~10 s for 16k words — measured); a
    # lambda HOF (transform) would NOT constant-fold and re-parses the
    # string per row; CAST of a foldable split IS foldable, so Catalyst
    # folds this to a plain array<bigint> literal before codegen
    # (verified on the optimized plan).
    csv = ",".join(map(str, words))
    arr = F.expr(f"cast(split('{csv}', ',') AS array<bigint>)")
    hits = []
    for i in range(k):
        p = f"pmod(xxhash64({key_col}, {i}), {num_bits}L)"
        m = F.expr(f"shiftleft(1L, cast({p} % 64 AS int))")
        word = F.element_at(arr, F.expr(f"cast({p} div 64 AS int) + 1"))
        hits.append(word.bitwiseAND(m) == m)
    return probe.where(reduce(lambda a, b: a & b, hits))
