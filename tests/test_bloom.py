"""Bloom-filter join pruning (operators/bloom.py): no false negatives
ever, useful selectivity at the advertised sizing, and the
prune-then-join ≡ join identity the oracle relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.operators.bloom import (
    bloom_build,
    bloom_prune,
)
from tests.conftest import SF_SMOKE


def test_no_false_negatives(spark):
    """Every key that went into the filter must survive the prune —
    bloom filters may only err toward keeping."""
    keys = spark.range(0, 5000).select(F.col("id").alias("k"))
    filt = bloom_build(keys, "k")
    kept = bloom_prune(keys, "k", filt).count()
    assert kept == 5000


def test_prunes_non_members(spark):
    """Probing 20k keys against a 1k-key filter at the ~10 bits/key
    sizing should discard the vast majority of non-members (~1% FP)."""
    members = spark.range(0, 1000).select(F.col("id").alias("k"))
    probe = spark.range(0, 20000).select(F.col("id").alias("k"))
    filt = bloom_build(members, "k", num_bits=1 << 14)
    kept = bloom_prune(probe, "k", filt, num_bits=1 << 14).count()
    assert kept >= 1000  # all members
    assert kept <= 1000 + 1900  # <=10% of the 19k non-members leak

def test_prune_then_join_equals_join(spark):
    """The correctness identity the DuckDB oracle certifies at sf0.01,
    re-checked structurally at smoke scale: pruning never changes the
    join result."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    dim = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .where(F.col("o_totalprice") > 400000.0)
        .select("o_orderkey")
    )
    filt = bloom_build(dim, "o_orderkey")
    pruned = bloom_prune(li, "l_orderkey", filt)
    plain = li.join(dim, li["l_orderkey"] == dim["o_orderkey"]).count()
    via_bloom = pruned.join(
        dim, pruned["l_orderkey"] == dim["o_orderkey"]
    ).count()
    assert via_bloom == plain


def test_empty_build_side(spark):
    """An empty dim produces an empty (not missing) filter row and the
    prune keeps nothing — mirrors the empty-corpus contract elsewhere."""
    empty = spark.range(0).select(F.col("id").alias("k"))
    filt = bloom_build(empty, "k")
    probe = spark.range(0, 100).select(F.col("id").alias("k"))
    assert bloom_prune(probe, "k", filt).count() == 0
