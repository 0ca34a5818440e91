"""Sequence-packing invariants (operators/packing.py) on hand-built
shards where the greedy assignment is known by inspection — the sf0.01
DuckDB recursive-CTE hash match lives in test_oracle_parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.operators.packing import (
    sequence_pack,
)


def _pack(spark, rows, capacity):
    df = spark.createDataFrame(rows, ["shard", "doc_id", "n_tok"])
    out = sequence_pack(
        df, shard_col="shard", order_col="doc_id", tok_col="n_tok",
        capacity=capacity,
    )
    return {r["doc_id"]: (r["seq_id"], r["tok_offset"]) for r in out.collect()}


def test_greedy_assignment_known_answer(spark):
    rows = [
        ("en", 1, 300),  # seq 1 @ 0
        ("en", 2, 200),  # seq 1 @ 300 (fills to 500 <= 512)
        ("en", 3, 100),  # overflow -> seq 2 @ 0
        ("en", 4, 400),  # seq 2 @ 100 (500)
        ("en", 5, 13),   # overflow (513) -> seq 3 @ 0
    ]
    got = _pack(spark, rows, capacity=512)
    assert got == {1: (1, 0), 2: (1, 300), 3: (2, 0), 4: (2, 100),
                   5: (3, 0)}


def test_oversized_doc_packs_alone(spark):
    rows = [("en", 1, 50), ("en", 2, 9000), ("en", 3, 50)]
    got = _pack(spark, rows, capacity=512)
    # the giant doc gets its own sequence; the next doc starts fresh
    assert got == {1: (1, 0), 2: (2, 0), 3: (3, 0)}


def test_shards_pack_independently(spark):
    rows = [("en", 1, 500), ("fr", 2, 500), ("en", 3, 500), ("fr", 4, 10)]
    got = _pack(spark, rows, capacity=512)
    assert got == {1: (1, 0), 3: (2, 0), 2: (1, 0), 4: (1, 500)}


def test_budget_and_greedy_invariants_on_fixture(spark):
    """On real documents: no multi-doc sequence exceeds the budget, every
    new sequence was forced (its first doc did not fit in the previous
    one), and offsets are the running fill."""
    from customer_segmentation_pyspark_spark.operators import textops
    from tests.conftest import SF_SMOKE

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "lang",
        textops.token_count(F.col("text")).cast("long").alias("n_tok"),
    )
    out = sequence_pack(
        d, shard_col="lang", order_col="doc_id", tok_col="n_tok",
        capacity=512,
    ).collect()
    assert len(out) == d.count()
    by_shard: dict[str, list] = {}
    for r in out:
        by_shard.setdefault(r["lang"], []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["doc_id"])
        fill, seq = 0, 1
        for r in shard_rows:
            if r["seq_id"] != seq:  # new sequence must be forced
                assert r["seq_id"] == seq + 1
                assert fill > 0 and fill + r["n_tok"] > 512
                seq, fill = r["seq_id"], 0
            assert r["tok_offset"] == fill
            fill += r["n_tok"]
            # multi-doc sequences never exceed the budget
            if r["tok_offset"] > 0:
                assert fill <= 512
