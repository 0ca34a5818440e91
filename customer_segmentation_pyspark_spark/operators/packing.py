"""Sequence packing — the LLM training-prep pass that bins documents
into fixed-token-budget training sequences.

Greedy first-fit-sequential packing: within each shard, documents are
visited in a canonical order (doc_id) and appended to the current
sequence while they fit; a document that would overflow the budget
starts a new sequence.  A document longer than the budget gets a
sequence of its own (downstream truncation is the tokenizer's concern,
not the packer's).  The fold state (current fill) is inherently
sequential — packing is the textbook non-associative recurrence — so
the operator runs as grouped-map ``applyInPandas``: one Arrow batch per
shard, a single pass of integer arithmetic inside it.

Scale shape: the shard column IS the parallelism unit — a real corpus
shards by (lang, hash(doc_id) % n_shards) so every shard holds a
bounded number of documents and packing is embarrassingly parallel
across shards with ONE shuffle (the groupBy).  Determinism is total:
ordering key + greedy rule are pure functions of the input, so the
assignment replays identically across partitionings and engines —
which is what makes the DuckDB recursive-CTE oracle (queries.py)
hash-exact against it.

Reference scope: the reference notebook has no packing stage (it ends
at clustering, codeText.txt:636-783); this operator is part of the
engine's LLM-pipeline extension mandated by the brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def sequence_pack(
    df: DataFrame,
    shard_col: str,
    order_col: str,
    tok_col: str,
    capacity: int = 512,
) -> DataFrame:
    """Pack rows into token-budget sequences per shard.

    Returns one row per input row: (shard, order, n_tok, seq_id,
    tok_offset) where seq_id is 1-based within the shard and tok_offset
    is the token position where this document starts in its sequence.
    """
    import pandas as pd

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        seq_ids, offsets = [], []
        seq_id, fill = 1, 0
        for n in pdf[tok_col].to_numpy():
            n = int(n)
            if fill > 0 and fill + n > capacity:
                seq_id += 1
                fill = 0
            seq_ids.append(seq_id)
            offsets.append(fill)
            fill += n
        out = pdf[[shard_col, order_col, tok_col]].copy()
        out["seq_id"] = seq_ids
        out["tok_offset"] = offsets
        return out

    schema = (
        f"{shard_col} string, {order_col} bigint, {tok_col} bigint, "
        "seq_id bigint, tok_offset bigint"
    )
    return (
        df.select(shard_col, order_col, tok_col)
        .groupBy(shard_col)
        .applyInPandas(pack, schema)
    )
