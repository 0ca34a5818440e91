"""End-to-end LLM training-data preparation pipeline.

The composition the individual operators exist for: filter low-quality
docs -> drop exact duplicates (keep-first) -> drop MinHash-LSH near
duplicates (keep the lower doc_id of each candidate pair) -> chunk the
survivors into token windows -> corpus stats per language.

Every stage is one of this engine's already-oracled operators, so the
whole pipeline is expressible as a single SQL oracle too (queries.py).
Shuffle budget: quality filter is map-only; exact dedup one window
shuffle; near-dedup the MinHash pipeline (2 shuffles + semi-join);
chunking map-only; final stats one aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.operators import dedup, textops

MIN_TOKENS = 60


def llm_prep_stats(
    df: DataFrame,
    min_tokens: int = MIN_TOKENS,
    chunk_tokens: int = 100,
    overlap: int = 20,
) -> DataFrame:
    """Per-language stats of the cleaned, deduped, chunked corpus:
    (lang, n_docs, n_chunks, sum_chunk_tokens)."""
    # 1. quality gate (map-only)
    quality = df.filter(textops.token_count(F.col("text")) >= min_tokens)

    # 2. exact dedup, keep-first by doc_id
    fp = F.md5(dedup.normalized(F.col("text")).cast("binary"))
    w = Window.partitionBy(fp).orderBy("doc_id")
    uniq = (
        quality.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # 3. near-dedup: drop the higher doc_id of every LSH candidate pair
    pairs = dedup.minhash_dedup_pairs(
        uniq, num_hashes=16, bands=8, rows_per_band=2
    )
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    kept = uniq.join(losers, "doc_id", "left_anti")

    # 4. chunk survivors
    chunks = textops.chunk_documents(
        kept, chunk_tokens=chunk_tokens, overlap=overlap
    )

    # 5. corpus stats per language
    return (
        chunks.join(kept.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("chunk_tokens").alias("sum_chunk_tokens"),
        )
    )
