"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Design for 100 TB:
  * Exact dedup is one hash aggregate on a fingerprint — never a sort.
  * MinHash LSH turns the quadratic candidate problem into an equi-join on
    (band_id, band_hash): shuffle-partitioned by band key, so candidate
    generation is linear in input + output.
  * All hashes are md5-derived (engine-portable, seedable by salt) — the
    same pipeline is expressible in ANSI SQL for the DuckDB oracle.
  * Pairwise verification (Jaccard / cosine) only runs on LSH candidates,
    never all pairs. The all-pairs variants exposed here take an explicit
    subset predicate to stay bounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.functions.arrays import cosine_similarity


def normalized(text: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by normalized-text md5; keeps the min doc_id
    as the canonical representative. One shuffle on the 128-bit key."""
    fp = F.md5(normalized(F.col(text_col)).cast("binary")).alias("fp")
    return (
        df.select(fp, "doc_id")
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingle) pairs — distinct n-word shingles per document.

    Expression-only: split -> sequence -> transform -> explode. The explode
    multiplies rows ~tokens-per-doc times; downstream aggregates are
    map-side combinable so the shuffle carries (doc, shingle-hash) only.
    """
    toks = F.split(normalized(F.col(text_col)), " ")
    # guard: Spark sequence(0, negative) counts DOWN; short docs get no shingles
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return (
        df.select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 16
) -> DataFrame:
    """MinHash signature per doc: for hash function i, min over shingles of
    md5(i || ':' || shingle). md5-as-permutation with integer salts keeps
    it deterministic and portable (SQL oracle uses the same expression).

    Returns (doc_id, sig array<string> of length num_hashes) via one
    grouped aggregate (min is map-side combinable).
    """
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")).cast("binary"))).alias(
            f"h{i}"
        )
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id",
        F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"),
    )


def lsh_candidate_pairs(
    sig: DataFrame, bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """Band the signature and equi-join on (band_id, band_hash).

    Docs agreeing on all ``rows_per_band`` min-hashes within any band become
    a candidate pair. The join is a plain shuffle-hash/sort-merge equi-join
    on the band key — linear candidate generation, no cross product.
    """
    band_rows = []
    for b in range(bands):
        lo = b * rows_per_band
        band_rows.append(
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[F.col("sig").getItem(lo + r) for r in range(rows_per_band)],
                    ).cast("binary")
                ).alias("band_hash"),
            )
        )
    banded = sig.select(
        "doc_id", F.explode(F.array(*band_rows)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_hash")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    rows_per_band: int = 4,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle -> signature -> band ->
    candidate pairs."""
    sh = shingles(df, text_col, n)
    sig = minhash_signatures(sh, num_hashes)
    return lsh_candidate_pairs(sig, bands, rows_per_band)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    subset: Column | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing >=1 shingle.

    The shingle equi-join generates only co-occurring pairs (not all
    pairs); |union| comes from per-doc shingle counts, so Jaccard =
    inter / (|A| + |B| - inter) without a second pass over text. ``subset``
    optionally bounds the left/right sides for demo-scale runs.
    """
    sh = shingles(df, text_col, n)
    if subset is not None:
        sh = sh.filter(subset)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            on=[
                F.col("a.shingle") == F.col("b.shingle"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(df: DataFrame, text_col: str = "text", bits: int = 16) -> DataFrame:
    """Portable SimHash: per token, md5 hex digits vote +1/-1 on ``bits``
    positions (hex digit >= 8 -> +1); fingerprint bit = sign of the sum.

    Expression-only (explode + conditional sums + bit pack into int). Uses
    the first ``bits`` hex chars of md5(token) as the per-position hash —
    deterministic and mirrored exactly by the SQL oracle.
    """
    assert bits <= 32
    toks = F.explode(
        F.array_distinct(F.split(normalized(F.col(text_col)), " "))
    ).alias("tok")
    h = F.md5(F.col("tok").cast("binary"))
    per_tok = df.select("doc_id", toks).select(
        "doc_id",
        *[
            F.when(
                F.ascii(F.substring(h, p + 1, 1)) >= F.ascii(F.lit("8")),
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .alias(f"b{p}")
            for p in range(bits)
        ],
    )
    sums = per_tok.groupBy("doc_id").agg(
        *[F.sum(f"b{p}").alias(f"s{p}") for p in range(bits)]
    )
    fp = None
    for p in range(bits):
        bit = F.when(F.col(f"s{p}") > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(
            2**p
        )
        fp = bit if fp is None else fp + bit
    return sums.select("doc_id", fp.cast("long").alias("simhash"))


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    subset: Column | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above ``threshold``.

    All-pairs on an (optionally subset) input — the exact baseline. For the
    scale path use similarity.lsh_topk_cosine (bucketed) instead; this
    operator exists as the verifier LSH candidates feed into.
    """
    v = emb.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    if subset is not None:
        v = v.filter(subset)
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine_similarity(F.col("a.v"), F.col("b.v")), 4).alias(
                "cos_sim"
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
