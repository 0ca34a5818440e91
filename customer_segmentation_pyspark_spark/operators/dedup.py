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

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.sources.tables import spread as _spread


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
    df = _spread(df)
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


# MinHash permutation family: perm_i(h) = (A[i]*h + B[i]) mod P over a
# 31-bit base hash (products stay < 2^62: no int64 overflow in either
# engine). Constants are arbitrary odd/prime-ish values, mirrored verbatim
# in the SQL oracle (queries.py).
MINHASH_P = 2147483647  # 2^31 - 1
MINHASH_A = [
    1103515245, 1299709, 784923521, 179426549, 362437, 1000000007,
    999999937, 87178291199 % MINHASH_P, 22801763489 % MINHASH_P, 53687091,
    92233720, 715827883, 268435399, 100663319, 402653189, 201326611,
]
MINHASH_B = [
    12345, 514229, 39916801, 433494437, 2971215073 % MINHASH_P, 97,
    1299721, 15485863, 32452843, 49979687, 67867967, 86028121,
    104395301, 122949823, 141650939, 160481183,
]


def shingle_base_hash(shingle: Column) -> Column:
    """60-bit integer hash of a shingle: first 15 hex chars of md5, reduced
    mod 2^31-1. Engine-portable: DuckDB computes the identical value via
    CAST('0x'||substring(md5(s),1,15) AS BIGINT)."""
    return (
        F.conv(F.substring(F.md5(shingle.cast("binary")), 1, 15), 16, 10)
        .cast("long")
        % MINHASH_P
    )


def minhash_signatures(sh: DataFrame, num_hashes: int = 16) -> DataFrame:
    """MinHash signature per doc: one md5 per shingle, then ``num_hashes``
    cheap integer permutations; min per permutation is one map-side
    combinable grouped aggregate.

    Returns (doc_id, sig array<long> of length num_hashes).
    """
    assert num_hashes <= len(MINHASH_A)
    h = shingle_base_hash(F.col("shingle"))
    hashed = sh.select("doc_id", h.alias("h"))
    aggs = [
        F.min((F.lit(MINHASH_A[i]) * F.col("h") + F.lit(MINHASH_B[i])) % MINHASH_P).alias(
            f"h{i}"
        )
        for i in range(num_hashes)
    ]
    sig = hashed.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id",
        F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"),
    )


def band_keys(
    sig: DataFrame, bands: int = 8, rows_per_band: int = 2
) -> DataFrame:
    """``(doc_id, band_id, band_hash)`` LSH band keys from a signature
    frame — the packing shared by ``lsh_candidate_pairs`` and the
    streaming near-dup gate's touched-bucket prefilter (one source of
    truth for the int64 band packing)."""
    band_rows = []
    for b in range(bands):
        lo = b * rows_per_band
        packed = F.col("sig").getItem(lo)
        for r in range(1, rows_per_band):
            packed = packed * MINHASH_P + F.col("sig").getItem(lo + r)
        band_rows.append(
            F.struct(
                F.lit(b).alias("band_id"),
                packed.cast("long").alias("band_hash"),
            )
        )
    return sig.select(
        "doc_id", F.explode(F.array(*band_rows)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_hash")


def lsh_candidate_pairs(
    sig: DataFrame,
    bands: int = 8,
    rows_per_band: int = 2,
    max_bucket_size: int = 1024,
    observation: Observation | None = None,
) -> DataFrame:
    """Band the signature and group on (band_id, band_hash).

    Docs agreeing on all ``rows_per_band`` min-hashes within any band become
    a candidate pair. Candidate generation is linear in input + output —
    one shuffle on the band key, no cross product. Band hash packs the
    (31-bit) row values into one long (rows_per_band <= 2 keeps the
    packing overflow-free in int64).

    Hot buckets are the web-corpus failure mode (boilerplate duplicated
    millions of times -> one band bucket with millions of ids: the
    collect_list blows task memory and in-bucket pair expansion is
    quadratic). Buckets are therefore size-capped:

      * bucket size is computed FIRST, as a window count over the band
        key — one shuffle shared with the small-bucket grouping below,
        and a hot bucket only ever streams through the window's
        spillable buffer (its id array is never materialized);
      * buckets with 1 < size <= ``max_bucket_size`` expand in-bucket via
        indexed array transforms — bounded by cap^2 per bucket;
      * oversized buckets fall back to exact-fingerprint star pairs:
        their docs are grouped by the FULL minhash signature and each
        group emits (min_doc_id, other) pairs — linear in group size, and
        connected-components over star pairs yields the same components
        as the quadratic all-pairs expansion would. Boilerplate dup
        groups are still reported, never silently dropped.

    Pass an ``Observation`` to get free metrics (no extra scan) for the
    materializing action: ``oversized_buckets``, ``oversized_doc_slots``,
    ``max_bucket_size_seen``.
    """
    assert rows_per_band <= 2, "int64 band packing supports rows_per_band <= 2"
    # The signature frame feeds TWO consumers (band explode below, and the
    # full-signature fingerprint for the oversized-bucket fallback) —
    # materialize it once or the whole shingle->minhash pipeline executes
    # per branch. One compact row per doc (17 ints), so the checkpoint is
    # a few MB even at corpus scale.
    sig = sig.localCheckpoint(eager=True)
    from pyspark.sql import Window

    banded = band_keys(sig, bands, rows_per_band)
    # bucket size via a window over the band key: ONE shuffle for sizing +
    # small-bucket grouping (the groupBy below reuses the partitioning),
    # and a hot bucket only ever streams through the spillable window
    # buffer — its id array is never materialized
    w = Window.partitionBy("band_id", "band_hash")
    with_sz = banded.withColumn("bsz", F.count(F.lit(1)).over(w))
    if observation is not None:
        with_sz = with_sz.observe(
            observation,
            F.round(
                F.sum(
                    F.when(
                        F.col("bsz") > max_bucket_size, 1.0 / F.col("bsz")
                    ).otherwise(0.0)
                )
            ).cast("long").alias("oversized_buckets"),
            F.sum(
                F.when(F.col("bsz") > max_bucket_size, 1).otherwise(0)
            ).cast("long").alias("oversized_doc_slots"),
            F.max("bsz").cast("long").alias("max_bucket_size_seen"),
        )
    # Small buckets: single-pass in-bucket pair expansion instead of a
    # self-join (a self-join would recompute the whole shingle->signature
    # pipeline for both sides). collect_list is bounded by the cap.
    buckets = (
        with_sz.filter(
            (F.col("bsz") > 1) & (F.col("bsz") <= max_bucket_size)
        )
        .groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
    )
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    pairs_small = (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.doc_a", "p.doc_b")
    )
    # Oversized buckets: star pairs per identical full signature. No
    # arrays, no quadratic expansion — one groupBy(min) + one equi-join.
    big_docs = (
        with_sz.filter(F.col("bsz") > max_bucket_size)
        .select("doc_id")
        .distinct()
    )
    fp = F.md5(
        F.concat_ws(
            ",", F.transform(F.col("sig"), lambda x: x.cast("string"))
        ).cast("binary")
    )
    keyed = sig.join(big_docs, "doc_id").select("doc_id", fp.alias("fp"))
    mins = keyed.groupBy("fp").agg(F.min("doc_id").alias("doc_a"))
    pairs_big = (
        keyed.join(mins, "fp")
        .filter(F.col("doc_id") != F.col("doc_a"))
        .select("doc_a", F.col("doc_id").alias("doc_b"))
    )
    return pairs_small.union(pairs_big).distinct()


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    rows_per_band: int = 2,
    max_bucket_size: int = 1024,
    observation: Observation | None = None,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle -> signature -> band ->
    size-capped candidate pairs (see ``lsh_candidate_pairs``)."""
    sh = shingles(df, text_col, n)
    sig = minhash_signatures(sh, num_hashes)
    return lsh_candidate_pairs(
        sig, bands, rows_per_band, max_bucket_size, observation
    )


def _drop_hot_shingles(
    sh: DataFrame, max_doc_freq: int | None
) -> DataFrame:
    """Stop-shingle guard shared by the full and incremental Jaccard
    joins: shingles with document frequency > ``max_doc_freq`` are
    dropped BEFORE any pair join (one map-side combinable groupBy + a
    broadcast anti-join against the tiny hot set)."""
    if max_doc_freq is None:
        return sh
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_doc_freq)
        .select("shingle")
    )
    return sh.join(F.broadcast(hot), "shingle", "left_anti")


def _jaccard_from_inter(
    inter: DataFrame, sh: DataFrame, threshold: float
) -> DataFrame:
    """Shared Jaccard tail: per-doc shingle sizes joined onto the
    (doc_a, doc_b, inter) co-occurrence counts; |union| = |A| + |B| -
    inter, rounded to 4 and thresholded. One source of truth for the
    'consistent reduced-space Jaccard' contract both the full and
    incremental operators (and their equivalence test) rely on."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
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
                F.col("inter")
                / (F.col("n_a") + F.col("n_b") - F.col("inter")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    subset: Column | None = None,
    max_doc_freq: int | None = 10_000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing >=1 shingle.

    The shingle equi-join generates only co-occurring pairs (not all
    pairs); |union| comes from per-doc shingle counts, so Jaccard =
    inter / (|A| + |B| - inter) without a second pass over text. ``subset``
    optionally bounds the left/right sides for demo-scale runs.

    Stop-shingles are the scale hazard: a shingle appearing in every doc
    ("of the and") makes the self-join near-quadratic in corpus size
    while carrying ~no Jaccard signal. Shingles with document frequency
    > ``max_doc_freq`` are dropped BEFORE the join (one extra map-side
    combinable groupBy + a broadcast anti-join against the tiny hot set),
    bounding join output at max_doc_freq * co-occurrences. Jaccard is
    then computed consistently over the reduced shingle space (sizes and
    intersections both exclude dropped shingles). The fixture vocabulary
    never reaches the default cap, so sf-scale results are exact.
    """
    sh = shingles(df, text_col, n)
    if subset is not None:
        sh = sh.filter(subset)
    sh = _drop_hot_shingles(sh, max_doc_freq)
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
    return _jaccard_from_inter(inter, sh, threshold)


def incremental_jaccard_pairs(
    df: DataFrame,
    new_pred: Column,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = 10_000,
) -> DataFrame:
    """Incremental near-dup detection: exact n-gram Jaccard pairs where
    AT LEAST ONE side satisfies ``new_pred`` (the freshly ingested
    shard) — the daily-crawl shape where the existing corpus is already
    deduped and only new-vs-all (plus new-vs-new) pairs matter.

    The incremental win is in the join bound: the probe side of the
    shingle equi-join is ONLY the delta's shingles, so candidate volume
    is O(|delta| x bucket), independent of corpus^2 — at 100 TB the
    corpus-side shingle index is the pre-materialized table a nightly
    pipeline maintains (write it once via the versioned store), and
    each shard's dedup cost scales with the shard. Old-old pairs are
    excluded by construction (probe side is delta-only); new-new pairs
    appear once via the id ordering. Same stop-shingle df cap and
    consistent reduced-space Jaccard as ``ngram_jaccard_pairs``.
    """
    # NULL predicate values (e.g. legacy docs with a NULL ingest_day)
    # mean "old" on BOTH join sides: without the coalesce, ~NULL is
    # NULL and an old/NULL doc with the larger id would silently drop
    # its pair against a new doc
    sh = shingles(df, text_col, n).withColumn(
        "is_new",
        F.coalesce(new_pred.cast("boolean"), F.lit(False)),
    )
    sh = _drop_hot_shingles(sh, max_doc_freq)
    probe = sh.filter(F.col("is_new"))
    a, b = sh.alias("a"), probe.alias("b")
    # pair each delta doc against everything except itself; (old, new)
    # pairs appear once (probe side is new-only), (new, new) pairs
    # appear twice in the raw join and are kept only in id order
    inter = (
        a.join(
            b,
            on=[
                F.col("a.shingle") == F.col("b.shingle"),
                F.col("a.doc_id") != F.col("b.doc_id"),
                (~F.col("a.is_new"))
                | (F.col("a.doc_id") < F.col("b.doc_id")),
            ],
        )
        .groupBy(
            F.least("a.doc_id", "b.doc_id").alias("doc_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return _jaccard_from_inter(inter, sh, threshold)


def simhash(df: DataFrame, text_col: str = "text", bits: int = 16) -> DataFrame:
    """Portable SimHash: per token, md5 hex digits vote +1/-1 on ``bits``
    positions (hex digit >= 8 -> +1); fingerprint bit = sign of the sum.

    Expression-only (explode + conditional sums + bit pack into int). Uses
    the first ``bits`` hex chars of md5(token) as the per-position hash —
    deterministic and mirrored exactly by the SQL oracle.
    """
    assert bits <= 32
    df = _spread(df)
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


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    bits: int = 16,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= ``max_hamming``,
    found with the pigeonhole band join: split the ``bits``-bit
    fingerprint into ``bands`` equal slices — any pair within
    ``max_hamming`` <= bands-1 flipped bits must agree EXACTLY on at
    least one slice — equi-join on (band_idx, band_value), then verify
    with the exact popcount. Same complexity shape as MinHash LSH
    (linear candidate generation, one shuffle on the band key) but over
    the Hamming metric; the standard companion to `simhash` for
    template-heavy corpora where cosine/Jaccard are too coarse.
    Requires bands > max_hamming (pigeonhole) — asserted.
    """
    assert bits % bands == 0 and bands > max_hamming
    width = bits // bands
    fp = simhash(df, text_col, bits)
    slices = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftright(F.col("simhash"), b * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("band_val"),
            )
            for b in range(bands)
        ]
    )
    banded = fp.select(
        "doc_id", "simhash", F.explode(slices).alias("b")
    ).select("doc_id", "simhash", "b.band_idx", "b.band_val")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).cast("long").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    subset: Column | None = None,
    rows_per_block: int = 100_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above ``threshold`` — exact,
    via a fully distributed block-pair GEMM self-join.

    Physical shape: normalize once JVM-side (Catalyst expressions, one
    pass), hash each row into one of B = ceil(n / rows_per_block) blocks,
    replicate rows to their B(B+1)/2 block pairs through a broadcast join
    on the tiny (pair_id, blk, side) index, and compute each block pair's
    similarities as ONE numpy GEMM inside grouped ``applyInPandas``.
    Emits only (id_a < id_b, sim >= threshold) pairs; each unordered pair
    materializes in exactly one block pair, so no distinct is needed.

    Nothing ever materializes on the driver — the only driver-side value
    is the scalar row count that sizes B. Task memory is bounded by
    2 * rows_per_block * dim doubles regardless of corpus size (this
    replaces the earlier design that collected the whole corpus to the
    driver and broadcast it, capped at 2M rows). The price is the
    standard replication factor ~B: shuffle volume is n * (B + 1) rows.
    Exact all-pairs is inherently O(n^2) compute; at corpus scale use the
    sub-quadratic paths (minhash/hyperplane LSH prefilter, IVF) and
    reserve this as the exact verifier on candidate subsets.
    """
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    sumsq = F.aggregate(
        F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x
    )
    norm = F.sqrt(sumsq)
    v = emb.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    if subset is not None:
        v = v.filter(subset)
    # normalize once JVM-side so the per-group kernel is a bare GEMM
    v = v.select(
        "id",
        F.when(norm == 0, F.col("v"))
        .otherwise(F.transform(F.col("v"), lambda x: x / norm))
        .alias("v"),
    )
    # evaluated twice (count + scored scan) — cache instead of two scans
    v = v.cache()
    n = v.count()
    spark = emb.sparkSession
    # rows_per_block caps task memory; the parallelism floor keeps
    # B(B+1)/2 block-pair tasks >= cluster slots so one giant diagonal
    # GEMM never serializes the stage (B ~ sqrt(2 * slots))
    par_blocks = math.ceil(math.sqrt(2 * spark.sparkContext.defaultParallelism))
    num_blocks = max(
        1, min(n, max(math.ceil(n / rows_per_block), par_blocks))
    )
    if num_blocks * (num_blocks + 1) // 2 > 2_000_000:
        # the block-pair index grows quadratically in n/rows_per_block;
        # past ~2M pairs (n ~ 200M rows at the default block size) the
        # exact all-pairs GEMM is infeasible COMPUTE anyway — this
        # operator is the exact verifier for candidate subsets, not a
        # corpus-scale scan (see docstring / SCALE.md)
        v.unpersist()  # don't strand the cached frame on the error path
        raise ValueError(
            f"embedding_neardup_pairs: {n} rows -> {num_blocks} blocks; "
            "exact all-pairs is infeasible at this scale — prefilter "
            "with minhash/hyperplane LSH or IVF and run this on the "
            "candidate subset (subset=...), or raise rows_per_block"
        )
    index_rows = []
    pid = 0
    for i in range(num_blocks):
        for j in range(i, num_blocks):
            if i == j:
                index_rows.append((pid, i, "both"))
            else:
                index_rows.append((pid, i, "a"))
                index_rows.append((pid, j, "b"))
            pid += 1
    index = spark.createDataFrame(
        index_rows, "pid int, blk int, side string"
    )
    tagged = v.withColumn(
        "blk", F.pmod(F.xxhash64("id"), F.lit(num_blocks)).cast("int")
    ).join(F.broadcast(index), "blk")

    schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def score(_key, pdf: pd.DataFrame) -> pd.DataFrame:
        both = (pdf["side"] == "both").any()
        if both:
            a = b = pdf
        else:
            a = pdf[pdf["side"] == "a"]
            b = pdf[pdf["side"] == "b"]
        if a.empty or b.empty:
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "cos_sim": []}
            ).astype({"id_a": "int64", "id_b": "int64", "cos_sim": "float64"})
        aid = a["id"].to_numpy()
        bid = b["id"].to_numpy()
        am = np.stack(a["v"].to_numpy()).astype(np.float64)
        bm = np.stack(b["v"].to_numpy()).astype(np.float64)
        sims = np.round(am @ bm.T, 4)
        if both:
            # diagonal block: each unordered pair appears as (x,y) AND
            # (y,x) — the strict id triangle keeps one and drops selfs
            mask = (sims >= threshold) & (aid[:, None] < bid[None, :])
        else:
            # cross block: blocks are disjoint, each unordered pair
            # appears exactly once — keep all, order ids on output
            mask = sims >= threshold
        ii, jj = np.nonzero(mask)
        lo = np.minimum(aid[ii], bid[jj])
        hi = np.maximum(aid[ii], bid[jj])
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cos_sim": sims[ii, jj]})

    return tagged.groupBy("pid").applyInPandas(score, schema=schema)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    algorithm: str = "label_prop",
) -> DataFrame:
    """Connected components over an undirected edge list. Returns
    (id, component) with component = min node id in the component.

    This is the step the dedup pipelines need after candidate-pair
    generation (minhash/ngram/embedding near-dup emit PAIRS; retention
    policy needs GROUPS — keep one doc per component). The reference has
    no analogue; semantics follow the standard union-find result.

    Two interchangeable bodies (identical outputs, pinned by tests):

    * ``label_prop`` (default): min-label propagation — each round is one
      join + one shuffle; rounds = graph DIAMETER. Near-dup graphs are
      unions of near-cliques (diameter 2-4), where this is the cheapest
      shape. Labels only decrease, so sum(label) strictly decreases until
      convergence — the loop's exit test is that single scalar.
    * ``star``: alternating large-star/small-star (Kiveris et al.,
      "Connected Components in MapReduce and Beyond") — O(log n) rounds
      regardless of diameter. The scale-safe choice for adversarial
      long-path graphs (chains, lattices) where label_prop would need
      O(diameter) shuffles. See ``star_connected_components`` for the
      round-count contract.

    Both bodies ``localCheckpoint`` per round so lineage stays bounded,
    and both loops' only driver-side values are O(1) convergence scalars.
    """
    if algorithm == "star":
        return star_connected_components(edges, src, dst, max_iter)[0]
    assert algorithm == "label_prop", algorithm
    und = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    und = und.union(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    # materialize once: the edge list is often an expensive upstream
    # pipeline (shingle->Jaccard), and the loop re-joins it every round
    ).localCheckpoint(eager=True)
    labels = (
        und.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]
    for _ in range(max_iter):
        msgs = und.join(
            labels.withColumnRenamed("id", "b"), on="b"
        ).select(F.col("a").alias("id"), "component")
        labels = (
            labels.select("id", "component")
            .union(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("component")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def _sym(e: DataFrame) -> DataFrame:
    return e.union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u with neighborhood N(u): attach every LARGER
    neighbor v > u to m = min(N(u) + [u]). Strictly-larger targets keep
    the op monotone (no 2-cycles), and every emitted edge points downhill
    toward the component min."""
    s = _sym(e)
    mins = s.groupBy("u").agg(F.min("v").alias("mn"))
    j = s.join(mins, "u").select(
        "u", "v", F.least(F.col("mn"), F.col("u")).alias("m")
    )
    return (
        j.filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """For each node u: attach u and all SMALLER-or-equal neighbors to
    m = min of that set — collapses the downhill chains large-star
    leaves behind."""
    s = _sym(e).filter(F.col("v") <= F.col("u"))
    mins = s.groupBy("u").agg(F.min("v").alias("mn"))
    j = s.join(mins, "u").select(
        "u", "v", F.least(F.col("mn"), F.col("u")).alias("m")
    )
    out_v = j.select(F.col("v").alias("u"), F.col("m").alias("v"))
    out_u = j.select("u", F.col("m").alias("v"))
    return (
        out_v.union(out_u)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def star_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> tuple[DataFrame, int]:
    """Alternating large-star/small-star connected components.

    Returns ``(labels, rounds)`` where labels is (id, component) with
    component = min node id, and rounds is the number of LS+SS rounds to
    the fixed point — O(log n) in the node count, independent of graph
    diameter (the property the long-chain test pins). Each round is two
    grouped aggregates + two equi-joins; convergence is detected by an
    order-insensitive (count, hash-sum) checksum of the edge multiset —
    two O(1) driver scalars, never a collect of the edges.
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"),
            F.col(dst).cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        _sym(e).select(F.col("u").alias("id")).distinct()
        .localCheckpoint(eager=True)
    )

    def checksum(df: DataFrame):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.pmod(F.xxhash64("u", "v"), F.lit(1_000_000_007))
            ).alias("h"),
        ).collect()[0]

    prev = checksum(e)
    rounds = 0
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        rounds += 1
        cur = checksum(e)
        if (cur["n"], cur["h"]) == (prev["n"], prev["h"]):
            break
        prev = cur
    # fixed point is a star forest: every non-root points straight at its
    # component min; roots (and isolated self-loop nodes) map to themselves
    labels = (
        nodes.join(e.withColumnRenamed("u", "id"), "id", "left")
        .groupBy("id")
        .agg(
            F.min(F.coalesce(F.col("v"), F.col("id"))).alias("component")
        )
    )
    return labels, rounds


def segment_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_words: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """C4/RefinedWeb-style cross-document segment dedup: cut each doc
    into fixed ``seg_words``-word segments, drop every segment whose
    exact text appears in >= ``min_docs`` distinct documents, and return
    per-doc stats plus the retained text (segments rejoined in order).

    Scale shape: segments are built with array HOFs (sequence + slice,
    no per-word explode); the corpus-wide frequency pass is ONE hash
    aggregate on the 128-bit segment hash; the join back re-uses the
    same hash partitioning. Two shuffles on compact keys, never a sort —
    the boilerplate-removal pass a 100 TB web corpus needs.

    Output: (id_col, n_segs, n_dup_segs, clean_text).
    """
    words = F.split(F.col(text_col), r"\s+")
    n_segs = F.ceil(F.size(words) / F.lit(float(seg_words))).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_segs - F.lit(1)),
        lambda i: F.array_join(
            F.slice(words, i * seg_words + 1, seg_words), " "
        ),
    )
    seg = df.select(
        id_col, F.posexplode(segs).alias("seg_id", "seg_text")
    ).withColumn("h", F.md5(F.col("seg_text").cast("binary")))
    seg_df = seg.groupBy("h").agg(
        F.count_distinct(id_col).alias("n_docs")
    )
    flagged = seg.join(seg_df, "h")
    kept_struct = F.when(
        F.col("n_docs") < min_docs, F.struct("seg_id", "seg_text")
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.sum(F.when(F.col("n_docs") >= min_docs, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dup_segs"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda x: x["seg_text"],
            ),
            " ",
        ).alias("clean_text"),
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Set-similarity join with PPJoin-style prefix filtering (Chaudhuri
    et al. SSJoin / Bayardo et al. all-pairs): pairs with n-gram Jaccard
    >= ``threshold`` WITHOUT joining on every co-occurring shingle.

    Under a global shingle order (document frequency asc, then text —
    rarest first), any pair with Jaccard >= t must share a shingle
    within each doc's first ``|x| - ceil(t*|x|) + 1`` shingles, so the
    candidate join only explodes the rare prefix, not the whole set.
    Candidates are then verified with the exact intersection count, so
    the filter is lossless: output == the naive all-co-occurrence join.

    Scale shape: the equi-join key is (rare shingle) — document
    frequency of prefix shingles is low BY CONSTRUCTION (they sort
    rarest-first), which bounds per-key fan-out exactly where the plain
    co-occurrence join blows up on stop-shingles. One df aggregate, one
    per-doc window (keyed by doc, balanced), candidate equi-join,
    verify join restricted to candidates.
    """
    from pyspark.sql import Window

    sh = shingles(df, text_col, n)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    w = Window.partitionBy("doc_id").orderBy("df", "shingle")
    prefix = (
        sh.join(dfreq, "shingle")
        .withColumn("rn", F.row_number().over(w))
        .join(sizes, "doc_id")
        .where(
            F.col("rn")
            <= F.col("n_sh")
            - F.ceil(F.lit(threshold) * F.col("n_sh"))
            + 1
        )
        .select("doc_id", "shingle")
    )
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            on=[
                F.col("a.shingle") == F.col("b.shingle"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    ta = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    tb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter")
                / (F.col("n_a") + F.col("n_b") - F.col("inter")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def semantic_dedup(
    emb: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int = 16384,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication for web-scale pretraining corpora — cluster the
    embedding space, then drop within-cluster near-duplicates by cosine,
    keeping the lowest-id representative of each near-dup group.

    The quadratic all-pairs problem is blocked by the cluster key: with
    K ∝ N / target_cluster_size the per-cluster pair expansion is
    bounded, and the only shuffle is the cluster-keyed self-join (the
    cross-cluster pairs SemDeDup deliberately ignores are what make it
    sub-quadratic).  Clusters larger than ``max_cluster_size`` (a
    skewed or stale centroid set) are auto-routed through a block-pair
    GEMM sub-division — identical dropped set, task memory enforced at
    2·cap·dim regardless of cluster skew. Assignment is one codegen'd projection — the
    centroids ride the plan as literals, exactly like the K-means
    assign stage (plans/kmeans.py), so at 100 TB you train centroids on
    a sample with the engine's own kmeans and splice them in here.

    Deterministic + oracle-exact: squared-Euclidean assignment folds
    per-dimension terms left-to-right (bit-identical in DuckDB), argmin
    breaks ties on the first minimum, cosine is rounded to 4 decimals
    before the threshold, and "keep" is the id-ordered survivor rule —
    no iteration, no RNG.

    Returns (vec_id, cluster, keep).

    Caller note: if ``vec_col`` is a DERIVED column (not read from
    storage), materialize it first (localCheckpoint / parquet snapshot)
    — the self-join otherwise re-evaluates the full derivation
    expression per PAIR row, a multiplicative expression blowup
    (measured 40x wall on a 500-doc corpus with computed embeddings;
    see q_retrieval_index_pipeline).
    """
    if max_cluster_size < 1:
        raise ValueError("max_cluster_size must be >= 1")
    n_dim = len(centroids[0])

    def elem(vec: str, i: int) -> str:
        return f"cast(element_at({vec}, {i + 1}) as double)"

    base = emb.selectExpr(f"{id_col} as vec_id", f"{vec_col} as v")

    def sqdist(cent: list[float]) -> str:
        return " + ".join(
            f"({elem('v', d)} - ({c!r})) * ({elem('v', d)} - ({c!r}))"
            for d, c in enumerate(cent)
        )

    # assignment + per-row norm in codegen'd string expressions: no
    # zip_with/aggregate lambdas (interpreted, never codegen'd) and no
    # transform() pre-cast (projection collapse would re-inline the full
    # lambda into every element reference — see SCALE.md; this exact
    # operator ran 45 s at sf0.1 in the HOF form, ~3 s in this form).
    # Norms are computed ONCE per row pre-join so the pair stage is a
    # 64-term dot product + one divide.
    dists = (
        "array(" + ", ".join(f"({sqdist(c)})" for c in centroids) + ")"
    )
    lists = base.selectExpr("vec_id", "v", f"{dists} as dl")
    assigned = lists.selectExpr(
        "vec_id",
        "v",
        "cast(array_position(dl, array_min(dl)) - 1 as bigint) as cluster",
    )
    # Pair stage: per-cluster GEMM inside grouped applyInPandas — the
    # same sanctioned Arrow kernel as embedding_neardup_pairs. The JVM
    # expression form (64-term dot per pair) measured ~5 s for 1.5M
    # pairs at sf0.1 (~300k pairs/s: element_at extraction dominates);
    # the numpy GEMM does the same cluster in milliseconds. Group task
    # memory is O(cluster_size * dim) — bounded in the normal case
    # because SemDeDup picks K ∝ N / target_cluster_size, and ENFORCED
    # for pathological hot clusters (a skewed/stale centroid set
    # funneling a giant cluster into one task): any cluster above
    # ``max_cluster_size`` is automatically routed through the same
    # block-pair sub-division as embedding_neardup_pairs — rows hashed
    # into ceil(size/cap) blocks, each block PAIR scored as one bounded
    # GEMM task — yielding the identical dropped set ("larger id of any
    # qualifying pair") with task memory capped at 2*cap*dim doubles.
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("vec_id", T.LongType())])

    def dropped_in_cluster(_key, pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"vec_id": []}).astype({"vec_id": "int64"})
        ids = pdf["vec_id"].to_numpy()
        m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(m, axis=1)
        nrm[nrm == 0] = 1.0
        m = m / nrm[:, None]
        sims = np.round(m @ m.T, 4)
        mask = (sims >= threshold) & (ids[:, None] < ids[None, :])
        dup = np.unique(ids[np.nonzero(mask)[1]])
        return pd.DataFrame({"vec_id": dup})

    # assigned feeds the size count, the pair stage, and the final join;
    # cache so the codegen'd assign projection runs once. (At cluster
    # scale, swap the cache for a parquet snapshot of (vec_id, cluster).)
    assigned = assigned.cache()
    hot = {
        int(r["cluster"]): int(r["n"])
        for r in assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > max_cluster_size)
        .collect()  # bounded: at most len(centroids) rows
    }
    cold = assigned
    if hot:
        spark = emb.sparkSession
        # The block-pair index has nb(nb+1)/2 rows per hot cluster
        # (nb = ceil(size/cap)) — QUADRATIC in the skew factor. That is
        # fine for the skew this cap exists for (a 100x-cap cluster is
        # ~5k index rows), but the underlying all-pairs GEMM is O(n^2)
        # COMPUTE no matter how it is sub-divided: a billion-row cluster
        # is 5e17 similarity pairs, which no indexing scheme makes
        # tractable. Refuse past ~1000x-cap skew with guidance instead
        # of building a multi-million-row driver-side index for a job
        # that cannot finish — re-cluster the hot cluster (recursive
        # SemDeDup with fresh centroids) or route it through an
        # LSH/IVF prefilter + embedding_neardup_pairs on candidates.
        total_idx = sum(
            (math.ceil(sz / max_cluster_size) ** 2) for sz in hot.values()
        )
        if total_idx > 2_000_000:
            worst = max(hot.items(), key=lambda kv: kv[1])
            assigned.unpersist()  # don't strand the cache on refusal
            raise ValueError(
                f"semantic_dedup: cluster {worst[0]} has {worst[1]} rows "
                f"(> ~1000x max_cluster_size={max_cluster_size}); the "
                "exact within-cluster GEMM is O(n^2) and infeasible at "
                "this skew — re-cluster with more/fresher centroids or "
                "pre-filter with LSH/IVF before exact verification"
            )
        nbs, idx_rows = [], []
        for cl, sz in sorted(hot.items()):
            nb = math.ceil(sz / max_cluster_size)
            nbs.append((cl, nb))
            pid = 0
            for i in range(nb):
                for j in range(i, nb):
                    if i == j:
                        idx_rows.append((cl, pid, i, "both"))
                    else:
                        idx_rows.append((cl, pid, i, "a"))
                        idx_rows.append((cl, pid, j, "b"))
                    pid += 1
        nb_df = spark.createDataFrame(nbs, "cluster bigint, nb int")
        idx_df = spark.createDataFrame(
            idx_rows, "cluster bigint, pid int, blk int, side string"
        )
        cold = assigned.join(
            F.broadcast(nb_df.select("cluster")), "cluster", "left_anti"
        )

        def dropped_in_block_pair(_key, pdf: pd.DataFrame) -> pd.DataFrame:
            both = (pdf["side"] == "both").any()
            if both:
                a = b = pdf
            else:
                a = pdf[pdf["side"] == "a"]
                b = pdf[pdf["side"] == "b"]
            if a.empty or b.empty:
                return pd.DataFrame({"vec_id": []}).astype(
                    {"vec_id": "int64"}
                )

            def unit(block: pd.DataFrame) -> np.ndarray:
                m = np.stack(block["v"].to_numpy()).astype(np.float64)
                nrm = np.linalg.norm(m, axis=1)
                nrm[nrm == 0] = 1.0
                return m / nrm[:, None]

            aid = a["vec_id"].to_numpy()
            bid = b["vec_id"].to_numpy()
            sims = np.round(unit(a) @ unit(b).T, 4)
            ii, jj = np.nonzero(sims >= threshold)
            lo = np.minimum(aid[ii], bid[jj])
            hi = np.maximum(aid[ii], bid[jj])
            dup = np.unique(hi[hi != lo])  # != drops diagonal selfs
            return pd.DataFrame({"vec_id": dup})

        dropped_hot = (
            assigned.join(F.broadcast(nb_df), "cluster")
            .withColumn(
                "blk",
                F.pmod(F.xxhash64("vec_id"), F.col("nb")).cast("int"),
            )
            .join(F.broadcast(idx_df), ["cluster", "blk"])
            .select("cluster", "pid", "side", "vec_id", "v")
            .groupBy("cluster", "pid")
            .applyInPandas(dropped_in_block_pair, schema=schema)
            .distinct()  # a dropped id may surface in several block pairs
        )
    dropped = (
        cold.select("cluster", "vec_id", "v")
        .groupBy("cluster")
        .applyInPandas(dropped_in_cluster, schema=schema)
    )
    if hot:
        dropped = dropped.unionByName(dropped_hot)
    dropped = dropped.withColumn("is_dup", F.lit(True))
    return (
        assigned.select("vec_id", "cluster")
        .join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.coalesce(~F.col("is_dup"), F.lit(True)).alias("keep"),
        )
    )


def duplicated_span_profile(
    df: DataFrame,
    span_len: int = 24,
    stride: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ExactSubstr-style duplicated-span profile (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better").

    The reference engine has no substring dedup (its corpus ops stop at
    whole-row dedup, codeText.txt:118); this is the training-corpus
    extension: long verbatim spans shared across documents (licenses,
    boilerplate, quoted text) are what actually gets memorized, and
    whole-doc near-dup misses them.

    Approximation of the suffix-array algorithm that distributes:
    slide a ``span_len``-char window at ``stride`` over each doc, hash
    every span (md5 prefix -> 64-bit), count global span multiplicity,
    and report per doc how much of it is covered by spans seen >= 2
    times anywhere in the corpus (including intra-doc repeats, which
    ExactSubstr also removes).

    Scale shape: rows exploded = chars/stride (linear); ONE pass over
    the text (explode -> per-(doc,span) pre-agg, map-side combinable),
    then global multiplicity rides a window SUM over the pre-aggregated
    frame partitioned by span hash — no join back, no second text scan,
    nothing materialized. A span shared by a million docs costs one
    summed counter, never a bucket array (the LSH hot-bucket failure
    mode cannot occur: we need multiplicity, not the pair list).
    Output is one constant-width row per doc.
    """
    from pyspark.sql import Window

    n = F.length(F.col(text_col))
    # positions 1, 1+stride, ... while pos + span_len - 1 <= len
    pos = F.when(
        n >= span_len,
        F.sequence(F.lit(1), n - span_len + 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    spans = _spread(df).select(
        F.col(id_col),
        F.explode(pos).alias("p"),
        F.col(text_col),
    ).select(
        id_col,
        # 64-bit slice of md5 keeps the shuffle key narrow and is
        # replayable in ANSI SQL (substr(md5(..),1,16))
        F.substring(
            F.md5(F.substring(F.col(text_col), F.col("p"), span_len)), 1, 16
        ).alias("h"),
    )
    g = spans.groupBy(id_col, "h").agg(F.count(F.lit(1)).alias("c"))
    mult = F.sum("c").over(Window.partitionBy("h"))
    per_doc = (
        g.select(F.col(id_col), F.col("c"), mult.alias("mult"))
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_spans"),
            F.sum(F.when(F.col("mult") >= 2, F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_dup_spans"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.when(
                F.coalesce("n_spans", F.lit(0)) > 0,
                F.round(F.col("n_dup_spans") / F.col("n_spans"), 4),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_span_ratio"),
        )
    )


def duplicated_span_intervals(
    df: DataFrame,
    span_len: int = 24,
    stride: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The removal half of ExactSubstr dedup: merge each document's
    duplicated spans (global multiplicity >= 2, as in
    ``duplicated_span_profile``) into maximal character intervals
    [start, end] — the byte ranges a corpus cleaner would cut or
    dedup-mask before training.

    Interval merge is the classic gaps-and-islands shape done at scale:
    per doc, order spans by start, carry the running max end with a
    window frame (rows unbounded preceding -> 1 preceding), start a new
    island where the current start exceeds it, then one agg per island.
    Two keyed shuffles total (span-hash multiplicity + per-doc window);
    nothing quadratic, no pair lists.
    """
    from pyspark.sql import Window

    n = F.length(F.col(text_col))
    pos = F.when(
        n >= span_len,
        F.sequence(F.lit(1), n - span_len + 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    spans = _spread(df).select(
        F.col(id_col),
        F.explode(pos).alias("p"),
        F.col(text_col),
    ).select(
        id_col,
        "p",
        F.substring(
            F.md5(F.substring(F.col(text_col), F.col("p"), span_len)), 1, 16
        ).alias("h"),
    )
    mult = F.count(F.lit(1)).over(Window.partitionBy("h"))
    dup = spans.withColumn("mult", mult).filter(F.col("mult") >= 2)
    w = Window.partitionBy(id_col).orderBy(F.col("p").asc())
    prev_max_end = F.max(F.col("p") + span_len - 1).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = dup.select(
        id_col,
        "p",
        F.when(
            F.col("p") > F.coalesce(prev_max_end, F.lit(-1)), 1
        )
        .otherwise(0)
        .alias("new_island"),
    ).withColumn(
        "island",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        islands.groupBy(id_col, "island")
        .agg(
            F.min("p").cast("long").alias("start"),
            (F.max("p") + span_len - 1).cast("long").alias("end"),
            F.count(F.lit(1)).cast("long").alias("n_spans"),
        )
        .select(id_col, "start", "end", "n_spans")
    )
