"""Text-analysis operators for LLM-data-pipeline workloads.

All hot-path logic is built-in Catalyst expressions (split / regexp / md5 /
higher-order functions) — no Python UDFs — so token counting or quality
scoring over 100 TB of documents is a single codegen'd projection with
column pruning down to ``text``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic. Deliberately deterministic and SQL-expressible (the DuckDB
# oracle mirrors them); swap in fastText/CLD3 via a pandas_udf for quality.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "de", "et", "les"),
    "de": ("der", "die", "und", "das", "ist"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (split on 1+ whitespace chars)."""
    return F.split(text, r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token estimate: alphanumeric runs + individual
    punctuation marks (the chunks a BPE pre-tokenizer would split on).
    RE2-compatible pattern (no lookaround) so the DuckDB oracle computes
    the identical count; upper-bounds whitespace tokens."""
    return F.regexp_count(text, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality scoring features (length, token stats,
    punctuation/stopword ratios). One projection, no shuffle."""
    t = F.col(text_col)
    n_tok = token_count(t)
    return df.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars_calc"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(
            (F.length(F.regexp_replace(t, r"\s", "")) / n_tok), 4
        ).alias("avg_token_len"),
        F.round(
            F.length(F.regexp_replace(t, r"[^.,;:!?]", "")) / F.length(t), 4
        ).alias("punct_ratio"),
        F.round(
            F.size(
                F.filter(tokens(t), lambda w: w.isin(*LANG_MARKERS["en"]))
            )
            / n_tok,
            4,
        ).alias("stopword_ratio"),
    )


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda w: w.isin(*markers)))


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: score each language by marker-token
    hits, pick the max (ties -> 'und'). Pure expressions; scales as a
    projection."""
    toks = tokens(F.lower(F.col(text_col)))
    scores = {
        lang: _marker_hits(toks, marks) for lang, marks in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    # deterministic priority order on ties: first language in dict wins
    for lang in reversed(list(LANG_MARKERS)):
        pred = F.when(
            (scores[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return df.select(
        "doc_id",
        *[scores[lang].cast("long").alias(f"score_{lang}") for lang in LANG_MARKERS],
        pred.alias("pred_lang"),
    )


def tfidf_top_terms(
    df: DataFrame, text_col: str = "text", k: int = 3
) -> DataFrame:
    """Expression-level TF-IDF with exact term weights: tf = in-doc term
    count, idf = ln(N / df). Returns the top-k terms per document
    (weight desc, term asc).

    Unlike MLlib's HashingTF (feature hashing, collisions, not
    inspectable) this keeps real terms — the form used for corpus
    diagnostics in data pipelines. Two shuffles: (doc, term) counts and
    the term document-frequency join; both map-side combinable.
    """
    from pyspark.sql import Window

    n_docs = df.count()  # scalar, one job; N is a plan literal afterwards
    terms = df.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    weighted = tf.join(dfreq, "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias(
            "weight"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("weight").desc(), F.col("term")
    )
    return (
        weighted.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "term", "weight", "rnk")
    )


def feature_hash_embedding(
    df: DataFrame,
    text_col: str = "text",
    dim: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashing-trick text embeddings (Weinberger et al. feature
    hashing, the signed HashingTF): each lowercase whitespace token
    lands in bucket ``md5[0:8] % dim`` with sign ``md5[8] % 2`` and the
    document's vector is the per-bucket signed count.

    ZERO shuffle: tokenize -> per-token (bucket, sign) structs -> ONE
    fold over the tokens into a dim-wide array accumulator — embedding
    a 100 TB corpus is a map-only pass, unlike the explode+groupBy+
    pivot shape (two shuffles). The single-fold structure matters as
    much as the zero-shuffle claim: a per-dimension ``transform(seq,
    i -> aggregate(pairs, ...))`` re-evaluates the pairs array (md5 per
    token!) once per output dimension — measured ~90x slower at dim=64.
    Here md5 runs once per token and the fold does O(dim) adds per
    token (branch-free except one equality). Deterministic and
    engine-portable, so the doc->embedding->similarity path is
    SQL-oracle-able exactly — and a deterministic stand-in where a real
    encoder model would run as a Pandas UDF at the same spot in the
    pipeline."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    pairs = F.transform(
        toks,
        lambda t: F.struct(
            (
                F.conv(F.substring(F.md5(t.cast("binary")), 1, 8), 16, 10)
                .cast("long")
                % dim
            ).alias("b"),
            F.when(
                F.conv(F.substring(F.md5(t.cast("binary")), 9, 1), 16, 10)
                .cast("long")
                % 2
                == 0,
                F.lit(1.0),
            )
            .otherwise(F.lit(-1.0))
            .alias("s"),
        ),
    )
    emb = F.aggregate(
        pairs,
        F.array_repeat(F.lit(0.0), dim),
        lambda acc, p: F.transform(
            acc,
            lambda x, i: x
            + F.when(i.cast("long") == p["b"], p["s"]).otherwise(F.lit(0.0)),
        ),
    )
    return df.select(F.col(id_col), emb.alias("embedding"))


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 100,
    overlap: int = 20,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the standard
    pre-training/RAG preparation step. Pure expressions: token split ->
    stride sequence -> per-start slice+join -> explode. Map-only (no
    shuffle); output is (doc_id, chunk_id, chunk_tokens, chunk_md5).

    Stride = chunk_tokens - overlap; the last chunk may be short; docs
    shorter than one chunk yield exactly one chunk.
    """
    stride = chunk_tokens - overlap
    assert stride > 0
    toks = F.split(F.col(text_col), r"\s+")
    n = F.size(toks)
    # last start: the largest multiple of stride strictly below n
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.ceil((n - F.lit(chunk_tokens)) / stride), F.lit(0)).cast(
            "int"
        )
        * stride,
        F.lit(stride),
    )
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.cast("long").alias("chunk_id"),
            F.array_join(
                F.slice(toks, s + 1, chunk_tokens), " "
            ).alias("chunk_text"),
        ),
    )
    exploded = df.select(
        "doc_id", F.explode(chunks).alias("c")
    ).select("doc_id", "c.chunk_id", "c.chunk_text")
    return exploded.select(
        "doc_id",
        "chunk_id",
        F.size(F.split("chunk_text", r"\s+")).cast("long").alias("chunk_tokens"),
        F.md5(F.col("chunk_text").cast("binary")).alias("chunk_md5"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over the normalized text (lowercased,
    whitespace collapsed). Deterministic across engines; the exact-dedup
    key."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return df.select(
        "doc_id", F.md5(F.trim(norm).cast("binary")).alias("fp")
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", n: int = 2, threshold: float = 0.2
) -> DataFrame:
    """Gopher-style repetition quality signal: the fraction of a
    document's n-grams occupied by its single most frequent n-gram
    (with multiplicity — unlike dedup.shingles, which is distinct-only).

    Shape: expression-built n-gram array -> explode -> (doc, gram) hash
    agg -> (doc) hash agg. Both aggregates are map-side combinable; the
    shuffle key is (doc_id, gram) then doc_id, so heavy repetition
    COMPRESSES in the first combine rather than skewing it."""
    from customer_segmentation_pyspark_spark.operators.dedup import (
        _spread,
        normalized,
    )

    toks = F.split(normalized(F.col(text_col)), " ")
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    g = _spread(df).select("doc_id", F.explode(grams).alias("gram"))
    per = g.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    out = per.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_grams"),
        F.round(F.max("c") / F.sum("c"), 4).alias("top_gram_frac"),
    )
    return out.withColumn(
        "repetitive", F.col("top_gram_frac") > F.lit(threshold)
    )


def fuzzy_edit1_pairs(df: DataFrame, col: str) -> DataFrame:
    """All distinct string pairs at Levenshtein distance exactly 1 —
    SymSpell-style: candidate pairs come from an equi-join on the
    single-character DELETION neighborhood (the string itself plus every
    one-char deletion), then the exact distance filter prunes false
    candidates.

    Completeness: two strings at edit distance 1 always share a deletion
    variant (substitution -> delete the differing position from both;
    insert/delete -> the shorter string IS a deletion of the longer), so
    the equi-join misses nothing.

    Scale shape: candidates are generated by ONE shuffle on the hash of
    the variant (groupBy + in-bucket array expansion) — O(total
    characters) shuffle keys instead of the O(V^2) all-pairs scan
    (which remains the ORACLE's job at fixture scale). This replaces
    an earlier variant-key SELF-JOIN, which shuffled and sort-merged
    both exploded sides; grouping shuffles the exploded frame once and
    expands pairs post-shuffle (measured 2x at sf0.1). Bucket skew is
    bounded by construction: a deletion variant of length L has at most
    ~(L+1)*|alphabet| possible source strings, so no hot key grows with
    corpus size and the collected bucket arrays stay small. The
    fuzzy-match step a typo-dedup / entity-resolution pipeline needs
    next to the exact and near-dup (MinHash) passes.
    """
    s = df.select(F.col(col).alias("s")).where(F.col("s").isNotNull()).distinct()
    variants = F.expr(
        "array_union(array(s), transform(sequence(1, length(s)),"
        " i -> concat(left(s, i-1), substring(s, i+1))))"
    )
    # bucket key = xxhash64(variant): an 8-byte bigint shuffles ~4x
    # cheaper than a 32-char md5 hex string, and a hash collision can
    # only ADD a candidate (removed by the exact-distance verify below),
    # never drop a true pair — equal variants always hash equal
    keyed = s.select(
        "s", F.explode(variants).alias("variant")
    ).select("s", F.xxhash64(F.col("variant")).alias("vh"))
    buckets = (
        keyed.groupBy("vh")
        .agg(F.array_sort(F.collect_set("s")).alias("ss"))
        .filter(F.size("ss") >= 2)
    )
    arr = F.col("ss")
    pair_structs = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + F.lit(2), F.size(arr)),
                lambda y: F.struct(
                    x.alias("name_a"), y.alias("name_b")
                ),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.name_a", "p.name_b")
        # verify BEFORE distinct: the exact-distance filter shrinks the
        # distinct's shuffle to true pairs only. threshold=1 switches
        # Spark to the BANDED DP with early exit — O(L) per candidate
        # instead of the O(L^2) full matrix (the verify dominated the
        # whole join: ~300M DP cells on the sf0.1 candidate set)
        .filter(F.levenshtein("name_a", "name_b", 1) == 1)
        .distinct()
    )


def char_entropy(text: Column) -> Column:
    """Character-level Shannon entropy in bits/char — the cheap
    gibberish/boilerplate signal a corpus-quality pass computes next to
    length and stopword ratios (low entropy = repeated filler, high =
    random noise).

    Zero-shuffle by construction: the histogram never leaves the row —
    no explode, no groupBy (which would shuffle a row PER CHARACTER).
    The counts come from ONE aggregate pass over the SORTED char array
    (run-length accumulation in a struct accumulator), so per-row cost
    is O(len log len) for the sort + O(len) lambda steps.  The previous
    distinct->filter-per-char formulation was O(distinct * len) lambda
    steps, and higher-order-function lambdas evaluate interpreted (not
    codegen'd), so that factor-of-distinct was real wall time.

    The lambda accumulates only sum(n_c * log2(n_c)) over runs — it must
    NOT reference the doc length: any outer expression captured in a
    lambda body is re-evaluated per element (a captured size(sort(split))
    makes the pass O(len^2 log len) — measured 4x slower than even the
    per-distinct-char scan).  The identity
    H = log2(n) - sum(n_c*log2(n_c))/n applies n once, outside."""
    chars = F.array_sort(F.split(text, ""))

    def clog(cnt):
        c = cnt.cast("double")
        # c*log2(c) with c in {0,1} contributing 0
        return F.when(c > 1.0, c * F.log2(c)).otherwise(F.lit(0.0))

    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("cnt"),
        F.lit(0.0).alias("acc"),
    )
    run_sum = F.aggregate(
        chars,
        acc0,
        lambda a, x: F.when(
            x == a["prev"],
            F.struct(
                a["prev"].alias("prev"),
                (a["cnt"] + 1).alias("cnt"),
                a["acc"].alias("acc"),
            ),
        ).otherwise(
            F.struct(
                x.alias("prev"),
                F.lit(1).alias("cnt"),
                (a["acc"] + clog(a["cnt"])).alias("acc"),
            )
        ),
        lambda a: a["acc"] + clog(a["cnt"]),
    )
    n = F.length(text).cast("double")
    return F.log2(n) - run_sum / n


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 ranked retrieval (Robertson/Sparck-Jones, the Okapi weighting
    every search engine ships) for one fixed term query; the ranked-list
    half of the IR stack whose index half is ``q_inverted_index``.

    Scale shape: the corpus-wide term explode is filtered to the query
    terms BEFORE any shuffle (an IN-list the scan pushes down post-
    explode), so shuffle volume is O(docs containing a query term), not
    O(total tokens). Doc lengths ride the same tokenization pass;
    (N, avgdl) is a broadcast scalar; per-term document frequencies are a
    broadcast dim. One doc_id-keyed shuffle joins tf to dl; the final
    top-k is TakeOrderedAndProject, never a global sort.

    Determinism: scores are rounded to 6 decimals before ranking (absorbs
    last-ulp libm ``ln`` differences between engines) and ties break on
    ascending id, so the ranked list is hash-exact vs the SQL oracle.
    """
    terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    ).filter(F.col("term") != "")
    dl = terms.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        terms.filter(F.col("term").isin(list(query_terms)))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    part = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("part"),
        )
    )
    return (
        part.groupBy("doc_id")
        .agg(F.round(F.sum("part"), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id"))
        .limit(k)
    )


def dsir_scores(
    docs: DataFrame,
    target: Column,
    n_buckets: int = 10_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, arXiv:2302.03169):
    importance weights from hashed-token bag-of-words models of a
    target subset vs the raw corpus. ``target`` is a boolean Column
    marking the in-domain rows; each doc scores
    sum_tokens[ ln p_target(bucket) - ln p_raw(bucket) ] with add-1
    smoothing, so ``log_ratio > 0`` means "more target-like than raw"
    — the resampling key for domain-matched pretraining selection.

    Scale shape: ONE token explode feeds both the bucket-count agg and
    the per-doc score; the bucket model is at most ``n_buckets`` rows
    (a broadcast dim, independent of corpus size) and the corpus
    totals ride a broadcast scalar. Two shuffles total (bucket agg,
    doc agg) — both map-side combinable. Hash buckets are md5-derived
    (engine-portable); scores round to 6 decimals so the cross-engine
    sum-order/libm wobble is absorbed and the output is hash-exact.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        target.alias("is_target"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("w"),
    ).filter(F.col("w") != "")
    tb = toks.select(
        "doc_id",
        "is_target",
        (
            F.conv(
                F.substring(F.md5(F.col("w").cast("binary")), 1, 8), 16, 10
            ).cast("bigint")
            % n_buckets
        ).alias("b"),
    )
    counts = tb.groupBy("b").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("ct"),
        F.count(F.lit(1)).alias("cr"),
    )
    tot = counts.agg(
        F.sum("ct").alias("tt"),
        F.sum("cr").alias("tr"),
    )
    nb = F.lit(float(n_buckets))
    weights = counts.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("ct") + F.lit(1.0)) / (F.col("tt") + nb))
            - F.log((F.col("cr") + F.lit(1.0)) / (F.col("tr") + nb))
        ).alias("lw"),
    )
    return (
        tb.join(F.broadcast(weights), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("lw"), 6).alias("log_ratio"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "log_ratio",
            (F.col("log_ratio") > 0).alias("selected"),
        )
    )


def bpe_pair_counts(
    docs: DataFrame, top: int = 20, text_col: str = "text"
) -> DataFrame:
    """The first iteration of BPE tokenizer training (Sennrich et al.
    2016): corpus-wide adjacent-symbol-pair frequencies, the statistic
    the merge rule greedily maximizes. Symbols here are characters
    within whitespace words (the standard BPE pre-tokenization).

    Scale shape: pair generation happens on the DISTINCT-word table
    weighted by word frequency — the heavy explode runs over the
    vocabulary (sublinear in corpus size, Zipf caps it), not the raw
    token stream; at 100 TB that is the difference between exploding
    ~1e6 vocab entries and ~1e13 tokens. One agg builds the vocab
    (map-side combinable), one agg sums pair weights, and the top-k is
    TakeOrderedAndProject. Exact integer counts — hash-exact oracle.
    """
    words = docs.select(
        F.explode(tokens(F.lower(F.col(text_col)))).alias("w")
    ).filter(F.length("w") >= 2)
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    pairs = vocab.select(
        "n",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair"))
        .limit(top)
    )


def bigram_interpolated_ce(
    docs: DataFrame,
    lam: float = 0.7,
    uni_lam: float = 0.3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Interpolated bigram-LM cross-entropy per document (the KenLM-
    shape quality filter one step up from the unigram LM): corpus-
    trained bigram + unigram models, p = lam*P(w2|w1) +
    uni_lam*P(w2), per-doc cross-entropy over bigram positions.
    Returns ``(doc_id, n_bigrams, ce)`` with ce UNROUNDED — callers
    (q_bigram_ppl, the property twin test) choose their own rounding.
    ``uni_lam`` is an explicit literal rather than 1-lam so the float
    matches the oracle's 0.3 exactly (1.0-0.7 is 0.30000000000000004).

    Scale shape: token positions come from ONE posexplode; the bigram
    stream is a `lead` window keyed by doc (one shuffle, reused by the
    per-doc agg); LM tables join ON key with map-side-combinable
    counts first, so shuffles carry distinct (doc,bigram) /
    (bigram,count) rows, never raw tokens. The corpus total rides a
    broadcast 1-row join. At 100 TB both LM tables stay distributed
    (never collected)."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(F.lower(F.col(text_col)), r"\s+")
        ).alias("pos", "term"),
    ).filter(F.col("term") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        toks.withColumn("nxt", F.lead("term").over(w))
        .filter(F.col("nxt").isNotNull())
        .select("doc_id", "term", "nxt")
    )
    bf = big.groupBy("doc_id", "term", "nxt").agg(
        F.count(F.lit(1)).alias("bf")
    )
    bigram_lm = bf.groupBy("term", "nxt").agg(
        F.sum("bf").alias("bcnt")
    )
    ctx = bigram_lm.groupBy("term").agg(F.sum("bcnt").alias("ccnt"))
    uni = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("ucnt"))
        .withColumnRenamed("term", "nxt")
    )
    total = uni.agg(F.sum("ucnt").alias("total"))
    return (
        bf.join(bigram_lm, ["term", "nxt"])
        .join(ctx, "term")
        .join(uni, "nxt")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "p",
            lam * F.col("bcnt") / F.col("ccnt")
            + uni_lam * F.col("ucnt") / F.col("total"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("bf").cast("bigint").alias("n_bigrams"),
            (-F.sum(F.col("bf") * F.log("p")) / F.sum("bf")).alias(
                "ce"
            ),
        )
    )


def _merge_adjacent(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping merge of the adjacent symbol
    pair (left, right) inside a symbol array — the BPE merge-rule
    application (Sennrich et al. 2016 §3.2), as a single Catalyst
    ``aggregate`` fold (no Python UDF): the accumulator carries the
    output list plus one pending symbol; 'aaa' + (a,a) -> ['aa','a'],
    exactly the reference greedy semantics."""
    merged = left + right

    def step(acc: Column, s: Column) -> Column:
        return F.when(
            (acc["carry"] == F.lit(left)) & (s == F.lit(right)),
            F.struct(
                F.array_append(acc["out"], F.lit(merged)).alias("out"),
                F.lit(None).cast("string").alias("carry"),
            ),
        ).otherwise(
            F.struct(
                F.when(acc["carry"].isNull(), acc["out"])
                .otherwise(F.array_append(acc["out"], acc["carry"]))
                .alias("out"),
                s.alias("carry"),
            )
        )

    return F.aggregate(
        syms,
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(None).cast("string").alias("carry"),
        ),
        step,
        lambda acc: F.when(acc["carry"].isNull(), acc["out"]).otherwise(
            F.array_append(acc["out"], acc["carry"])
        ),
    )


def bpe_learn(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    spark=None,
) -> "DataFrame":
    """Full BPE tokenizer training: iterate ``n_merges`` rounds of
    (count adjacent symbol pairs over the frequency-weighted vocabulary
    -> pick the most frequent pair, ties by (left, right) asc -> apply
    the merge greedily left-to-right). Returns the learned merge table
    ``(step, left, right, merged, pair_count)`` — the tokenizer
    artifact shipped to the training pipeline.

    Scale shape (same argument as ``bpe_pair_counts``): every round
    runs over the DISTINCT-word vocabulary weighted by corpus
    frequency, so the per-round cost is O(vocab * word_len) — Zipf
    keeps the vocab sublinear in corpus size, and the 100 TB corpus is
    touched exactly once (the initial vocab agg). The merge applier is
    a codegen'd ``aggregate`` fold (no UDF); each round is one
    pair-count agg + one 1-row ``TakeOrderedAndProject`` collect (the
    same driver-synchronous scalar-per-round pattern as Lloyd's /
    PageRank), and the vocab is ``localCheckpoint``-ed per round to
    bound lineage. Reference analogue: iterative driver loop at
    codeText.txt:129 (K-means rounds); same engine contract.
    """
    spark = spark or docs.sparkSession
    vocab = (
        docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "n",
            # split("", limit=-1) keeps a trailing "" element — drop it
            F.array_remove(F.split(F.col("w"), "(?!^)"), "").alias(
                "syms"
            ),
        )
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for step_no in range(1, n_merges + 1):
        pairs = vocab.filter(F.size("syms") >= 2).select(
            "n",
            F.explode(
                F.transform(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    lambda s, i: F.struct(
                        s.alias("l"),
                        F.element_at(F.col("syms"), i + 2).alias("r"),
                    ),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((step_no, left, right, left + right, cnt))
        vocab = vocab.select(
            "n", _merge_adjacent(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges,
        "step bigint, left string, right string, merged string, "
        "pair_count bigint",
    )


def winnowing_fingerprints(
    docs: DataFrame,
    k: int = 8,
    w: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS algorithm): hash every character k-gram, slide a window of
    ``w`` consecutive hashes, keep each window's minimum — guaranteeing
    any shared substring of length >= k + w - 1 yields a shared
    fingerprint, with ~2/(w+1) selection density.

    Scale shape: k-grams explode to rows (posexplode keeps the offset),
    each hashes in the same codegen'd projection, and the sliding-window
    minima are ONE doc-keyed window pass (rowsBetween(0, w-1)); the
    per-doc rollup reuses that partitioning, so the whole operator costs
    one shuffle and is linear in corpus characters. Output is one
    constant-width row per doc (count + digest; the raw fingerprint set
    would stream to an index sink keyed by fingerprint for the cross-doc
    match join). md5-derived hashes keep it engine-portable.

    (Deliberately NOT a nested array-HOF pipeline: Catalyst inlines a
    referenced array expression into every element of the consuming
    ``transform``, turning windows-over-grams into O(len*w*len)
    recomputation per row — measured minutes vs seconds on the 500-doc
    fixture.)
    """
    from pyspark.sql import Window

    nt = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    grams = F.when(
        F.length(nt) >= k,
        F.transform(
            F.sequence(F.lit(1), F.length(nt) - (k - 1)),
            lambda i: nt.substr(i, F.lit(k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode_outer(grams)
    ).select(
        "doc_id",
        F.col("pos"),
        F.conv(
            F.substring(F.md5(F.col("col").cast("binary")), 1, 12), 16, 10
        )
        .cast("bigint")
        .alias("h"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    n_win = Window.partitionBy("doc_id")
    mins = ex.filter(F.col("pos").isNotNull()).select(
        "doc_id",
        "pos",
        F.count("pos").over(n_win).alias("n_grams"),
        F.min("h").over(win).alias("wmin"),
    ).filter(F.col("pos") <= F.col("n_grams") - w)
    fps = mins.groupBy("doc_id", "n_grams").agg(
        F.array_sort(F.collect_set("wmin")).alias("fps")
    )
    # posexplode_outer keeps empty/short docs as a NULL-pos row so they
    # surface with zero grams instead of vanishing; docs shorter than
    # k + w - 1 chars have grams but no full window -> also zero prints
    few = (
        ex.groupBy("doc_id")
        .agg(F.count("pos").alias("n_grams"))
        .filter(F.col("n_grams") < w)
        .select(
            "doc_id",
            "n_grams",
            F.array().cast("array<bigint>").alias("fps"),
        )
    )
    return fps.unionByName(few).select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.size("fps").cast("long").alias("n_fingerprints"),
        F.md5(
            F.array_join(
                F.transform(F.col("fps"), lambda x: x.cast("string")), ","
            ).cast("binary")
        ).alias("fp_md5"),
    )


def quality_classifier(
    feats: DataFrame, weights: dict[str, float]
) -> DataFrame:
    """Linear quality gate over ``quality_features`` output — the
    fastText-classifier-shaped filter every corpus pipeline runs (CCNet/
    RefinedWeb style), with plan-literal weights so the whole scorer is
    one codegen'd projection (swap in learned weights the same way the
    K-means plan splices trained centroids).

    score = sigmoid(b + w·x) with x = (ln n_chars, n_tokens,
    avg_token_len, punct_ratio, stopword_ratio); ``keep`` compares the
    raw logit to 0 (exact — no rounding boundary), score is rounded for
    the hash-stable report."""
    z = (
        F.lit(weights["bias"])
        + F.lit(weights["ln_chars"]) * F.log(F.col("n_chars_calc"))
        + F.lit(weights["n_tokens"]) * F.col("n_tokens")
        + F.lit(weights["avg_token_len"]) * F.col("avg_token_len")
        + F.lit(weights["punct_ratio"]) * F.col("punct_ratio")
        + F.lit(weights["stopword_ratio"]) * F.col("stopword_ratio")
    )
    return feats.select(
        "doc_id",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("score"),
        (z > 0).alias("keep"),
    )


def hash_embedding(
    docs: DataFrame,
    dim: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Feature-hashing text embedding (hashing-trick bag of words with
    random signs — Weinberger et al. 2009): dimension d accumulates ±1
    per token by the d-th hex digit of the token's md5, then the vector
    is L2-normalized. The cheapest text->vector bridge: deterministic,
    vocabulary-free, engine-portable, and good enough to feed the ANN /
    semantic-dedup operators when no model embeddings exist.

    Scale shape: one token explode -> ONE map-side-combinable agg with
    ``dim`` conditional sums (exact integers) -> normalize in the final
    projection. Shuffle volume is docs x dim, independent of token
    count."""
    assert dim <= 32  # md5 has 32 hex digits
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("w"),
    ).filter(F.col("w") != "")
    h = F.md5(F.col("w").cast("binary"))
    sums = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        *[
            F.sum(
                F.when(
                    F.substring(h, d + 1, 1).isin(
                        "8", "9", "a", "b", "c", "d", "e", "f"
                    ),
                    1,
                ).otherwise(-1)
            )
            .cast("double")
            .alias(f"s{d}")
            for d in range(dim)
        ],
    )
    nrm = None
    for d in range(dim):
        t = F.col(f"s{d}") * F.col(f"s{d}")
        nrm = t if nrm is None else nrm + t
    nrm = F.sqrt(nrm)
    return sums.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        *[
            F.round(
                F.when(nrm == 0, F.lit(0.0)).otherwise(F.col(f"s{d}") / nrm),
                6,
            ).alias(f"e{d}")
            for d in range(dim)
        ],
    )


def preference_pairs(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    score: Column | None = None,
) -> DataFrame:
    """RLHF/DPO preference-pair construction: per group, the best-scored
    row becomes ``chosen`` and the worst becomes ``rejected``.

    ONE aggregation, no window sort: chosen rides max(struct(score,
    -id)) and rejected min(struct(score, id)) — lexicographic struct
    ordering gives max-score-then-lowest-id / min-score-then-lowest-id
    tie-breaks with a single map-side-combinable shuffle (contrast the
    two-window formulation: two full partition sorts). Groups with only
    one distinct row still emit a pair with gap 0 — filter on
    ``score_gap > 0`` for training."""
    s = (score if score is not None else token_count(F.col("text"))).cast(
        "long"
    )
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("id"),
        s.alias("s"),
    )
    agg = base.groupBy("grp").agg(
        F.max(F.struct(F.col("s"), (-F.col("id")).alias("nid"))).alias("mx"),
        F.min(F.struct(F.col("s"), F.col("id"))).alias("mn"),
    )
    return agg.select(
        F.col("grp").alias(group_col),
        (-F.col("mx.nid")).cast("long").alias("chosen_id"),
        F.col("mx.s").alias("chosen_score"),
        F.col("mn.id").cast("long").alias("rejected_id"),
        F.col("mn.s").alias("rejected_score"),
        (F.col("mx.s") - F.col("mn.s")).alias("score_gap"),
    )


def ngram_novelty(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Memorization/contamination eval: deterministically split the
    corpus into train/eval halves (md5(id) parity — the engine's
    standard seedless split), then score each EVAL doc by the fraction
    of its distinct word n-grams never seen in ANY train doc
    ("novelty"; 0 = fully memorizable from train, 1 = fully novel).

    Scale shape: shingle explode is linear; the train shingle
    vocabulary is a distinct agg; membership is a left join on the
    shingle key (linear, no pair expansion) followed by one per-doc
    agg. A stop-shingle present in every train doc costs one vocab row,
    not a blowup — the join output stays one row per eval-doc shingle.
    """
    from customer_segmentation_pyspark_spark.operators.dedup import shingles

    sh = shingles(df, text_col=text_col, n=n)
    is_train = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 32, 1), 16, 10)
        .cast("int")
        % 2
        == 0
    )
    sh = sh.withColumn("is_train", is_train)
    train_vocab = (
        sh.filter(F.col("is_train")).select("shingle").distinct()
        .withColumn("seen", F.lit(1))
    )
    ev = sh.filter(~F.col("is_train")).join(train_vocab, "shingle", "left")
    return (
        ev.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.when(F.col("seen").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_shingles"), 4).alias(
                "novelty"
            ),
        )
    )


def curriculum_order(
    df: DataFrame,
    stages: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Curriculum data ordering: rank docs by a difficulty proxy (mean
    token length — long words ~ harder text), cut into ``stages``
    ntiles (easy -> hard), and give each doc a deterministic position
    within its stage by hash (so the within-stage order is a seedless
    shuffle, reproducible across engines and runs).

    Two window passes over (difficulty, id) and (stage, hash) orderings
    — at corpus scale swap the global ntile for a quantile-boundary
    broadcast (computed once) to avoid the single-ordering sort; the
    output contract is identical."""
    from pyspark.sql import Window

    toks = tokens(F.lower(F.col(text_col)))
    difficulty = F.round(
        F.length(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", ""))
        / F.greatest(F.size(toks), F.lit(1)),
        4,
    )
    base = df.select(
        F.col(id_col),
        difficulty.alias("difficulty"),
        F.md5(F.col(id_col).cast("string")).alias("h"),
    )
    w_diff = Window.orderBy(F.col("difficulty").asc(), F.col(id_col).asc())
    staged = base.withColumn(
        "stage", F.ntile(stages).over(w_diff).cast("long")
    )
    w_pos = Window.partitionBy("stage").orderBy(
        F.col("h").asc(), F.col(id_col).asc()
    )
    return staged.select(
        id_col,
        "difficulty",
        "stage",
        F.row_number().over(w_pos).cast("long").alias("position"),
    )
