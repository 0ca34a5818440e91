"""Similarity search over embedding columns (array<float>).

Two paths, per SURVEY.md §7.1 M5 / the north star:
  * brute-force cosine top-k — the exact baseline: broadcast the (small)
    query set, score every corpus vector with a codegen'd expression,
    take top-k per query with a window. Cost is |Q|·|corpus| dot products
    distributed over executors — correct at any corpus size when |Q| is
    bounded.
  * LSH-bucketed ANN (random-hyperplane signs) — the scale path: corpus is
    hashed once into buckets; queries probe only their bucket, so the join
    is an equi-join on the signature, linear-ish in corpus size.

No UDFs anywhere: dot products are zip_with+aggregate expressions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.functions.arrays import (
    cosine_similarity,
    dot,
)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is expected to be small (it is broadcast); corpus can be
    arbitrarily large. Ties broken by neighbor id for determinism.
    Excludes self-matches (same id).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("qv"), F.col("cv")), 4).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def hyperplane_signatures(
    df: DataFrame,
    planes: Sequence[Sequence[float]],
    bits_per_table: int,
    vec_col: str,
) -> DataFrame:
    """Multi-table random-hyperplane LSH: chunk ``planes`` into L tables of
    ``bits_per_table`` each; emit one row per (input row, table) with the
    packed bucket signature. Planes are driver-supplied (seeded NumPy)
    literal arrays — constants in the plan, broadcast for free.

    Multiple small tables beat one big table on recall: candidate set is
    the UNION over tables, so P(found) = 1-(1-p^b)^L instead of p^(b·L).
    """
    assert len(planes) % bits_per_table == 0
    v = _as_double(F.col(vec_col))
    tables = []
    for t in range(len(planes) // bits_per_table):
        sig = F.lit(0).cast("long")
        for i in range(bits_per_table):
            plane = planes[t * bits_per_table + i]
            parr = F.array(*[F.lit(float(x)) for x in plane])
            sig = sig + F.when(dot(v, parr) >= 0, F.lit(2**i)).otherwise(F.lit(0))
        tables.append(
            F.struct(F.lit(t).alias("table_id"), sig.cast("long").alias("sig"))
        )
    return df.withColumn("lsh", F.explode(F.array(*tables))).select(
        *df.columns, F.col("lsh.table_id").alias("table_id"), F.col("lsh.sig").alias("sig")
    )


def _train_cells_sample_numpy(
    c: DataFrame, n_cells: int, train_rows: int, seed: int
) -> list[list[float]] | None:
    """FAISS-style coarse-quantizer training: a bounded, deterministic
    pseudo-random sample (order by xxhash64(id), limit) collected to the
    driver — train_rows x dim doubles, a few MB by construction — then
    in-memory seeded Lloyd. Quantizer quality needs only a sample; the
    100 TB corpus never moves. Returns None on an empty corpus."""
    import numpy as np

    pdf = (
        c.select("cv", F.xxhash64(F.col("neighbor_id")).alias("h"))
        .orderBy("h")
        .limit(train_rows)
        .select("cv")
        .toPandas()
    )
    if pdf.empty:
        return None
    pts = np.stack(pdf["cv"].to_numpy()).astype(np.float64)
    rng = np.random.RandomState(seed)
    n = len(pts)
    kk = min(n_cells, n)
    cents = pts[rng.choice(n, size=kk, replace=False)].copy()
    for _ in range(20):
        d = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        new = np.stack(
            [
                pts[assign == j].mean(0) if (assign == j).any() else cents[j]
                for j in range(kk)
            ]
        )
        if np.allclose(new, cents):
            break
        cents = new
    return [[float(x) for x in row] for row in cents]


def ivf_topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 16,
    n_probe: int = 4,
    k: int = 5,
    train_fraction: float = 1.0,
    seed: int = 42,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trainer: str = "sample_numpy",
    train_rows: int = 4096,
    cells: Sequence[Sequence[float]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize the corpus with K-means
    cells, probe each query's ``n_probe`` nearest cells, exact-rescore.

    Training (``trainer``):
      * ``sample_numpy`` (default) — the FAISS-shape scale path: the
        quantizer trains on a bounded deterministic sample driver-side
        (see ``_train_cells_sample_numpy``); only ``train_rows`` vectors
        ever leave the cluster. 100x faster than distributed Lloyd on
        high-dim inputs, and quantizer quality only needs a sample.
      * ``engine`` — plans.kmeans trains distributed on
        ``train_fraction`` of the corpus with this engine's own Lloyd
        loop (parity path; cost grows with dim * n_cells expression
        width).

    Either way the corpus-side work is distributed and linear: cell
    assignment is a pure projection against plan-literal centers, the
    probe is an equi-join on cell id, and only ~|corpus|·n_probe/n_cells
    candidates are rescored per query. Tune recall with n_probe.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    )
    if cells is not None:
        # pre-trained / fixed coarse quantizer: the centers are plan
        # literals supplied by the caller (production shape: train once on
        # a sample, reuse across every probe query) — and the whole IVF
        # path becomes deterministic enough to SQL-oracle exactly.
        cells = [list(map(float, cent)) for cent in cells]
    elif trainer == "sample_numpy":
        cells = _train_cells_sample_numpy(c, n_cells, train_rows, seed)
        if cells is None:
            return corpus.sparkSession.createDataFrame(
                [], "query_id long, neighbor_id long, cos_sim double, rank int"
            )
    else:
        assert trainer == "engine", trainer
        from customer_segmentation_pyspark_spark.plans.kmeans import kmeans

        train = (
            c if train_fraction >= 1.0 else c.sample(train_fraction, seed=seed)
        )
        first = train.select("cv").first()
        if first is None:
            # empty corpus (or empty train sample): same contract as
            # brute_force_topk — an empty result, not a TypeError
            return corpus.sparkSession.createDataFrame(
                [], "query_id long, neighbor_id long, cos_sim double, rank int"
            )
        dim = len(first["cv"])
        res = kmeans(
            train.select(F.col("cv").alias("point")).select(
                *[F.col("point").getItem(i).alias(f"f{i}") for i in range(dim)]
            ),
            [f"f{i}" for i in range(dim)],
            k=n_cells,
            max_iter=max_iter,
            seed=seed,
        )
        cells = res.centroids
    n_probe = min(n_probe, len(cells))

    def cell_dists(vec: Column) -> Column:
        from customer_segmentation_pyspark_spark.functions.arrays import (
            array_lit,
            sq_dist,
        )

        return F.array(*[sq_dist(vec, array_lit(cent)) for cent in cells])

    from customer_segmentation_pyspark_spark.functions.arrays import array_argmin

    tagged = c.withColumn("cell", array_argmin(cell_dists(F.col("cv"))))

    # each query probes its n_probe nearest cells: rank cell distances via
    # sorted (dist, idx) structs — pure expressions, no UDF
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    ranked = F.slice(
        F.array_sort(
            F.zip_with(
                cell_dists(F.col("qv")),
                F.sequence(F.lit(0), F.lit(len(cells) - 1)),
                lambda d, i: F.struct(d.alias("d"), i.alias("cell")),
            )
        ),
        1,
        n_probe,
    )
    probes = q.withColumn(
        "cell", F.explode(F.transform(ranked, lambda s: s["cell"]))
    )
    scored = (
        tagged.join(F.broadcast(probes), on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_similarity(F.col("qv"), F.col("cv")), 4
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def lsh_topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    planes: Sequence[Sequence[float]],
    k: int = 5,
    bits_per_table: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: probe the query's bucket in each LSH table, union the
    candidates, exact-rescore, take top-k.

    Recall < 1.0 by construction (tune L = len(planes)/bits_per_table and
    bits_per_table); at 100 TB this replaces the |Q|·|corpus| scan with an
    equi-join on (table_id, sig) — shuffle partitioned by bucket, linear in
    corpus size. Verify recall against brute_force_topk on a sample.
    """
    csig = hyperplane_signatures(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        ),
        planes,
        bits_per_table,
        vec_col="cv",
    )
    qsig = hyperplane_signatures(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        ),
        planes,
        bits_per_table,
        vec_col="qv",
    )
    candidates = (
        csig.join(F.broadcast(qsig), on=["table_id", "sig"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = candidates.select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine_similarity(_as_double(F.col("qv")), _as_double(F.col("cv"))),
            4,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def rrf_fuse(
    ranked_lists: Sequence[DataFrame],
    k_const: int = 60,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N ranked lists —
    the standard hybrid-retrieval combiner (lexical BM25 + dense cosine
    in the RAG stack). Each input holds (id_col, rank); a doc absent
    from a list simply contributes nothing for it.

    Scale shape: inputs are top-k lists (tiny by construction — each
    produced by TakeOrderedAndProject upstream), so the union + one
    hash agg + final TakeOrdered is bounded by N*k rows regardless of
    corpus size. Score = sum over lists of 1/(k_const + rank), rounded
    to 6 so the fused ordering is hash-exact vs a SQL replay.
    """
    from functools import reduce

    contribs = [
        r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k_const)) + F.col("rank"))).alias(
                "contrib"
            ),
        )
        for r in ranked_lists
    ]
    u = reduce(DataFrame.unionByName, contribs)
    return (
        u.groupBy(id_col)
        .agg(
            F.round(F.sum("contrib"), 6).alias("rrf_score"),
            F.count(F.lit(1)).cast("long").alias("n_lists"),
        )
        .orderBy(F.col("rrf_score").desc(), F.col(id_col))
        .limit(k)
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training (the DPR/SimCSE
    data-prep step): for each query vector, the top-k most cosine-similar
    corpus vectors with a DIFFERENT label — maximally confusing
    negatives, which train far better than random ones.

    Same scale shape as ``brute_force_topk``: broadcast the bounded query
    set, one codegen'd scoring pass over the corpus, per-query top-k via
    window over the scored (still corpus-sized, pre-top-k) frame. The
    label inequality rides the broadcast-join condition so excluded rows
    never reach the window. Swap the scoring pass for the IVF/LSH probe
    when the corpus outgrows brute force (same contract).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("q_label"),
        _as_double(F.col(vec_col)).alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neg_label"),
        _as_double(F.col(vec_col)).alias("cv"),
    )
    scored = c.join(
        F.broadcast(q),
        (F.col("neighbor_id") != F.col("query_id"))
        & (F.col("neg_label") != F.col("q_label")),
    ).select(
        "query_id",
        "neighbor_id",
        F.col("neg_label").cast("long").alias("neg_label"),
        F.round(cosine_similarity(F.col("qv"), F.col("cv")), 4).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "neg_label", "cos_sim", "rank")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: Sequence[Sequence[Sequence[float]]],
    k: int = 5,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_driver_queries: int = 10_000,
) -> DataFrame:
    """Product-quantization ANN with exact rescore (Jegou et al. 2011):
    split each vector into M subvectors, quantize each against its own
    K-entry literal codebook (first-min argmin), take a ``shortlist`` of
    candidates per query by asymmetric distance (exact query subvector
    vs the neighbor's quantized code), then rescore the shortlist with
    the exact distance and keep top-k.

    This is the 100 TB storage path the IVF/LSH probes pair with: the
    corpus collapses to M small ints per vector (16 codes vs 256 bytes
    of floats), encode is a one-pass projection over the corpus, and
    the ADC scan is 16 array lookups per pair against a per-query
    distance TABLE (the classic PQ trick): each query precomputes its
    256 subspace-to-centroid distances ONCE (|Q| rows, broadcast), so
    the corpus-sized scan never re-evaluates a distance expression.
    Raw vectors are re-fetched (equi-join on id, broadcast shortlist)
    solely for the |Q|*S rescore pairs. Codebooks are plan literals
    trained offline on a distribution-matched sample (production: the
    engine's own kmeans over a corpus sample, spliced in like the IVF
    cells). Recall@5 ~0.9 on the weakly-clustered fixture (tested vs
    brute force).

    Implementation notes (SCALE.md plan-literal cost model): every
    expression ships as ONE selectExpr string (a py4j crossing per
    element otherwise); per-element arithmetic with inline casts, no
    transform() pre-cast (Catalyst collapses projections, so a
    transform'd alias re-inlines the whole 64-element lambda into
    every element_at reference) and no zip_with/aggregate lambdas
    (never codegen'd).
    """
    n_sub = len(codebooks)
    n_codes = len(codebooks[0])
    sub_dim = len(codebooks[0][0])

    def score(vec: str, m: int, cent: Sequence[float]) -> str:
        # ||x-c||^2 rewritten as <c,c> - 2<x,c> (the ||x||^2 term is
        # constant within a subspace's argmin and within a query's ADC
        # table, so it cancels for both uses): HALF the expression size
        # and arithmetic of the squared-difference form. The SQL oracle
        # uses the identical formula, so the floats — and therefore the
        # argmin/shortlist decisions — match bit-for-bit.
        cc = 0.0
        for x in cent:
            cc += float(x) * float(x)
        dot2 = " + ".join(
            f"cast(element_at({vec}, {m * sub_dim + j + 1}) as double)"
            f" * ({2.0 * float(x)!r})"
            for j, x in enumerate(cent)
        )
        return f"({cc!r} - ({dot2}))"

    cvx = corpus.selectExpr(f"{id_col} as neighbor_id", f"{vec_col} as cv")
    lists = cvx.selectExpr(
        "neighbor_id",
        *[
            "array("
            + ", ".join(f"({score('cv', m, cent)})" for cent in cb)
            + f") as l{m}"
            for m, cb in enumerate(codebooks)
        ],
    )
    enc = lists.selectExpr(
        "neighbor_id",
        *[
            f"cast(array_position(l{m}, array_min(l{m})) - 1 as int) as c{m}"
            for m in range(n_sub)
        ],
    )

    # per-query ADC distance table: entry m*K + k = sqdist(q_sub_m, cb[m][k]).
    # r04: for a bounded query set (the interactive top-k contract; guard
    # max_driver_queries) the |Q| x M*K table is computed DRIVER-side from
    # collected query vectors — the arithmetic below replays the score()
    # expression term-for-term (left-associative, float32->double exact
    # casts), so every table entry is bit-identical to the expression
    # path and the SQL oracle, while the plan drops ~half its literal
    # expression mass (measured: -2s fixed cost per call — parse +
    # codegen of 256 score exprs). Past the guard (batch kNN with a huge
    # query side) the original distributed projection kicks in.
    # single evaluation of the queries plan: collect guard+1 rows, then
    # branch on the count; centroid-only terms (cc self-dots, doubled
    # coordinates) are hoisted out of the per-query loop — both identical
    # arithmetic to the expression path, just not recomputed per query
    qrows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).limit(max_driver_queries + 1).collect()
    if len(qrows) <= max_driver_queries:
        flat_cbs = [
            (m, [float(x) for x in cent])
            for m, cb in enumerate(codebooks)
            for cent in cb
        ]
        ccs = []
        twices = []
        for _m, cent in flat_cbs:
            cc = 0.0
            for x in cent:
                cc += x * x
            ccs.append(cc)
            twices.append([2.0 * x for x in cent])
        tab_rows = []
        for r in qrows:
            qv = r["qv"]
            dtab = []
            for (m, _cent), cc, tw in zip(flat_cbs, ccs, twices):
                # NULL propagation mirrors the expression path (r05,
                # ADVICE): a NULL vector or NULL element makes the
                # whole sub-distance NULL (SQL arithmetic), never a
                # driver-side TypeError — behavior must not diverge
                # across the max_driver_queries threshold on dirty data
                if qv is None or any(
                    qv[m * sub_dim + j] is None for j in range(len(tw))
                ):
                    dtab.append(None)
                    continue
                dot2 = 0.0
                for j, tx in enumerate(tw):
                    dot2 += float(qv[m * sub_dim + j]) * tx
                dtab.append(cc - dot2)
            tab_rows.append((r["query_id"], dtab))
        spark = queries.sparkSession
        qtab = spark.createDataFrame(
            tab_rows, f"query_id {queries.schema[id_col].dataType.simpleString()}, dtab array<double>"
        )
    else:
        qtab = queries.selectExpr(
            f"{id_col} as query_id",
            "array("
            + ", ".join(
                f"({score(vec_col, m, cent)})"
                for m, cb in enumerate(codebooks)
                for cent in cb
            )
            + ") as dtab",
        )
    joined = enc.join(
        F.broadcast(qtab), F.col("neighbor_id") != F.col("query_id")
    )
    adc = " + ".join(
        f"element_at(dtab, {m * n_codes} + c{m} + 1)" for m in range(n_sub)
    )
    adc_scored = joined.selectExpr(
        "query_id", "neighbor_id", f"round({adc}, 6) as adc_dist"
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    short = (
        adc_scored.withColumn("adc_rank", F.row_number().over(w_adc))
        .filter(F.col("adc_rank") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    # exact rescore on the bounded |Q|*shortlist candidate set: fetch the
    # raw vectors back by id (broadcast the tiny shortlist), then rank by
    # true squared distance
    exact = " + ".join(
        f"(cast(element_at(qv, {i}) as double)"
        f" - cast(element_at(cv, {i}) as double))"
        f" * (cast(element_at(qv, {i}) as double)"
        f" - cast(element_at(cv, {i}) as double))"
        for i in range(1, sub_dim * n_sub + 1)
    )
    q = queries.selectExpr(f"{id_col} as query_id", f"{vec_col} as qv")
    cand = F.broadcast(short).join(cvx, "neighbor_id")
    rescored = cand.join(F.broadcast(q), "query_id").selectExpr(
        "query_id", "neighbor_id", f"round({exact}, 6) as dist"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dist", "rank")
    )
