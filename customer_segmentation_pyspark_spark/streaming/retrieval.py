"""Maintained BM25 retrieval index (r08, capstone #16): the lexical
half of the RAG stack as INCREMENTALLY MAINTAINED state, composed
entirely from existing engine parts — no new index machinery:

* **postings** — an ordinary partitioned MERGE table, one row per
  (term, doc) with tf and the doc's token count, keyed by the
  ``term:doc`` surrogate and maintained from the corpus CDF: a doc's
  post-image re-emits all its postings (upsert), and pre-image terms
  absent from the post-image tombstone — O(|Δdocs| x terms/doc) per
  sync, never a corpus rescan.
* **term locality** — the secondary column index
  (`streaming/colindex.py`) on the postings' ``term`` column gives
  query-term reads a partition-pruned, STALE-EXACT path (changed
  partitions union in, so the index may lag the postings arbitrarily).
* **df** — the merge-backed aggregate view (`streaming/views.py:
  sync_agg_merge_view`) over the postings table's OWN CDF: n_rows per
  term IS the document frequency, point-readable per query term.
* **(N, avgdl)** — the swap-style COUNT/SUM view over the corpus CDF
  with token count as the value; the query aggregates its few group
  rows to scalars.

Query evaluation then touches O(query terms) state: postings of the
query's terms (pruned read), their df rows (point-read), the tiny
stats view — and runs the standard BM25 arithmetic (identical
constants and tokenizer to `operators/textops.py:bm25_topk`, so the
DuckDB oracle replays it exactly).

At 100 TB: every maintenance step is O(its delta) (the cascade
argument — each layer consumes the previous layer's CDF), the hot
query path reads only term-pruned partitions, and the one global
state (N, avgdl) is a dashboard-sized view. The reference has no
retrieval surface (SURVEY.md: a k-means notebook); engine surface for
the LLM-pipeline north star.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.streaming.views import (
    _write_marker,
    view_src_version,
)

PKEY = "__pkey"


def _tokens(text_col):
    """lower + whitespace split + drop empties — byte-identical to the
    bm25_topk oracle's string_split_regex(lower(text), '\\s+')."""
    return F.filter(
        F.split(F.lower(text_col), r"\s+"), lambda x: x != ""
    )


def token_count(text_col):
    """The doc-length measure BM25 uses (exposed for the stats view)."""
    return F.size(_tokens(text_col))


def _postings_of(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = _tokens(F.col(text_col))
    exploded = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("dl"),
        F.explode(toks).alias("term"),
    )
    return exploded.groupBy(id_col, "term", "dl").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )


def _with_pkey(p: DataFrame, id_col: str) -> DataFrame:
    return p.withColumn(
        PKEY,
        F.concat(
            F.col("term"), F.lit(":"), F.col(id_col).cast("string")
        ),
    )


def sync_postings_index(
    spark: SparkSession,
    corpus_dir: str,
    post_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
) -> int:
    """Bring the postings table up to the corpus's latest version,
    folding only the CDF since the cursored version (seeding from the
    snapshot on first call). Post-images re-emit every posting of the
    doc (keyed upsert — tf/dl changes overwrite); pre-image terms the
    post-image no longer contains tombstone. Idempotent per slice
    (upserts + tombstones of absent keys), so the crash-replay story
    is the join-view's, not the additive views'."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
        read_snapshot_changes,
    )

    cur = versioned.latest_version(corpus_dir)
    if cur < 1:
        raise FileNotFoundError(f"no committed snapshot in {corpus_dir}")
    v0 = view_src_version(post_dir) if os.path.isdir(post_dir) else None
    if v0 is not None and v0 >= cur:
        return v0
    if v0 is None:
        # _snapshot_or_empty, not the raw reader (r09, ADVICE): a
        # committed-but-emptied corpus (all rows deleted before the
        # first sync) seeds an EMPTY postings table — the merge below
        # commits nothing and only the cursor lands, same as the other
        # view seeds
        from customer_segmentation_pyspark_spark.streaming.views import (
            _snapshot_or_empty,
        )

        snap = _snapshot_or_empty(spark, corpus_dir, cur).select(
            id_col, text_col
        )
        batch = _with_pkey(
            _postings_of(snap, id_col, text_col), id_col
        ).select(
            PKEY, id_col, "term", "dl", "tf",
            F.lit(0).cast("long").alias("__seq"),
            F.lit("U").alias("__op"),
        )
    else:
        # checkpoint the slice (r11): posts/pres/gone reference it in
        # three branches of one staging plan, each re-tokenizing —
        # without this the manifest-diff plan executes three times
        # (the composed sync_bm25_stack already checkpoints its slices)
        cdf = read_snapshot_changes(
            spark, corpus_dir, v0, cur
        ).localCheckpoint(eager=True)
        ct = F.col("_change_type")
        posts = _postings_of(
            cdf.filter(ct.isin("insert", "update_postimage")).select(
                id_col, text_col
            ),
            id_col,
            text_col,
        )
        pres = _postings_of(
            cdf.filter(ct.isin("delete", "update_preimage")).select(
                id_col, text_col
            ),
            id_col,
            text_col,
        )
        # pre-image postings whose (term, doc) the post-image no longer
        # emits leave the index; shared keys are overwritten by the
        # upsert (tf/dl refresh) so they need no tombstone
        gone = pres.join(
            posts.select(id_col, "term"), [id_col, "term"], "left_anti"
        )
        batch = _with_pkey(posts, id_col).select(
            PKEY, id_col, "term", "dl", "tf",
            F.lit(1).cast("long").alias("__seq"),
            F.lit("U").alias("__op"),
        ).unionByName(
            _with_pkey(gone, id_col).select(
                PKEY, id_col, "term", "dl", "tf",
                F.lit(2).cast("long").alias("__seq"),
                F.lit("D").alias("__op"),
            )
        )
    merge_into_partitioned_snapshot(
        spark,
        post_dir,
        batch,
        key=PKEY,
        seq="__seq",
        num_partitions=num_partitions,
        delete_when="__op = 'D'",
        marker_cols=("__op",),
        # one posting row per (doc, term) by construction: posts come
        # from _postings_of (a groupBy) and `gone` is its anti-join
        # complement (r10, merge assume_unique_keys)
        assume_unique_keys=True,
    )
    os.makedirs(post_dir, exist_ok=True)
    _write_marker(post_dir, cur)
    return cur


def sync_bm25_stack(
    spark: SparkSession,
    corpus_dir: str,
    post_dir: str,
    dfv_dir: str,
    stats_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    stats_group_col: str = "lang",
    num_partitions: int = 32,
    df_n_col: str = "df",
    df_sum_col: str = "z",
    up_to: int | None = None,
) -> int:
    """Composed wave sync (r10, VERDICT #3): bring the WHOLE maintained
    BM25 stack — postings table, df view, (N, avgdl) stats view — up to
    the corpus's latest version off ONE shared corpus CDF slice.

    The separate-sync path pays, per wave: two corpus CDF reads
    (postings + stats), one postings-table CDF diff (the df view's
    source feed — a manifest-version diff over the biggest table in the
    stack), and two tokenization passes. This composition exploits that
    the postings table is a PURE FUNCTION of the corpus: the per-term
    df delta is computed directly from the corpus CDF's pre/post-image
    postings (a (term,doc) key present only post-image is +1, only
    pre-image is -1, both sides nets 0 — exactly the insert/delete/
    update row-count algebra the postings CDF would deliver), so the
    intermediate diff never runs and the tokenization of the slice is
    shared by the postings batch and the df delta.

    The df-from-corpus rewiring also makes the three structure updates
    MUTUALLY INDEPENDENT within a wave (the old driver serialized them
    because the df view read the postings table's CDF), so after the
    shared slices are materialized the three commits run CONCURRENTLY
    (one thread each — Spark's scheduler interleaves the jobs; each
    thread owns a different table, so no OCC conflict is possible).

    Crash story: each structure keeps its own cursor and commits
    atomically; ANY SUBSET can land (concurrency widens the old
    prefix-only guarantee) and the retry resumes each structure from
    ITS cursor, sharing CDF slices again wherever cursors coincide —
    pinned by test_retrieval.py's divergent-cursor test. The df view's
    cursor/__applied stamps track CORPUS versions under this driver —
    a view is bound to its maintenance driver; do not mix with
    `sync_agg_merge_view(post_dir, ...)`, whose stamps are postings
    versions. State equality with the separate-sync path is pinned by
    test_retrieval.py's composed-vs-separate comparison."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.sources.sinks import (
        recover_swap,
    )
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_snapshot_changes,
    )
    from customer_segmentation_pyspark_spark.streaming.views import (
        SRC_VERSION_FILE,
        _applied_high_water,
        _fold_agg_delta,
        _seed_agg_view_rows,
        _snapshot_or_empty,
        seed_count_sum_view,
        update_count_sum_view,
    )

    # ``up_to`` pins the target corpus version explicitly — the wave
    # pipelining hook (r10): a caller may commit the NEXT corpus wave
    # on a concurrent thread while this sync folds the current one,
    # and the pin keeps each fold's slice version-exact regardless of
    # when that commit lands (manifests and part dirs are immutable,
    # so reading version N under a concurrent N+1 commit is safe)
    cur = versioned.latest_version(corpus_dir) if up_to is None else up_to
    if cur < 1:
        raise FileNotFoundError(f"no committed snapshot in {corpus_dir}")
    v_post = view_src_version(post_dir) if os.path.isdir(post_dir) else None
    v_dfv = view_src_version(dfv_dir) if os.path.isdir(dfv_dir) else None
    if v_dfv is not None:
        if versioned.latest_version(dfv_dir) < 1:
            # seed over an emptied corpus wrote the cursor but committed
            # no manifest — re-seed (the agg view's birth rule)
            os.remove(os.path.join(dfv_dir, SRC_VERSION_FILE))
            v_dfv = None
        else:
            # crash healing: rows/app_meta stamped above the marker mean
            # a landed fold lost its cursor write (sync_agg_merge_view's
            # rule, corpus-version unit here)
            hw = _applied_high_water(spark, dfv_dir)
            if hw is not None and hw > v_dfv:
                v_dfv = hw
                _write_marker(dfv_dir, v_dfv)
    recover_swap(stats_dir)
    v_stats = (
        view_src_version(stats_dir) if os.path.exists(stats_dir) else None
    )
    if all(
        v is not None and v >= cur for v in (v_post, v_dfv, v_stats)
    ):
        return cur

    # shared, lazily-built slice state: one corpus snapshot/CDF read and
    # one tokenization pass serve every structure whose cursor matches
    snap_cache: list = []
    seed_posts_cache: list = []
    cdfs: dict = {}
    toks: dict = {}

    def _snap() -> DataFrame:
        if not snap_cache:
            snap_cache.append(_snapshot_or_empty(spark, corpus_dir, cur))
        return snap_cache[0]

    def _seed_postings_frame() -> DataFrame:
        if not seed_posts_cache:
            seed_posts_cache.append(
                _postings_of(
                    _snap().select(id_col, text_col), id_col, text_col
                ).localCheckpoint(eager=True)  # reused: postings seed + df seed
            )
        return seed_posts_cache[0]

    def _cdf(v0: int) -> DataFrame:
        if v0 not in cdfs:
            cdfs[v0] = read_snapshot_changes(
                spark, corpus_dir, v0, cur
            ).localCheckpoint(eager=True)  # reused: postings, df, stats
        return cdfs[v0]

    def _posts_pres(v0: int) -> tuple[DataFrame, DataFrame]:
        if v0 not in toks:
            c, ct = _cdf(v0), F.col("_change_type")
            posts = _postings_of(
                c.filter(ct.isin("insert", "update_postimage")).select(
                    id_col, text_col
                ),
                id_col,
                text_col,
            ).localCheckpoint(eager=True)  # reused: batch + df delta
            pres = _postings_of(
                c.filter(ct.isin("delete", "update_preimage")).select(
                    id_col, text_col
                ),
                id_col,
                text_col,
            ).localCheckpoint(eager=True)
            toks[v0] = (posts, pres)
        return toks[v0]

    # materialize every shared slice this wave needs BEFORE forking:
    # the cache builders are not thread-safe, and each localCheckpoint
    # is a job best run exactly once
    if v_post is None or v_dfv is None:
        _seed_postings_frame()
    for v in {v for v in (v_post, v_dfv) if v is not None and v < cur}:
        _posts_pres(v)
    if v_stats is not None and v_stats < cur:
        _cdf(v_stats)

    # 1. postings table (same batches as sync_postings_index)
    def _sync_postings() -> None:
        batch = None
        if v_post is None:
            batch = _with_pkey(_seed_postings_frame(), id_col).select(
                PKEY, id_col, "term", "dl", "tf",
                F.lit(0).cast("long").alias("__seq"),
                F.lit("U").alias("__op"),
            )
        elif v_post < cur:
            posts, pres = _posts_pres(v_post)
            gone = pres.join(
                posts.select(id_col, "term"), [id_col, "term"], "left_anti"
            )
            batch = _with_pkey(posts, id_col).select(
                PKEY, id_col, "term", "dl", "tf",
                F.lit(1).cast("long").alias("__seq"),
                F.lit("U").alias("__op"),
            ).unionByName(
                _with_pkey(gone, id_col).select(
                    PKEY, id_col, "term", "dl", "tf",
                    F.lit(2).cast("long").alias("__seq"),
                    F.lit("D").alias("__op"),
                )
            )
        if batch is not None:
            merge_into_partitioned_snapshot(
                spark,
                post_dir,
                batch,
                key=PKEY,
                seq="__seq",
                num_partitions=num_partitions,
                delete_when="__op = 'D'",
                marker_cols=("__op",),
                # unique per PKEY: groupBy output + anti-join complement
                assume_unique_keys=True,
            )
            os.makedirs(post_dir, exist_ok=True)
            _write_marker(post_dir, cur)

    # 2. df view — per-term doc counts, fed straight from the corpus
    # slice (no postings CDF diff)
    def _sync_df() -> None:
        if v_dfv is None:
            agg = (
                _seed_postings_frame()
                .groupBy("term")
                .agg(F.count(F.lit(1)).cast("long").alias(df_n_col))
                .withColumn(df_sum_col, F.lit(0).cast("long"))
            )
            _seed_agg_view_rows(
                spark, dfv_dir, agg, "term", cur,
                num_partitions=num_partitions,
                n_col=df_n_col, sum_col=df_sum_col,
            )
        elif v_dfv < cur:
            posts, pres = _posts_pres(v_dfv)
            delta = (
                posts.select("term", F.lit(1).alias("__s"))
                .unionByName(pres.select("term", F.lit(-1).alias("__s")))
                .groupBy(F.col("term").alias("__dg"))
                .agg(
                    F.sum("__s").cast("long").alias("__d_n"),
                    F.sum(F.lit(0)).cast("long").alias("__d_sum"),
                )
                .filter(F.col("__d_n") != 0)
            )
            _fold_agg_delta(
                spark, dfv_dir, delta, "term", cur,
                n_col=df_n_col, sum_col=df_sum_col,
            )

    # 3. (N, avgdl) stats view — swap-style COUNT/SUM over the same slice
    def _sync_stats() -> None:
        if v_stats is None:
            seed_count_sum_view(
                spark, stats_dir, _snap(), stats_group_col,
                token_count(F.col(text_col)), src_version=cur,
            )
        elif v_stats < cur:
            update_count_sum_view(
                spark, stats_dir, _cdf(v_stats), stats_group_col,
                token_count(F.col(text_col)), src_version=cur,
            )

    # one thread per structure: each owns a different table dir, so the
    # commits cannot conflict; result() re-raises in a fixed order and
    # a failed structure simply retries from its own cursor next call
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as ex:
        futures = [
            ex.submit(f) for f in (_sync_postings, _sync_df, _sync_stats)
        ]
        for fu in futures:
            fu.result()
    return cur


def bm25_query_maintained(
    spark: SparkSession,
    post_dir: str,
    df_view_dir: str,
    stats_view_dir: str,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_type: str = "string",
) -> DataFrame:
    """BM25 top-k over the MAINTAINED state: postings of the query's
    terms via the term column index (partition-pruned, stale-exact),
    df via point-reads of the merge-backed view, (N, avgdl) from the
    stats view's few group rows. Identical scoring arithmetic to
    `operators/textops.py:bm25_topk` (ln idf, k1=1.2, b=0.75,
    round 6, doc_id tie-break)."""
    from customer_segmentation_pyspark_spark.sources.sinks import (
        recover_swap,
    )
    from customer_segmentation_pyspark_spark.streaming.colindex import (
        read_by_column_value,
    )
    from customer_segmentation_pyspark_spark.streaming.merge import (
        read_partitioned_snapshot,
    )

    try:
        posts = read_by_column_value(spark, post_dir, "term", list(terms))
    except FileNotFoundError:
        # corpus emptied before the first postings sync: the seed
        # committed nothing (cursor only, no manifest) — no doc can
        # score. doc_id's type is unrecoverable from the (empty)
        # postings state, so callers whose corpus keys are not strings
        # must pass ``id_type`` if they union this fallback with typed
        # frames (r09 + r10, ADVICE).
        return spark.createDataFrame(
            [], f"doc_id {id_type}, bm25 double"
        )
    # the stats view is swap-style (two renames): a crash between them
    # leaves the current state stranded at .old-* — adopt it before
    # reading, or the query silently reads the stale side until the
    # next sync (r09, VERDICT #7)
    recover_swap(stats_view_dir)
    srow = (
        spark.read.parquet(stats_view_dir)
        .agg(
            F.sum("n_rows").cast("double").alias("n"),
            F.sum("total").cast("double").alias("tt"),
        )
        .first()
    )
    if srow is None or not srow["n"]:
        # empty (or fully-emptied) corpus: n is NULL or 0 — there is
        # nothing to score and avgdl is undefined (r09, ADVICE)
        return posts.select(
            F.col("doc_id"), F.lit(0.0).cast("double").alias("bm25")
        ).limit(0)
    dfv = read_partitioned_snapshot(
        spark, df_view_dir, key_in=[f"v:{t}" for t in terms]
    ).select(F.col("term").alias("__t"), F.col("df"))
    n_docs, avgdl = float(srow["n"]), float(srow["tt"]) / float(srow["n"])
    scored = posts.join(F.broadcast(dfv), posts["term"] == dfv["__t"])
    part = (
        F.log(
            1.0
            + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        * (F.col("tf") * (k1 + 1.0))
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum(part), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id"))
        .limit(k)
    )
