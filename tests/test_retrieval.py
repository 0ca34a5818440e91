"""Maintained BM25 retrieval index (r08, capstone #16): the postings
table must track a recompute through corpus churn, and the composed
query path (term column index + df view + stats view) must equal the
batch BM25 over the final corpus snapshot — including with the term
index deliberately stale."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.streaming.colindex import (
    sync_column_index,
)
from customer_segmentation_pyspark_spark.streaming.merge import (
    merge_into_partitioned_snapshot,
    read_partitioned_snapshot,
)
from customer_segmentation_pyspark_spark.streaming.retrieval import (
    _postings_of,
    bm25_query_maintained,
    sync_postings_index,
    token_count,
)
from customer_segmentation_pyspark_spark.streaming.views import (
    sync_agg_merge_view,
    sync_view_to_snapshot,
)

SCHEMA = "doc_id long, text string, lang string, seq long, op string"

WAVES = [
    # seed: overlapping vocab; doc 3 is the only 'cider' doc
    [(1, "alpha beta gamma beta", "en", 0, "U"),
     (2, "beta beta delta", "en", 0, "U"),
     (3, "gamma cider", "fr", 0, "U"),
     (4, "alpha alpha alpha beta", "en", 0, "U")],
    # update 1 (drops beta entirely -> tombstoned postings), delete 2
    # (all its postings go), insert 5
    [(1, "alpha gamma gamma", "en", 1, "U"),
     (2, None, "en", 1, "D"),
     (5, "beta cider cider", "fr", 1, "U")],
    # re-insert 2 with new text; tf-only change for 4
    [(2, "delta delta alpha", "en", 2, "U"),
     (4, "alpha beta", "en", 2, "U")],
]


def _merge_wave(spark, corpus, rows):
    merge_into_partitioned_snapshot(
        spark, corpus, spark.createDataFrame(rows, SCHEMA),
        key="doc_id", seq="seq", num_partitions=4,
        delete_when="op = 'D'", marker_cols=("op",),
    )


def test_postings_sync_tracks_recompute(spark, tmp_path):
    corpus = str(tmp_path / "c")
    post = str(tmp_path / "p")
    for rows in WAVES:
        _merge_wave(spark, corpus, rows)
        sync_postings_index(spark, corpus, post, num_partitions=4)
        got = {
            (r["doc_id"], r["term"]): (r["tf"], r["dl"])
            for r in read_partitioned_snapshot(spark, post).collect()
        }
        snap = read_partitioned_snapshot(spark, corpus).select(
            "doc_id", "text"
        )
        want = {
            (r["doc_id"], r["term"]): (r["tf"], r["dl"])
            for r in _postings_of(snap, "doc_id", "text").collect()
        }
        assert got == want, (got, want)
    # wave 2 specifics: doc 1 lost 'beta' (tombstone), doc 2's postings
    # came back with the re-insert text only
    assert (1, "beta") not in got and (2, "delta") in got
    assert got[(4, "beta")] == (1, 2)  # tf refreshed, dl refreshed


def test_bm25_maintained_equals_batch_even_stale(spark, tmp_path):
    """The composed maintained path == operators/textops.bm25_topk over
    the final snapshot; the term column index is synced only ONCE
    (after the seed), so the last two waves exercise the stale-exact
    escape hatch end-to-end."""
    from customer_segmentation_pyspark_spark.operators import textops

    corpus = str(tmp_path / "c")
    post = str(tmp_path / "p")
    dfv = str(tmp_path / "df")
    stats = str(tmp_path / "s")
    terms = ["alpha", "beta", "cider"]
    for i, rows in enumerate(WAVES):
        _merge_wave(spark, corpus, rows)
        sync_postings_index(spark, corpus, post, num_partitions=4)
        sync_agg_merge_view(
            spark, post, dfv, "term", F.lit(0),
            num_partitions=4, n_col="df", sum_col="z",
        )
        sync_view_to_snapshot(
            spark, corpus, stats, "lang", token_count(F.col("text"))
        )
        if i == 0:
            sync_column_index(spark, post, "term", num_partitions=4)
        got = sorted(
            (r["doc_id"], r["bm25"])
            for r in bm25_query_maintained(
                spark, post, dfv, stats, terms, k=10
            ).collect()
        )
        snap = read_partitioned_snapshot(spark, corpus).select(
            "doc_id", "text"
        )
        want = sorted(
            (r["doc_id"], r["bm25"])
            for r in textops.bm25_topk(snap, terms, k=10).collect()
        )
        assert got == want, (i, got, want)


def test_bm25_query_heals_interrupted_stats_swap(spark, tmp_path):
    """A crash between the stats view's two swap renames leaves the
    current state stranded at .old-* and the view path missing; the
    query path must adopt it via recover_swap instead of failing (or,
    pre-fix, silently reading whatever side survived) until the next
    sync (r09, VERDICT #7)."""
    import glob as _glob
    import os as _os
    import uuid as _uuid

    corpus = str(tmp_path / "c")
    post = str(tmp_path / "p")
    dfv = str(tmp_path / "df")
    stats = str(tmp_path / "s")
    terms = ["alpha", "beta", "cider"]
    for rows in WAVES[:2]:
        _merge_wave(spark, corpus, rows)
        sync_postings_index(spark, corpus, post, num_partitions=4)
        sync_agg_merge_view(
            spark, post, dfv, "term", F.lit(0),
            num_partitions=4, n_col="df", sum_col="z",
        )
        sync_view_to_snapshot(
            spark, corpus, stats, "lang", token_count(F.col("text"))
        )
    sync_column_index(spark, post, "term", num_partitions=4)
    want = sorted(
        (r["doc_id"], r["bm25"])
        for r in bm25_query_maintained(
            spark, post, dfv, stats, terms, k=10
        ).collect()
    )
    # simulate the crash window: the first rename landed (state
    # stranded at .old-*), the second never ran (path missing)
    _os.rename(stats, f"{stats}.old-{_uuid.uuid4().hex[:8]}")
    got = sorted(
        (r["doc_id"], r["bm25"])
        for r in bm25_query_maintained(
            spark, post, dfv, stats, terms, k=10
        ).collect()
    )
    assert got == want, (got, want)
    # the stranded snapshot was adopted back into place
    assert _os.path.isdir(stats)
    assert not _glob.glob(f"{stats}.old-*")


def test_bm25_empty_and_emptied_corpus_query_is_empty(spark, tmp_path):
    """Two empty shapes (r09, ADVICE): (a) a corpus emptied BEFORE the
    first postings sync seeds an empty postings table (cursor only) and
    the query returns an empty frame instead of FileNotFoundError;
    (b) a corpus emptied AFTER real syncs drives the stats view's n to
    NULL/0 and the query returns empty instead of TypeError /
    ZeroDivisionError. Growth after (a) resumes exactly."""
    from customer_segmentation_pyspark_spark.operators import textops

    corpus = str(tmp_path / "c")
    post = str(tmp_path / "p")
    dfv = str(tmp_path / "df")
    stats = str(tmp_path / "s")
    terms = ["alpha", "beta", "cider"]

    def syncs():
        sync_postings_index(spark, corpus, post, num_partitions=4)
        sync_agg_merge_view(
            spark, post, dfv, "term", F.lit(0),
            num_partitions=4, n_col="df", sum_col="z",
        )
        sync_view_to_snapshot(
            spark, corpus, stats, "lang", token_count(F.col("text"))
        )

    # (a) commit docs, delete them all, THEN run the first sync. The
    # postings seed commits nothing (cursor only) — so the df view,
    # whose source is the postings table itself, has nothing to sync
    # from yet (sync_agg_merge_view's no-committed-snapshot contract);
    # the pipeline starts it once postings carries a commit.
    _merge_wave(spark, corpus, WAVES[0])
    _merge_wave(
        spark, corpus,
        [(d, None, "en", 1, "D") for d in (1, 2, 3, 4)],
    )
    sync_postings_index(spark, corpus, post, num_partitions=4)
    sync_view_to_snapshot(
        spark, corpus, stats, "lang", token_count(F.col("text"))
    )
    got = bm25_query_maintained(
        spark, post, dfv, stats, terms, k=10
    ).collect()
    assert got == []
    # growth resumes: the cursor seeded at the emptied version folds
    # only the new wave, and the maintained path equals the batch
    _merge_wave(spark, corpus, WAVES[0])
    syncs()
    sync_column_index(spark, post, "term", num_partitions=4)
    got = sorted(
        (r["doc_id"], r["bm25"])
        for r in bm25_query_maintained(
            spark, post, dfv, stats, terms, k=10
        ).collect()
    )
    snap = read_partitioned_snapshot(spark, corpus).select(
        "doc_id", "text"
    )
    want = sorted(
        (r["doc_id"], r["bm25"])
        for r in textops.bm25_topk(snap, terms, k=10).collect()
    )
    assert got == want, (got, want)
    # (b) empty it again AFTER real state exists: n goes NULL/0
    _merge_wave(
        spark, corpus,
        [(d, None, "en", 9, "D") for d in (1, 2, 3, 4)],
    )
    syncs()
    assert bm25_query_maintained(
        spark, post, dfv, stats, terms, k=10
    ).collect() == []


def test_bm25_maintained_survives_index_vacuum(spark, tmp_path):
    """GC composition: vacuuming the term column index between waves
    (clipping its superset back to exact) must leave retrieval equal
    to the batch — including when the index then goes stale again."""
    from customer_segmentation_pyspark_spark.operators import textops
    from customer_segmentation_pyspark_spark.streaming.colindex import (
        vacuum_column_index,
    )

    corpus = str(tmp_path / "c")
    post = str(tmp_path / "p")
    dfv = str(tmp_path / "df")
    stats = str(tmp_path / "s")
    terms = ["alpha", "beta", "cider"]

    def syncs():
        sync_postings_index(spark, corpus, post, num_partitions=4)
        sync_agg_merge_view(
            spark, post, dfv, "term", F.lit(0),
            num_partitions=4, n_col="df", sum_col="z",
        )
        sync_view_to_snapshot(
            spark, corpus, stats, "lang", token_count(F.col("text"))
        )

    _merge_wave(spark, corpus, WAVES[0])
    syncs()
    sync_column_index(spark, post, "term", num_partitions=4)
    _merge_wave(spark, corpus, WAVES[1])
    syncs()
    vacuum_column_index(spark, post, "term")  # GC mid-churn
    _merge_wave(spark, corpus, WAVES[2])
    syncs()  # index stale again after the vacuum
    got = sorted(
        (r["doc_id"], r["bm25"])
        for r in bm25_query_maintained(
            spark, post, dfv, stats, terms, k=10
        ).collect()
    )
    snap = read_partitioned_snapshot(spark, corpus).select(
        "doc_id", "text"
    )
    want = sorted(
        (r["doc_id"], r["bm25"])
        for r in textops.bm25_topk(snap, terms, k=10).collect()
    )
    assert got == want, (got, want)


def test_composed_stack_sync_equals_separate_syncs(spark, tmp_path):
    """r10 (VERDICT #3): `sync_bm25_stack` — one shared corpus CDF
    slice feeding postings batch + df delta + stats fold — must leave
    byte-equal STATE (postings rows, df view rows, stats view rows)
    and an equal query result to the separate-sync path, wave by wave,
    including through the stale column index."""
    from customer_segmentation_pyspark_spark.streaming.retrieval import (
        sync_bm25_stack,
    )
    from customer_segmentation_pyspark_spark.streaming.views import (
        read_agg_merge_view,
    )

    terms = ["alpha", "beta", "cider"]
    ca, pa, dfa, sa = (str(tmp_path / x) for x in "c1 p1 d1 s1".split())
    cb, pb, dfb, sb = (str(tmp_path / x) for x in "c2 p2 d2 s2".split())
    for i, rows in enumerate(WAVES):
        _merge_wave(spark, ca, rows)
        _merge_wave(spark, cb, rows)
        # A: separate syncs (the r08 driver)
        sync_postings_index(spark, ca, pa, num_partitions=4)
        sync_agg_merge_view(
            spark, pa, dfa, "term", F.lit(0),
            num_partitions=4, n_col="df", sum_col="z",
        )
        sync_view_to_snapshot(
            spark, ca, sa, "lang", token_count(F.col("text"))
        )
        # B: composed sync (r10)
        sync_bm25_stack(spark, cb, pb, dfb, sb, num_partitions=4)
        if i == 0:
            sync_column_index(spark, pa, "term", num_partitions=4)
            sync_column_index(spark, pb, "term", num_partitions=4)
        post_a = sorted(
            (r["doc_id"], r["term"], r["tf"], r["dl"])
            for r in read_partitioned_snapshot(spark, pa).collect()
        )
        post_b = sorted(
            (r["doc_id"], r["term"], r["tf"], r["dl"])
            for r in read_partitioned_snapshot(spark, pb).collect()
        )
        assert post_a == post_b, (i, post_a, post_b)
        df_a = sorted(
            (r["term"], r["df"])
            for r in read_agg_merge_view(spark, dfa).collect()
        )
        df_b = sorted(
            (r["term"], r["df"])
            for r in read_agg_merge_view(spark, dfb).collect()
        )
        assert df_a == df_b, (i, df_a, df_b)
        st_a = sorted(map(tuple, spark.read.parquet(sa).collect()))
        st_b = sorted(map(tuple, spark.read.parquet(sb).collect()))
        assert st_a == st_b, (i, st_a, st_b)
        got_a = sorted(
            (r["doc_id"], r["bm25"])
            for r in bm25_query_maintained(
                spark, pa, dfa, sa, terms, k=10
            ).collect()
        )
        got_b = sorted(
            (r["doc_id"], r["bm25"])
            for r in bm25_query_maintained(
                spark, pb, dfb, sb, terms, k=10
            ).collect()
        )
        assert got_a == got_b, (i, got_a, got_b)


def test_composed_stack_sync_resumes_from_divergent_cursors(spark, tmp_path):
    """Crash shape: a wave where the postings commit landed but the df
    and stats folds did not (simulated by advancing ONLY the postings
    via its standalone sync) must heal on the next composed call —
    each structure resumes from ITS cursor, and the final state equals
    the batch recompute."""
    from customer_segmentation_pyspark_spark.operators import textops
    from customer_segmentation_pyspark_spark.streaming.retrieval import (
        sync_bm25_stack,
    )

    corpus = str(tmp_path / "c")
    post = str(tmp_path / "p")
    dfv = str(tmp_path / "df")
    stats = str(tmp_path / "s")
    terms = ["alpha", "beta", "cider"]
    _merge_wave(spark, corpus, WAVES[0])
    sync_bm25_stack(spark, corpus, post, dfv, stats, num_partitions=4)
    _merge_wave(spark, corpus, WAVES[1])
    # "crash": postings advance to wave 1, df/stats stay at wave 0
    sync_postings_index(spark, corpus, post, num_partitions=4)
    _merge_wave(spark, corpus, WAVES[2])
    # retry: postings fold (w1->w2], df/stats fold (w0->w2]
    sync_bm25_stack(spark, corpus, post, dfv, stats, num_partitions=4)
    got = sorted(
        (r["doc_id"], r["bm25"])
        for r in bm25_query_maintained(
            spark, post, dfv, stats, terms, k=10
        ).collect()
    )
    snap = read_partitioned_snapshot(spark, corpus).select("doc_id", "text")
    want = sorted(
        (r["doc_id"], r["bm25"])
        for r in textops.bm25_topk(snap, terms, k=10).collect()
    )
    assert got == want, (got, want)


def test_composed_stack_sync_emptied_corpus_seed(spark, tmp_path):
    """The composed seed over a committed-but-emptied corpus writes
    cursors only (no manifests), the query returns empty, and growth
    resumes exactly — the composed twin of the (a) shape above."""
    from customer_segmentation_pyspark_spark.operators import textops
    from customer_segmentation_pyspark_spark.streaming.retrieval import (
        sync_bm25_stack,
    )

    corpus = str(tmp_path / "c")
    post = str(tmp_path / "p")
    dfv = str(tmp_path / "df")
    stats = str(tmp_path / "s")
    terms = ["alpha", "beta", "cider"]
    _merge_wave(spark, corpus, WAVES[0])
    _merge_wave(
        spark, corpus,
        [(d, None, "en", 1, "D") for d in (1, 2, 3, 4)],
    )
    sync_bm25_stack(spark, corpus, post, dfv, stats, num_partitions=4)
    assert bm25_query_maintained(
        spark, post, dfv, stats, terms, k=10
    ).collect() == []
    _merge_wave(spark, corpus, WAVES[0])
    sync_bm25_stack(spark, corpus, post, dfv, stats, num_partitions=4)
    got = sorted(
        (r["doc_id"], r["bm25"])
        for r in bm25_query_maintained(
            spark, post, dfv, stats, terms, k=10
        ).collect()
    )
    snap = read_partitioned_snapshot(spark, corpus).select("doc_id", "text")
    want = sorted(
        (r["doc_id"], r["bm25"])
        for r in textops.bm25_topk(snap, terms, k=10).collect()
    )
    assert got == want, (got, want)


def test_stack_sync_up_to_pins_slice_then_catches_up(spark, tmp_path):
    """r10 wave pipelining: with the corpus already TWO waves ahead,
    `sync_bm25_stack(..., up_to=v1)` must fold exactly wave 1's slice
    (state == a stack that only ever saw wave 0+1... i.e. built
    sequentially through v1) and leave the cursors at v1; the next
    un-pinned sync folds the rest and equals the batch recompute.
    This is the invariant that makes it safe for a caller to commit
    the NEXT corpus wave on a concurrent thread while this fold runs."""
    from customer_segmentation_pyspark_spark.operators import textops
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.retrieval import (
        sync_bm25_stack,
    )
    from customer_segmentation_pyspark_spark.streaming.views import (
        view_src_version,
    )

    terms = ["alpha", "beta", "cider"]
    corpus = str(tmp_path / "c")
    post = str(tmp_path / "p")
    dfv = str(tmp_path / "df")
    stats = str(tmp_path / "s")
    # reference stack built sequentially, one sync per wave
    cr, pr, dfr, sr = (str(tmp_path / x) for x in "cr pr dr sr".split())

    _merge_wave(spark, corpus, WAVES[0])
    sync_bm25_stack(spark, corpus, post, dfv, stats, num_partitions=4)
    v1_target = versioned.latest_version(corpus) + 1
    _merge_wave(spark, corpus, WAVES[1])
    _merge_wave(spark, corpus, WAVES[2])
    assert versioned.latest_version(corpus) == v1_target + 1
    # pinned fold: only wave 1's CDF slice, despite wave 2 being live
    sync_bm25_stack(
        spark, corpus, post, dfv, stats, num_partitions=4,
        up_to=v1_target,
    )
    assert view_src_version(post) == v1_target
    assert view_src_version(dfv) == v1_target
    for i in range(2):
        _merge_wave(spark, cr, WAVES[i])
        sync_bm25_stack(spark, cr, pr, dfr, sr, num_partitions=4)
    got = sorted(
        (r["doc_id"], r["term"], r["tf"], r["dl"])
        for r in read_partitioned_snapshot(spark, post).collect()
    )
    want = sorted(
        (r["doc_id"], r["term"], r["tf"], r["dl"])
        for r in read_partitioned_snapshot(spark, pr).collect()
    )
    assert got == want, (got, want)
    # un-pinned catch-up folds wave 2 and equals the batch recompute
    sync_bm25_stack(spark, corpus, post, dfv, stats, num_partitions=4)
    got = sorted(
        (r["doc_id"], r["bm25"])
        for r in bm25_query_maintained(
            spark, post, dfv, stats, terms, k=10
        ).collect()
    )
    snap = read_partitioned_snapshot(spark, corpus).select("doc_id", "text")
    want = sorted(
        (r["doc_id"], r["bm25"])
        for r in textops.bm25_topk(snap, terms, k=10).collect()
    )
    assert got == want, (got, want)


def test_stack_sync_pipelined_waves_equal_sequential(spark, tmp_path):
    """The actual pipelined driver shape (queries.py r10): wave i's
    pinned fold runs on a thread WHILE wave i+1's corpus merge commits
    on another. Final state must equal the plain sequential build."""
    from concurrent.futures import ThreadPoolExecutor

    from customer_segmentation_pyspark_spark.operators import textops
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.retrieval import (
        sync_bm25_stack,
    )

    terms = ["alpha", "beta", "cider"]
    corpus = str(tmp_path / "c")
    post = str(tmp_path / "p")
    dfv = str(tmp_path / "df")
    stats = str(tmp_path / "s")

    _merge_wave(spark, corpus, WAVES[0])
    for i in range(len(WAVES)):
        v = versioned.latest_version(corpus)

        def fold(v=v):
            sync_bm25_stack(
                spark, corpus, post, dfv, stats,
                num_partitions=4, up_to=v,
            )

        if i + 1 < len(WAVES):
            with ThreadPoolExecutor(max_workers=2) as ex:
                futs = [
                    ex.submit(_merge_wave, spark, corpus, WAVES[i + 1]),
                    ex.submit(fold),
                ]
                for fu in futs:
                    fu.result()
        else:
            fold()
    got = sorted(
        (r["doc_id"], r["bm25"])
        for r in bm25_query_maintained(
            spark, post, dfv, stats, terms, k=10
        ).collect()
    )
    snap = read_partitioned_snapshot(spark, corpus).select("doc_id", "text")
    want = sorted(
        (r["doc_id"], r["bm25"])
        for r in textops.bm25_topk(snap, terms, k=10).collect()
    )
    assert got == want, (got, want)
