"""Composed-vacuum capstone (r09, VERDICT #4): one pipeline — corpus
MERGE table → postings table → df merge-view + stats view → term
column index + score range index + join view (jvmap) + IVF index
(keymap) — driven through delete/update waves while EVERY vacuum
fires concurrently (threaded, seeded), then through a serial bloat →
vacuum-all pass. Asserts: no thread escapes anything but
ConcurrentMergeError, composed reads are bit-exact against batch
recomputes after every landed sync round (i.e. under concurrent
vacuums), every map strictly shrinks when vacuumed after churn, all
markers clear, and post-vacuum waves stay exact (escape hatches
compose)."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.operators.vector_index import (
    _keymap_dir,
    query_ivf_index,
    read_ivf_index,
    sync_ivf_index_to_snapshot,
    vacuum_ivf_keymap,
)
from customer_segmentation_pyspark_spark.streaming.colindex import (
    _colidx_dir,
    _colrng_dir,
    read_by_column_range,
    read_by_column_value,
    sync_column_index,
    sync_range_index,
    vacuum_column_index,
    vacuum_range_index,
)
from customer_segmentation_pyspark_spark.streaming.merge import (
    ConcurrentMergeError,
    merge_into_partitioned_snapshot,
    read_partitioned_snapshot,
)
from customer_segmentation_pyspark_spark.streaming.retrieval import (
    bm25_query_maintained,
    sync_postings_index,
    token_count,
)
from customer_segmentation_pyspark_spark.streaming.views import (
    _jvmap_dir,
    sync_agg_merge_view,
    sync_join_view_to_snapshots,
    sync_view_to_snapshot,
    vacuum_jvmap,
)

CORPUS_SCHEMA = (
    "doc_id long, text string, lang string, score double, "
    "embedding array<double>, seq long, op string"
)
DIM_SCHEMA = "lang string, region string, dseq long, dop string"
LANGS = ["en", "fr", "de", "xx"]
COMMON = ["alpha", "beta", "gamma", "delta"]
CELLS = [[0.0, 0.0], [6.0, 0.0], [0.0, 6.0], [6.0, 6.0]]
TERMS = ["alpha", "beta", "rare7"]


def _doc(i, wave):
    text = " ".join(
        [COMMON[i % 4], COMMON[(i + 1) % 4], f"rare{i}", f"w{wave}only"]
    )
    emb = [float(i % 7), float((i // 7) % 7)]
    return (i, text, LANGS[i % 4], float(i), emb, wave, "U")


def _merge_corpus(spark, corpus, rows):
    merge_into_partitioned_snapshot(
        spark, corpus, spark.createDataFrame(rows, CORPUS_SCHEMA),
        key="doc_id", seq="seq", num_partitions=8,
        delete_when="op = 'D'", marker_cols=("op",),
    )


def _merge_dim(spark, dim, rows):
    merge_into_partitioned_snapshot(
        spark, dim, spark.createDataFrame(rows, DIM_SCHEMA),
        key="lang", seq="dseq", num_partitions=4,
        delete_when="dop = 'D'", marker_cols=("dop",),
    )


class _Stack:
    def __init__(self, tmp_path):
        self.corpus = str(tmp_path / "corpus")
        self.dim = str(tmp_path / "dim")
        self.post = str(tmp_path / "post")
        self.dfv = str(tmp_path / "dfv")
        self.stats = str(tmp_path / "stats")
        self.jview = str(tmp_path / "jview")
        self.ivf = str(tmp_path / "ivf")

    def sync_all(self, spark):
        """One full maintenance round, upstream to downstream."""
        sync_postings_index(spark, self.corpus, self.post,
                            num_partitions=8)
        sync_agg_merge_view(
            spark, self.post, self.dfv, "term", F.lit(0),
            num_partitions=8, n_col="df", sum_col="z",
        )
        sync_view_to_snapshot(
            spark, self.corpus, self.stats, "lang",
            token_count(F.col("text")),
        )
        sync_join_view_to_snapshots(
            spark, self.corpus, self.dim, self.jview, "lang",
            num_partitions=8,
        )
        sync_ivf_index_to_snapshot(
            spark, self.corpus, self.ivf, CELLS, vec_col="embedding"
        )
        sync_column_index(spark, self.post, "term", num_partitions=8)
        sync_range_index(spark, self.corpus, "score", bucket_width=10.0,
                         num_partitions=8)

    def vacuum_all(self, spark):
        vacuum_jvmap(spark, self.jview)
        vacuum_column_index(spark, self.post, "term")
        vacuum_range_index(spark, self.corpus, "score")
        vacuum_ivf_keymap(spark, self.ivf)

    def assert_bit_exact(self, spark):
        """Composed reads == batch recomputes over the CURRENT
        snapshots. Caller guarantees every sync landed; concurrent
        vacuums are exactly what must NOT perturb these."""
        from customer_segmentation_pyspark_spark.operators import textops

        snap = read_partitioned_snapshot(spark, self.corpus)
        # maintained BM25 == batch BM25
        got = sorted(
            (r["doc_id"], r["bm25"])
            for r in bm25_query_maintained(
                spark, self.post, self.dfv, self.stats, TERMS, k=10
            ).collect()
        )
        want = sorted(
            (r["doc_id"], r["bm25"])
            for r in textops.bm25_topk(
                snap.select("doc_id", "text"), TERMS, k=10
            ).collect()
        )
        assert got == want, (got, want)
        # indexed term read == plain postings filter
        gi = sorted(
            map(tuple, read_by_column_value(
                spark, self.post, "term", ["alpha"]
            ).select("doc_id", "tf").collect())
        )
        wi = sorted(
            map(tuple, read_partitioned_snapshot(spark, self.post)
                .filter(F.col("term") == "alpha")
                .select("doc_id", "tf").collect())
        )
        assert gi == wi, (gi, wi)
        # indexed range read == plain corpus filter
        gr = sorted(
            r["doc_id"]
            for r in read_by_column_range(
                spark, self.corpus, "score", 10.0, 33.0
            ).select("doc_id").collect()
        )
        wr = sorted(
            r["doc_id"]
            for r in snap.filter(F.col("score").between(10.0, 33.0))
            .select("doc_id").collect()
        )
        assert gr == wr, (gr, wr)
        # join view == recompute join
        dimsnap = read_partitioned_snapshot(spark, self.dim).drop(
            "dseq", "dop"
        )
        gv = sorted(
            map(tuple, read_partitioned_snapshot(spark, self.jview)
                .select("doc_id", "lang", "region").collect())
        )
        wv = sorted(
            map(tuple, snap.select("doc_id", "lang")
                .join(dimsnap, "lang", "left")
                .select("doc_id", "lang", "region").collect())
        )
        assert gv == wv, (gv[:5], wv[:5])
        # IVF content == corpus
        final = read_ivf_index(spark, self.ivf).select(
            "doc_id", "embedding"
        )
        assert final.count() == snap.count()
        assert final.exceptAll(
            snap.select("doc_id", "embedding")
        ).count() == 0


def _entries(spark, table_dir):
    return read_partitioned_snapshot(spark, table_dir).count()


@pytest.mark.parametrize("fuzz_seed", [7])
def test_composed_pipeline_all_vacuums_under_churn(
    spark, tmp_path, fuzz_seed
):
    import random

    rng = random.Random(fuzz_seed)
    st = _Stack(tmp_path)
    # seed: 96 docs over 4 langs, dim payloads, full sync
    _merge_corpus(spark, st.corpus, [_doc(i, 0) for i in range(96)])
    _merge_dim(spark, st.dim,
               [(lg, f"r-{lg}", 0, "U") for lg in LANGS])
    st.sync_all(spark)
    st.assert_bit_exact(spark)

    # ---- phase 1: threaded churn + syncs + ALL vacuums + readers ----
    unexpected: list = []
    cme = [0]
    done = threading.Event()

    def guard(fn):
        try:
            fn()
            return True
        except ConcurrentMergeError:
            cme[0] += 1
            return False
        except Exception as e:  # noqa: BLE001 — the invariant under test
            unexpected.append(e)
            return False

    def ingest():
        try:
            for wave in (1, 2):
                live = {
                    r["doc_id"]
                    for r in read_partitioned_snapshot(spark, st.corpus)
                    .select("doc_id").collect()
                }
                ups = [
                    _doc(i, wave)
                    for i in rng.sample(sorted(live), 24)
                ]
                dels = [
                    (i, None, None, None, None, wave, "D")
                    for i in rng.sample(sorted(live), 16)
                ]
                _merge_corpus(spark, st.corpus, ups + dels)
                _merge_dim(
                    spark, st.dim,
                    [(rng.choice(LANGS), f"r{wave}", wave, "U")],
                )
                # retry the round until every sync lands in one clean
                # sweep, then the composed reads must be bit-exact even
                # with the vacuum thread firing
                for _ in range(6):
                    if guard(lambda: st.sync_all(spark)):
                        st.assert_bit_exact(spark)
                        break
        finally:
            done.set()

    def vacuumer():
        while not done.is_set():
            guard(lambda: vacuum_jvmap(spark, st.jview))
            guard(lambda: vacuum_column_index(spark, st.post, "term"))
            guard(lambda: vacuum_range_index(spark, st.corpus, "score"))
            guard(lambda: vacuum_ivf_keymap(spark, st.ivf))

    def reader():
        while not done.is_set():
            guard(lambda: read_by_column_value(
                spark, st.post, "term", ["alpha", "beta"]).count())
            guard(lambda: read_by_column_range(
                spark, st.corpus, "score", 5.0, 50.0).count())
            guard(lambda: read_partitioned_snapshot(
                spark, st.jview).count())
            q = spark.createDataFrame(
                [(0, [1.0, 1.0])], "doc_id long, embedding array<double>"
            )
            guard(lambda: query_ivf_index(
                spark, st.ivf, q, n_probe=2, k=3,
                id_col="doc_id").count())

    threads = [
        threading.Thread(target=t) for t in (ingest, vacuumer, reader)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not unexpected, unexpected

    # serial convergence: land anything a CME interrupted
    for _ in range(10):
        try:
            st.sync_all(spark)
            break
        except ConcurrentMergeError:  # pragma: no cover — serial now
            continue
    st.assert_bit_exact(spark)

    # ---- phase 2: serial bloat (no vacuums) then vacuum-all shrink ----
    live = {
        r["doc_id"]
        for r in read_partitioned_snapshot(spark, st.corpus)
        .select("doc_id").collect()
    }
    # delete every xx doc (the lang loses all facts -> jvmap entry
    # vanishes) AND every doc scoring >= 80 (two whole range-index
    # buckets vanish); both retire their rare<N> terms (term-index
    # entries vanish) and keymap rows
    xx = sorted(i for i in live if i % 4 == 3)
    high = sorted(i for i in live if i >= 80)
    assert xx and high, "fixture must keep xx and high docs into phase 2"
    _merge_corpus(
        spark, st.corpus,
        [(i, None, None, None, None, 9, "D")
         for i in sorted(set(xx) | set(high))],
    )
    _merge_dim(spark, st.dim, [("xx", "r9", 9, "U")])  # force catch-up
    st.sync_all(spark)
    st.assert_bit_exact(spark)

    pre = {
        "jvmap": _entries(spark, _jvmap_dir(st.jview)),
        "colidx": _entries(spark, _colidx_dir(st.post, "term")),
        "rng": _entries(spark, _colrng_dir(st.corpus, "score")),
        "keymap": _entries(spark, _keymap_dir(st.ivf)),
    }
    st.vacuum_all(spark)
    post = {
        "jvmap": _entries(spark, _jvmap_dir(st.jview)),
        "colidx": _entries(spark, _colidx_dir(st.post, "term")),
        "rng": _entries(spark, _colrng_dir(st.corpus, "score")),
        "keymap": _entries(spark, _keymap_dir(st.ivf)),
    }
    for name in pre:
        assert post[name] < pre[name], (name, pre, post)
    # no vacuum left its in-progress marker behind
    import os as _os

    from customer_segmentation_pyspark_spark.operators.vector_index import (
        _vacuum_marker_path,
    )
    from customer_segmentation_pyspark_spark.streaming.colindex import (
        _vacuum_marker_path as _col_marker,
    )
    from customer_segmentation_pyspark_spark.streaming.views import (
        _jvmap_vacuum_marker_path,
    )

    assert not _os.path.exists(_jvmap_vacuum_marker_path(st.jview))
    assert not _os.path.exists(_col_marker(_colidx_dir(st.post, "term")))
    assert not _os.path.exists(_col_marker(_colrng_dir(st.corpus, "score")))
    assert not _os.path.exists(_vacuum_marker_path(st.ivf))

    # post-vacuum churn still exact (escape hatches compose after GC)
    survivors = sorted(
        r["doc_id"]
        for r in read_partitioned_snapshot(spark, st.corpus)
        .select("doc_id").collect()
    )
    _merge_corpus(
        spark, st.corpus,
        [_doc(survivors[0], 10), (survivors[1], None, None, None, None,
                                  10, "D")],
    )
    st.sync_all(spark)
    st.assert_bit_exact(spark)
