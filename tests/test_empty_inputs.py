"""Operators must degrade to empty results — not crash — on empty inputs
(a filter that matches nothing, a scale factor with an empty slice)."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.operators import dedup, textops
from customer_segmentation_pyspark_spark.operators.sessions import session_stats
from customer_segmentation_pyspark_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_text_and_dedup_ops_on_empty(spark):
    docs = load_table(spark, SF_SMOKE, "documents").filter(F.lit(False))
    assert dedup.exact_dedup(docs).count() == 0
    assert dedup.minhash_dedup_pairs(docs).count() == 0
    assert dedup.simhash(docs).count() == 0
    assert dedup.ngram_jaccard_pairs(docs).count() == 0
    assert textops.chunk_documents(docs).count() == 0
    assert textops.tfidf_top_terms(docs).count() == 0
    assert textops.quality_features(docs).count() == 0


def test_sessions_and_windows_on_empty(spark):
    ev = load_table(spark, SF_SMOKE, "events").filter(F.lit(False))
    assert session_stats(ev).count() == 0
    from customer_segmentation_pyspark_spark.operators.preprocess import histogram2d

    pts = ev.select(F.hour("ts").alias("hour"), "value")
    assert histogram2d(pts, "hour", "value").count() == 0


def test_similarity_on_empty_queries(spark):
    from customer_segmentation_pyspark_spark.operators import similarity

    emb = load_table(spark, SF_SMOKE, "embeddings")
    empty_q = emb.filter(F.lit(False))
    assert similarity.brute_force_topk(emb, empty_q, k=3).count() == 0


def test_ivf_on_empty_corpus(spark):
    """Empty corpus must yield an empty result (same contract as
    brute_force_topk), not a TypeError from dim inference or a kmeans
    failure on an empty train frame."""
    from customer_segmentation_pyspark_spark.operators import similarity

    emb = load_table(spark, SF_SMOKE, "embeddings")
    empty_c = emb.filter(F.lit(False))
    q = emb.filter(F.col("vec_id") < 3)
    out = similarity.ivf_topk_cosine(empty_c, q, n_cells=4, n_probe=2, k=3)
    assert out.count() == 0


def test_short_document_shingles(spark):
    """Docs shorter than the shingle width yield zero shingles, not a
    descending-sequence explosion (the Spark sequence() gotcha)."""
    df = spark.createDataFrame([(1, "one two")], "doc_id long, text string")
    assert dedup.shingles(df, n=3).count() == 0
    # and chunking still yields exactly one (short) chunk
    chunks = textops.chunk_documents(df).collect()
    assert len(chunks) == 1 and chunks[0]["chunk_tokens"] == 2


def test_r02_batch_ops_on_empty(spark):
    """segment dedup, prefix-filtered Jaccard, and fuzzy edit-1 pairs
    return empty frames (same schema, no crash) on empty corpora."""
    docs = load_table(spark, SF_SMOKE, "documents").filter(F.lit(False))
    out = dedup.segment_dedup(docs)
    assert out.count() == 0
    assert set(out.columns) == {
        "doc_id", "n_segs", "n_dup_segs", "clean_text",
    }
    assert dedup.prefix_jaccard_pairs(docs).count() == 0
    cust = load_table(spark, SF_SMOKE, "customer").filter(F.lit(False))
    assert textops.fuzzy_edit1_pairs(cust, "c_name").count() == 0


def test_session3_ops_on_empty(spark):
    """Span profile/intervals, PQ ANN, RRF, preference pairs, novelty,
    and hard negatives all degrade to empty (or all-zero) frames with
    stable schemas on empty input — no crash, no driver error."""
    from customer_segmentation_pyspark_spark.operators import similarity
    from customer_segmentation_pyspark_spark.queries import _pq_codebooks

    docs = load_table(spark, SF_SMOKE, "documents").filter(F.lit(False))
    prof = dedup.duplicated_span_profile(docs)
    assert prof.count() == 0
    assert set(prof.columns) == {
        "doc_id", "n_spans", "n_dup_spans", "dup_span_ratio",
    }
    assert dedup.duplicated_span_intervals(docs).count() == 0
    assert textops.preference_pairs(docs).count() == 0
    assert textops.ngram_novelty(docs).count() == 0
    assert textops.curriculum_order(docs).count() == 0

    emb = load_table(spark, SF_SMOKE, "embeddings")
    empty_e = emb.filter(F.lit(False))
    q = emb.filter(F.col("vec_id") < 3)
    # empty corpus with live queries / live corpus with empty queries
    assert similarity.pq_topk(empty_e, q, _pq_codebooks(), k=3).count() == 0
    assert similarity.pq_topk(emb, empty_e, _pq_codebooks(), k=3).count() == 0
    assert similarity.hard_negatives(emb, empty_e, k=3).count() == 0
    assert similarity.rrf_fuse(
        [empty_e.selectExpr("vec_id as doc_id", "vec_id as rank")], k=5,
        id_col="doc_id",
    ).count() == 0


def test_new_graph_and_incremental_ops_on_empty(spark):
    """bfs_hops / label_propagation / sssp_bounded / incremental dedup
    degrade to (near-)empty results on an empty graph or corpus."""
    from customer_segmentation_pyspark_spark.operators.graph import (
        bfs_hops,
        label_propagation,
        sssp_bounded,
    )

    e0 = spark.createDataFrame([], "src bigint, dst bigint")
    # BFS from a source with no edges: just the source itself at hop 0
    assert [tuple(r) for r in bfs_hops(e0, 7, 3).collect()] == [(7, 0)]
    assert label_propagation(e0, 2).count() == 0
    ew0 = spark.createDataFrame([], "src bigint, dst bigint, w double")
    assert [tuple(r) for r in sssp_bounded(ew0, 7, 3).collect()] == [
        (7, 0.0)
    ]
    docs = load_table(spark, SF_SMOKE, "documents").filter(F.lit(False))
    assert (
        dedup.incremental_jaccard_pairs(
            docs, F.col("doc_id") % 5 == 0
        ).count()
        == 0
    )
