"""Streaming dedup: dropDuplicatesWithinWatermark removes re-deliveries
across micro-batches while keeping state bounded by the watermark — the
streaming-ingestion twin of the batch exact-dedup operator."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_streaming_dedup_within_watermark(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events").limit(200).cache()
    src = str(tmp_path / "src")
    # batch 1: the events; batch 2: the SAME events re-delivered (e.g. an
    # at-least-once source retrying)
    ev.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.2)
    ev.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("stream_dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql("SELECT event_id FROM stream_dedup_test").collect()
    ids = [r["event_id"] for r in got]
    assert len(ids) == len(set(ids)) == ev.count()
    ev.unpersist()


def test_streaming_corpus_dedup_by_fingerprint(spark, tmp_path):
    """Incremental corpus ingestion: a second wave re-delivers the same
    documents under NEW doc_ids (a crawler re-fetch). Streaming dedup on
    the CONTENT fingerprint drops them; survivors equal the batch
    exact-dedup group count."""
    from customer_segmentation_pyspark_spark.operators import dedup

    docs = load_table(spark, SF_SMOKE, "documents").limit(100).cache()
    n_groups = dedup.exact_dedup(docs).count()
    src = str(tmp_path / "docs_src")
    docs.coalesce(1).write.mode("append").parquet(src)
    # wave 2: same texts, shifted ids — content dupes, id-distinct
    docs.withColumn(
        "doc_id", F.col("doc_id") + F.lit(10_000_000)
    ).coalesce(1).write.mode("append").parquet(src)

    fp = F.md5(
        F.trim(
            F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
        ).cast("binary")
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src)
        .withColumn("fp", fp)
        .dropDuplicates(["fp"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("stream_corpus_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT fp FROM stream_corpus_dedup").collect()
    fps = [r["fp"] for r in got]
    assert len(fps) == len(set(fps)) == n_groups
    docs.unpersist()


def test_streaming_near_dup_gate_matches_batch_lsh(spark, tmp_path):
    """Near-dup ingestion gate: docs arrive in two micro-batches; the
    accumulated-signature probe must flag exactly the LSH candidate
    pairs that TOUCH a batch-2 doc when batch 2 lands — equal to the
    batch operator run on the full corpus with the same filter — and
    the signature index must end up holding every doc once."""
    from customer_segmentation_pyspark_spark.operators import dedup
    from customer_segmentation_pyspark_spark.streaming.neardup import (
        near_dup_gate_stream,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text"
    )
    batch1 = docs.filter(F.col("doc_id") % 2 == 0)
    batch2 = docs.filter(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "src")
    batch1.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.2)
    batch2.coalesce(1).write.mode("append").parquet(src)

    index_dir = str(tmp_path / "index")
    out_dir = str(tmp_path / "flagged")
    q = near_dup_gate_stream(
        spark,
        src,
        batch1.schema,
        index_dir,
        out_dir,
        str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(120), "stream did not finish in 120s"

    got = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(out_dir).collect()
    }
    # batch twin: all LSH pairs, each counted when its LATER side lands
    all_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidate_pairs(
            dedup.minhash_signatures(dedup.shingles(docs), 16)
        ).collect()
    }
    assert got == all_pairs  # every pair touches its later-arriving doc
    n_docs = docs.count()
    idx = spark.read.parquet(index_dir)
    assert idx.select("doc_id").distinct().count() == n_docs


def test_read_index_corrupt_raises(spark, tmp_path):
    """_read_index maps exactly two conditions to 'no index yet'
    (missing path, empty dir) and RE-RAISES everything else — a corrupt
    footer must never be mistaken for an absent index (which would
    silently drop all old-vs-new pairs forever). ADVICE r02."""
    from customer_segmentation_pyspark_spark.streaming.neardup import (
        _read_index,
    )

    assert _read_index(spark, str(tmp_path / "missing")) is None
    empty = tmp_path / "empty"
    empty.mkdir()
    assert _read_index(spark, str(empty)) is None

    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "part-0.parquet").write_bytes(b"garbage" * 64)
    outcome = "returned-none"
    try:
        if _read_index(spark, str(bad)) is not None:
            outcome = "returned-frame"
    except Exception:
        outcome = "raised"
    assert outcome == "raised", (
        f"corrupt index must raise, not be treated as absent ({outcome})"
    )


def test_gate_hot_bucket_matches_batch(spark, tmp_path):
    """Hot-bucket contract (ADVICE r02): a band bucket ABOVE the LSH cap
    that spans index and batch docs keeps its full population through
    the touched-bucket prefilter, so the gate's flagged output equals
    the batch twin's new-touching pairs even on the oversized-bucket
    star path."""
    from customer_segmentation_pyspark_spark.operators import dedup
    from customer_segmentation_pyspark_spark.streaming.neardup import (
        probe_and_update_index,
    )

    boiler = (
        "the quick brown fox jumps over the lazy dog near the river bank "
        "while the miller grinds the grain and the baker bakes the bread"
    )
    n_hot = 1100  # > default max_bucket_size=1024
    rows = [(i, boiler) for i in range(n_hot)]
    rows += [(10_000 + i, f"unique document number {i} with words {i * 7}")
             for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    old = docs.filter((F.col("doc_id") < 550) | (F.col("doc_id") % 2 == 0))
    new = docs.join(old, "doc_id", "left_anti")

    # prove the fixture actually exercises the oversized path: every
    # band bucket of the boilerplate group holds all n_hot docs
    sigs = dedup.minhash_signatures(dedup.shingles(docs), 16)
    max_bucket = (
        dedup.band_keys(sigs)
        .groupBy("band_id", "band_hash")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert max_bucket > 1024

    index_dir = str(tmp_path / "idx")
    probe_and_update_index(old, index_dir)  # seed the index
    got = {
        (r["doc_a"], r["doc_b"])
        for r in probe_and_update_index(new, index_dir).collect()
    }

    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    twin = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidate_pairs(sigs).collect()
        if r["doc_a"] in new_ids or r["doc_b"] in new_ids
    }
    assert got == twin
