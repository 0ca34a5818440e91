"""Custom Python DataSource: parallel partitions, deterministic output,
full integration with downstream engine operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.sources.synthetic import (
    SyntheticDocsSource,
)


def _read(spark, n_docs=500, n_partitions=8):
    spark.dataSource.register(SyntheticDocsSource)
    return (
        spark.read.format("synthetic_docs")
        .option("n_docs", n_docs)
        .option("n_partitions", n_partitions)
        .load()
    )


def test_custom_source_rows_and_determinism(spark):
    df1 = _read(spark)
    assert df1.count() == 500
    assert df1.select("doc_id").distinct().count() == 500
    r1 = sorted(map(tuple, df1.collect()))
    r2 = sorted(map(tuple, _read(spark).collect()))
    assert r1 == r2
    assert df1.rdd.getNumPartitions() == 8


def test_custom_source_feeds_engine_operators(spark):
    from customer_segmentation_pyspark_spark.operators import textops

    df = _read(spark, n_docs=200, n_partitions=4)
    counts = textops.token_count(F.col("text"))
    got = df.select((counts == F.col("n_tokens")).alias("ok")).collect()
    assert all(r["ok"] for r in got)
    # chunking runs straight off the custom source
    chunks = textops.chunk_documents(df)
    assert chunks.count() >= 200


def test_streaming_reader_matches_batch_rows(spark, tmp_path):
    """The streaming half of the custom source: micro-batches advance a
    checkpointed doc_id cursor, and the rows for ids [0, N) are byte-
    identical to the batch reader's (shared deterministic generator)."""
    import time

    from customer_segmentation_pyspark_spark.sources.synthetic import (
        SyntheticDocsSource,
    )

    try:
        spark.dataSource.register(SyntheticDocsSource)
    except Exception:
        pass  # already registered by the batch test in this session

    seen: dict[int, list] = {}

    def capture(batch_df, batch_id):
        seen[batch_id] = batch_df.collect()

    q = (
        spark.readStream.format("synthetic_docs")
        .option("batch_docs", 50)
        .option("n_partitions", 3)
        .load()
        .writeStream.foreachBatch(capture)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    deadline = time.time() + 90
    while time.time() < deadline and sum(len(v) for v in seen.values()) < 100:
        time.sleep(0.5)
    q.stop()
    rows = [r for _, batch in sorted(seen.items()) for r in batch]
    assert len(rows) >= 100
    got_ids = sorted(r["doc_id"] for r in rows)
    assert got_ids[:100] == list(range(100)), "cursor must be gapless"

    batch_rows = {
        r["doc_id"]: r
        for r in spark.read.format("synthetic_docs")
        .option("n_docs", 100)
        .option("n_partitions", 4)
        .load()
        .collect()
    }
    for r in rows:
        if r["doc_id"] < 100:
            b = batch_rows[r["doc_id"]]
            assert (r["text"], r["lang"], r["n_tokens"]) == (
                b["text"],
                b["lang"],
                b["n_tokens"],
            )


def test_binaryfile_source_reads_blobs(spark, tmp_path):
    """spark.read.format('binaryFile') — the multimodal raw-ingest path:
    opaque blobs arrive as (path, modificationTime, length, content)
    rows; content round-trips byte-exact and pathGlobFilter prunes
    non-matching files at the listing level."""
    blobs = {
        "a.img": b"\x89fakepng\x00\x01\x02",
        "b.img": b"\xffjpegish" * 100,
        "skip.txt": b"not an image",
    }
    for name, data in blobs.items():
        (tmp_path / name).write_bytes(data)
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.img")
        .load(str(tmp_path))
    )
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.img", "b.img"}
    for name, r in rows.items():
        assert bytes(r["content"]) == blobs[name]
        assert r["length"] == len(blobs[name])


def test_custom_python_datasource_writer_round_trip(spark, tmp_path):
    """df.write.format('jsonl_shards') two-phase commit: all rows land,
    no .tmp files survive a successful commit, and a second overwrite
    replaces (not appends) the shards."""
    from customer_segmentation_pyspark_spark.sources import load_table
    from customer_segmentation_pyspark_spark.sources.synthetic import (
        JsonlShardSink,
    )
    from tests.conftest import SF_SMOKE

    spark.dataSource.register(JsonlShardSink)
    out = str(tmp_path / "shards")
    d = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang")
    d.write.format("jsonl_shards").option("path", out).mode(
        "overwrite"
    ).save()

    import glob
    import json
    import os

    files = sorted(glob.glob(os.path.join(out, "part-*.jsonl")))
    assert files, "commit produced no shards"
    assert not glob.glob(os.path.join(out, ".tmp-*")), "stranded tmp files"
    rows = []
    for p in files:
        with open(p) as f:
            rows.extend(json.loads(ln) for ln in f)
    expect = {(r["doc_id"], r["lang"]) for r in d.collect()}
    assert {(r["doc_id"], r["lang"]) for r in rows} == expect

    # overwrite replaces
    d.limit(7).write.format("jsonl_shards").option("path", out).mode(
        "overwrite"
    ).save()
    rows2 = []
    for p in sorted(glob.glob(os.path.join(out, "part-*.jsonl"))):
        with open(p) as f:
            rows2.extend(json.loads(ln) for ln in f)
    assert len(rows2) == 7
