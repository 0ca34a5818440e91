"""Streaming near-duplicate ingestion gate.

The streaming twin of ``operators/dedup.incremental_jaccard_pairs``:
documents arrive in micro-batches; each batch is MinHash-signed and
LSH-probed against a compact SIGNATURE INDEX accumulated from every
earlier batch, flagged docs are emitted, and the batch's signatures are
appended to the index. The index holds one 17-int row per doc (doc_id +
16 minhash values) — a few GB per billion docs — so the state a
crawl-ingestion pipeline carries is the sketch, never the corpus text.

Scale shape per batch: signature computation is the batch-local
shingle->minhash pipeline (map-side combinable); the probe is the SAME
capped band equi-join as the batch operator (`lsh_candidate_pairs`),
run on index ∪ batch with the pair filter "touches a batch doc" — so
old-old pairs are never re-examined and per-batch cost is
O(|batch| x bucket). Exactly-once-ish: the index append is idempotent
under replay because reads dedup on doc_id (last-writer-wins is
irrelevant for deterministic signatures).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.operators import dedup


def batch_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, sig) MinHash signatures for a (micro-)batch of docs."""
    sh = dedup.shingles(docs)
    return dedup.minhash_signatures(sh, num_hashes=16)


def _read_index(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """Read the signature index, or None when it doesn't exist yet.
    Probed via the Spark reader (not a driver-local os.path check) so
    the index may live on any Hadoop-compatible filesystem
    (hdfs://, s3a://, ...).

    Only the two "index does not exist yet" conditions map to None:
    PATH_NOT_FOUND (no directory) and UNABLE_TO_INFER_SCHEMA (directory
    exists but holds no parquet footers — a fresh checkpoint dir).
    Every OTHER failure (corrupt footer, permission denial, transient
    store error) re-raises: swallowing it would silently probe against
    an empty index, permanently miss all old-vs-new duplicate pairs,
    and still append the batch's signatures as if the probe had run.
    """
    from pyspark.errors import AnalysisException

    _ABSENT = {"PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"}
    try:
        return spark.read.parquet(index_dir).dropDuplicates(["doc_id"])
    except AnalysisException as e:
        cond = e.getCondition() if hasattr(e, "getCondition") else None
        if cond in _ABSENT or any(c in str(e) for c in _ABSENT):
            return None
        raise


def probe_and_update_index(
    batch_docs: DataFrame,
    index_dir: str,
    bands: int = 8,
    rows_per_band: int = 2,
    probe_observation=None,
) -> DataFrame:
    # probe_observation: a FRESH pyspark Observation per call (Spark
    # allows one observe() per instance); exposes `probe_docs` = the
    # probe population (touched index docs + batch) as a free metric.
    """Flag batch docs with an LSH candidate in (index ∪ batch), then
    append the batch's signatures to the index. Returns the flagged
    frame ``(doc_a, doc_b)`` (one row per candidate pair touching a
    batch doc, ids ordered).

    Incremental cost contract: before the (bucket-quadratic) pair
    expansion, the accumulated signatures are PRE-FILTERED to docs
    sharing at least one band key with the batch — buckets containing
    only old docs are never window-counted or expanded, so per-batch
    cost is O(|batch| x bucket) no matter how large the index grows.
    (Old-old pairs inside a TOUCHED bucket are still generated and
    dropped by the is_new filter — bounded by the batch's bucket
    footprint, not the index.)

    Why the prefilter cannot perturb the hot-bucket cap (the flagged
    output equals the batch twin's new-touching pairs at ANY bucket
    size, including above ``max_bucket_size``):

    * A bucket that contains a batch doc ("touched") keeps its FULL
      population after prefiltering — every old doc in it shares that
      very band key with the batch, so the semi-join retains all of
      them, and ``lsh_candidate_pairs`` sees the same bucket size (old
      + new) the batch twin sees.  Cap decisions and star anchors
      therefore coincide exactly on every bucket that can emit a
      new-touching pair.
    * A bucket with NO batch doc may shrink below the cap after
      prefiltering (its surviving members were retained via other
      bands) and take a different expansion path than the twin — but
      every pair it emits is old-old and is dropped by the is_new
      filter, so the flagged output is unaffected.

    Pinned by test_stream_dedup.py::test_gate_hot_bucket_matches_batch
    (hot bucket spanning index and batch, above the cap)."""
    spark = batch_docs.sparkSession
    new_sigs = batch_signatures(batch_docs).localCheckpoint(eager=True)
    old_sigs = _read_index(spark, index_dir)
    if old_sigs is not None:
        new_bands = (
            dedup.band_keys(new_sigs, bands, rows_per_band)
            .select("band_id", "band_hash")
            .distinct()
        )
        touched_old = (
            dedup.band_keys(old_sigs, bands, rows_per_band)
            .join(new_bands, ["band_id", "band_hash"], "semi")
            .select("doc_id")
            .distinct()
        )
        all_sigs = (
            old_sigs.join(touched_old, "doc_id", "semi")
            .unionByName(new_sigs)
            .dropDuplicates(["doc_id"])
        )
    else:
        all_sigs = new_sigs
    if probe_observation is not None:
        # free metric on the probe POPULATION (touched index docs +
        # batch): the incremental-cost contract says this stays
        # O(|batch| x bucket) however large the index grows — the scale
        # smoke (test_scale_smoke.py) pins it against a 100k-doc index
        all_sigs = all_sigs.observe(
            probe_observation,
            F.count(F.lit(1)).alias("probe_docs"),
        )
    new_ids = new_sigs.select("doc_id").withColumn(
        "is_new", F.lit(True)
    )
    pairs = dedup.lsh_candidate_pairs(
        all_sigs, bands=bands, rows_per_band=rows_per_band
    )
    flagged = (
        pairs.join(
            new_ids.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "is_new", "a_new"
            ),
            "doc_a",
            "left",
        )
        .join(
            new_ids.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "is_new", "b_new"
            ),
            "doc_b",
            "left",
        )
        .filter(
            F.coalesce("a_new", F.lit(False))
            | F.coalesce("b_new", F.lit(False))
        )
        .select("doc_a", "doc_b")
    )
    out = flagged.localCheckpoint(eager=True)
    new_sigs.write.mode("append").parquet(index_dir)
    return out


def near_dup_gate_stream(
    spark: SparkSession,
    src_dir: str,
    schema,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Structured-Streaming wrapper: read document files as they land,
    run the probe-and-update gate per micro-batch via foreachBatch,
    append flagged pairs to ``out_dir``. Returns the streaming query
    (caller awaits/stops)."""

    def handle(batch_df: DataFrame, _batch_id: int) -> None:
        flagged = probe_and_update_index(batch_df, index_dir)
        flagged.write.mode("append").parquet(out_dir)

    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
