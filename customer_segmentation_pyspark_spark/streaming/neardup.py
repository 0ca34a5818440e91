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


# ---------------------------------------------------------------------------
# Maintained MinHash-LSH near-dup index (r09, capstone #17) — the
# LAKEHOUSE twin of the streaming gate above: where the gate carries a
# signature sketch forward per micro-batch, the index below is a
# persistent, versioned LSH bucket MERGE table maintained from a corpus
# table's CHANGE DATA FEED, composed entirely from existing parts (the
# maintained-BM25 recipe, `streaming/retrieval.py`):
#
# * bucket table — one row per (band, band_hash, doc), keyed by the
#   ``band:hash:doc`` surrogate; a doc's post-image re-emits all its
#   band keys (upsert), pre-image keys absent from the post-image
#   tombstone — O(|Δdocs| x bands) per sync, never a corpus rescan.
#   Signature math is `operators/dedup.py`'s (one source of truth with
#   the batch operator and its SQL oracle).
# * bucket locality — the secondary column index
#   (`streaming/colindex.py`) on the ``bucket`` column gives probes a
#   partition-pruned, STALE-EXACT path.
#
# A probe touches O(probe docs x bands) state: band keys computed
# in-flight, only their buckets read, candidate pairs out. Hot-bucket
# capping for boilerplate-heavy corpora stays with the batch operator's
# windowed cap — at probe time volume is probe-bounded.
# ---------------------------------------------------------------------------

import os  # noqa: E402

from customer_segmentation_pyspark_spark.operators.dedup import (  # noqa: E402
    band_keys,
    minhash_signatures,
    shingles,
)
from customer_segmentation_pyspark_spark.streaming.views import (  # noqa: E402
    _write_marker,
    view_src_version,
)

BKEY = "__bkey"

#: above this many probe buckets, the probe switches from the column
#: index's value-list point-read to a broadcast semi-join over the
#: bucket table — a shard-sized probe's buckets never become a driver
#: IN-list (the same switch as the IVF/SCD2/jvmap reads)
_PROBE_POINT_READ_MAX = 256


def _band_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    num_hashes: int,
    bands: int,
    rows_per_band: int,
) -> DataFrame:
    """(doc_id, band_id, band_hash, bucket) for every doc in ``df`` —
    the exact batch packing (shared constants, shared band math)."""
    named = df.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    sig = minhash_signatures(
        shingles(named, text_col, n), num_hashes
    )
    bk = band_keys(sig, bands, rows_per_band)
    return bk.select(
        F.col("doc_id"),
        F.col("band_id").cast("long").alias("band_id"),
        F.col("band_hash").cast("long").alias("band_hash"),
        F.concat_ws(
            ":", F.col("band_id"), F.col("band_hash")
        ).alias("bucket"),
    )


def sync_lsh_index(
    spark: SparkSession,
    corpus_dir: str,
    idx_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    rows_per_band: int = 2,
    num_partitions: int = 32,
    up_to: int | None = None,
) -> int:
    """Bring the LSH bucket table up to the corpus's latest version,
    folding only the CDF since the cursored version (seeding from the
    snapshot on first call — `_snapshot_or_empty`, so a committed-but-
    emptied corpus seeds an empty table, cursor only). Post-images
    re-emit every band key of the doc (keyed upsert); pre-image band
    keys the post-image no longer produces tombstone (a re-texted doc
    whose signature moved leaves no ghost buckets). Idempotent per
    slice (upserts + tombstones of absent keys) — the postings-table
    crash-replay story, not the additive views'."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_snapshot_changes,
    )
    from customer_segmentation_pyspark_spark.streaming.views import (
        _snapshot_or_empty,
    )

    # ``up_to`` pins the slice's target version (r10): the wave
    # pipelining hook — a concurrent next-wave corpus commit cannot
    # blur this fold's granularity (immutable manifests/dirs)
    cur = versioned.latest_version(corpus_dir) if up_to is None else up_to
    if cur < 1:
        raise FileNotFoundError(f"no committed snapshot in {corpus_dir}")
    v0 = view_src_version(idx_dir) if os.path.isdir(idx_dir) else None
    if v0 is not None and v0 >= cur:
        return v0

    def _with_bkey(rows: DataFrame) -> DataFrame:
        return rows.withColumn(
            BKEY,
            F.concat_ws(
                ":",
                F.col("band_id"),
                F.col("band_hash"),
                F.col("doc_id").cast("string"),
            ),
        )

    kw = dict(n=n, num_hashes=num_hashes, bands=bands,
              rows_per_band=rows_per_band)
    if v0 is None:
        snap = _snapshot_or_empty(spark, corpus_dir, cur).select(
            id_col, text_col
        )
        batch = _with_bkey(
            _band_rows(snap, id_col, text_col, **kw)
        ).select(
            BKEY, "doc_id", "band_id", "band_hash", "bucket",
            F.lit(0).cast("long").alias("__seq"),
            F.lit("U").alias("__op"),
        )
    else:
        # checkpoint the slice (r11): posts and pres are two branches of
        # one staging plan, and each runs the banding explode — without
        # this the manifest-diff plan executes twice per sync
        cdf = read_snapshot_changes(
            spark, corpus_dir, v0, cur
        ).localCheckpoint(eager=True)
        ct = F.col("_change_type")
        posts = _band_rows(
            cdf.filter(ct.isin("insert", "update_postimage")).select(
                id_col, text_col
            ),
            id_col, text_col, **kw,
        )
        pres = _band_rows(
            cdf.filter(ct.isin("delete", "update_preimage")).select(
                id_col, text_col
            ),
            id_col, text_col, **kw,
        )
        gone = pres.join(
            posts.select("doc_id", "band_id", "band_hash"),
            ["doc_id", "band_id", "band_hash"],
            "left_anti",
        )
        batch = _with_bkey(posts).select(
            BKEY, "doc_id", "band_id", "band_hash", "bucket",
            F.lit(1).cast("long").alias("__seq"),
            F.lit("U").alias("__op"),
        ).unionByName(
            _with_bkey(gone).select(
                BKEY, "doc_id", "band_id", "band_hash", "bucket",
                F.lit(2).cast("long").alias("__seq"),
                F.lit("D").alias("__op"),
            )
        )
    # no localCheckpoint (r10): the staged merge executes the batch
    # plan exactly once (its staging write IS the materialization), so
    # the checkpoint this line used to carry — added when the merge
    # actioned its batch twice — became a pure extra job
    merge_into_partitioned_snapshot(
        spark,
        idx_dir,
        batch,
        key=BKEY,
        seq="__seq",
        num_partitions=num_partitions,
        delete_when="__op = 'D'",
        marker_cols=("__op",),
        # one band row per (doc_id, band_id) by construction: _band_rows
        # aggregates per band and `gone` is its anti-join complement
        assume_unique_keys=True,
    )
    os.makedirs(idx_dir, exist_ok=True)
    _write_marker(idx_dir, cur)
    return cur


def read_lsh_index(spark: SparkSession, idx_dir: str) -> DataFrame:
    """(doc_id, band_id, band_hash, bucket) — bookkeeping dropped."""
    from customer_segmentation_pyspark_spark.streaming.merge import (
        read_partitioned_snapshot,
    )

    return read_partitioned_snapshot(spark, idx_dir).drop(
        BKEY, "__seq", "__op"
    )


def neardup_probe_maintained(
    spark: SparkSession,
    idx_dir: str,
    probe_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    rows_per_band: int = 2,
    probe_observation=None,
) -> DataFrame:
    """Near-dup candidate pairs between ``probe_docs`` and the
    MAINTAINED corpus state: the probes' band keys are computed
    in-flight, ONLY their buckets are read (partition-pruned via the
    ``bucket`` column index when one exists — stale-exact, so the
    index may lag the table arbitrarily), and each bucket collision
    becomes a candidate. Output: distinct (doc_a, doc_b), doc_a <
    doc_b, self-pairs excluded — the same pair normalization as
    `operators/dedup.py:lsh_candidate_pairs`, so a probe with the
    final corpus as its own probe set reproduces the batch operator's
    pair set over live docs.

    Probe cost is O(probe docs x bands) state touched. Past
    ``_PROBE_POINT_READ_MAX`` distinct buckets the read switches from
    the index's value-list point-read to a semi-join of the bucket
    table against the (checkpointed) probe keys — a shard-sized
    probe's buckets never land on the driver.

    ``probe_observation`` (r10, VERDICT #5): an optional
    ``pyspark.sql.Observation`` attached to the index-side read —
    ``probe_idx_rows`` records how many stored band rows the probe
    actually consumed, the witness that probe cost is O(touched
    buckets), not O(index). Not populated on the empty-index
    fallback (there is no read to observe)."""
    from customer_segmentation_pyspark_spark.streaming.colindex import (
        read_by_column_value,
    )
    from customer_segmentation_pyspark_spark.streaming.merge import (
        read_partitioned_snapshot,
    )

    pb = _band_rows(
        probe_docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col)
        ),
        "doc_id", text_col, n, num_hashes, bands, rows_per_band,
    ).localCheckpoint(eager=True)  # reused: bucket sample + pair join
    sample = [
        r["bucket"]
        for r in pb.select("bucket").distinct()
        .limit(_PROBE_POINT_READ_MAX + 1).collect()
    ]
    try:
        if len(sample) <= _PROBE_POINT_READ_MAX:
            idx = read_by_column_value(spark, idx_dir, "bucket", sample)
        else:
            idx = read_partitioned_snapshot(spark, idx_dir).join(
                F.broadcast(pb.select("bucket").distinct()),
                "bucket",
                "leftsemi",
            )
    except FileNotFoundError:
        # corpus emptied before the first index sync: the seed
        # committed nothing (cursor only, no manifest) — no stored doc
        # can collide. Same hardening as bm25_query_maintained; here
        # the pair type IS recoverable, from the probe's own id column
        # (r09, ADVICE).
        id_t = probe_docs.schema[id_col].dataType
        from pyspark.sql import types as _T

        return spark.createDataFrame(
            [],
            _T.StructType(
                [
                    _T.StructField("doc_a", id_t),
                    _T.StructField("doc_b", id_t),
                ]
            ),
        )
    if probe_observation is not None:
        idx = idx.observe(
            probe_observation,
            F.count(F.lit(1)).alias("probe_idx_rows"),
        )
    hits = idx.select(
        F.col("bucket"), F.col("doc_id").alias("__idx_doc")
    ).join(
        pb.select("bucket", F.col("doc_id").alias("__probe_doc")),
        "bucket",
    ).filter(F.col("__idx_doc") != F.col("__probe_doc"))
    return hits.select(
        F.least("__idx_doc", "__probe_doc").alias("doc_a"),
        F.greatest("__idx_doc", "__probe_doc").alias("doc_b"),
    ).distinct()
