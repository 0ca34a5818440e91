"""Maintained MinHash-LSH near-dup index (r09, capstone #17): the
dedup half of the corpus-curation stack as INCREMENTALLY MAINTAINED
state, composed entirely from existing engine parts — the same recipe
as the maintained BM25 index (`streaming/retrieval.py`):

* **bucket table** — an ordinary partitioned MERGE table, one row per
  (band, band_hash, doc), keyed by the ``band:hash:doc`` surrogate and
  maintained from the corpus CDF: a doc's post-image re-emits all its
  LSH band keys (upsert), and pre-image band keys absent from the
  post-image tombstone — O(|Δdocs| x bands) per sync, never a corpus
  rescan. The signature machinery is `operators/dedup.py`'s
  (shingles -> minhash_signatures -> band_keys), one source of truth
  with the batch operator and its SQL oracle.
* **bucket locality** — the secondary column index
  (`streaming/colindex.py`) on the table's ``bucket`` string column
  gives probe reads a partition-pruned, STALE-EXACT path (changed
  partitions union in, so the index may lag arbitrarily).

A probe then touches O(probe docs x their buckets) state: compute the
probe docs' band keys in-flight, read ONLY those buckets (pruned via
the column index), and emit candidate pairs — the daily-crawl dedup
gate where the corpus-side state is maintained once and each shard
pays its own size. Hot-bucket capping for boilerplate-heavy corpora
stays available downstream via `operators/dedup.py:
lsh_candidate_pairs`' windowed cap; the probe itself is bounded by the
probe set.

The reference has no dedup surface (SURVEY.md: a k-means notebook);
engine surface for the LLM-pipeline north star.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.operators.dedup import (
    band_keys,
    minhash_signatures,
    shingles,
)
from customer_segmentation_pyspark_spark.streaming.views import (
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

    cur = versioned.latest_version(corpus_dir)
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
        cdf = read_snapshot_changes(spark, corpus_dir, v0, cur)
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
    merge_into_partitioned_snapshot(
        spark,
        idx_dir,
        batch,
        key=BKEY,
        seq="__seq",
        num_partitions=num_partitions,
        delete_when="__op = 'D'",
        marker_cols=("__op",),
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
    probe's buckets never land on the driver."""
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
    if len(sample) <= _PROBE_POINT_READ_MAX:
        idx = read_by_column_value(spark, idx_dir, "bucket", sample)
    else:
        idx = read_partitioned_snapshot(spark, idx_dir).join(
            F.broadcast(pb.select("bucket").distinct()),
            "bucket",
            "leftsemi",
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
