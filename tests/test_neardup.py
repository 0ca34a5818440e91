"""Maintained MinHash-LSH near-dup index (r09, capstone #17): the
bucket table must track the batch band-key recompute through corpus
churn, and the composed probe (bucket column index, left stale) must
equal the batch LSH candidate pairs over the final corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
)
from customer_segmentation_pyspark_spark.streaming.colindex import (
    sync_column_index,
    vacuum_column_index,
)
from customer_segmentation_pyspark_spark.streaming.merge import (
    merge_into_partitioned_snapshot,
    read_partitioned_snapshot,
)
from customer_segmentation_pyspark_spark.streaming.neardup import (
    _band_rows,
    neardup_probe_maintained,
    read_lsh_index,
    sync_lsh_index,
)

SCHEMA = "doc_id long, text string, seq long, op string"

# 3-shingle docs over a tiny vocab: docs sharing a 3-word run share
# shingles -> near-identical signatures -> shared buckets
_T = {
    1: "alpha beta gamma delta epsilon",
    2: "alpha beta gamma delta zeta",      # near-dup of 1
    3: "omega psi chi phi upsilon",
    4: "omega psi chi phi tau",            # near-dup of 3
    5: "one two three four five",
}

WAVES = [
    [(d, t, 0, "U") for d, t in _T.items()],
    # re-text 2 away from 1 (its old buckets must tombstone), delete 3
    # (all its buckets go), insert 6 as a fresh near-dup of 5
    [(2, "completely different words entirely now", 1, "U"),
     (3, None, 1, "D"),
     (6, "one two three four six", 1, "U")],
    # re-insert 3 with 4's text (now a near-dup of 4), tweak 5
    [(3, "omega psi chi phi tau", 2, "U"),
     (5, "one two three four five extra", 2, "U")],
]


def _merge_wave(spark, corpus, rows):
    merge_into_partitioned_snapshot(
        spark, corpus, spark.createDataFrame(rows, SCHEMA),
        key="doc_id", seq="seq", num_partitions=4,
        delete_when="op = 'D'", marker_cols=("op",),
    )


def _live(spark, corpus):
    return read_partitioned_snapshot(spark, corpus).select(
        "doc_id", "text"
    )


def _batch_pairs(live):
    sig = minhash_signatures(shingles(live, "text", 3), 16)
    return {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(sig, 8, 2).collect()
    }


def test_lsh_index_tracks_recompute(spark, tmp_path):
    corpus = str(tmp_path / "c")
    idx = str(tmp_path / "i")
    for rows in WAVES:
        _merge_wave(spark, corpus, rows)
        sync_lsh_index(spark, corpus, idx, num_partitions=4)
        got = {
            (r["doc_id"], r["band_id"], r["band_hash"])
            for r in read_lsh_index(spark, idx).collect()
        }
        want = {
            (r["doc_id"], r["band_id"], r["band_hash"])
            for r in _band_rows(
                _live(spark, corpus), "doc_id", "text", 3, 16, 8, 2
            ).collect()
        }
        assert got == want, (len(got), len(want))
    # wave specifics: doc 2's old (shared-with-1) buckets tombstoned,
    # doc 3 regained buckets with the re-insert
    assert 3 in {r["doc_id"] for r in read_lsh_index(spark, idx).collect()}


def test_probe_equals_batch_even_stale_and_through_vacuum(
    spark, tmp_path
):
    """Probing with the final live corpus as its own probe set must
    reproduce the batch LSH pair set exactly — with the bucket column
    index synced only once (stale through two waves) and then
    vacuumed mid-churn (GC composes)."""
    corpus = str(tmp_path / "c")
    idx = str(tmp_path / "i")
    for i, rows in enumerate(WAVES):
        _merge_wave(spark, corpus, rows)
        sync_lsh_index(spark, corpus, idx, num_partitions=4)
        if i == 0:
            sync_column_index(spark, idx, "bucket", num_partitions=4)
        if i == 1:
            vacuum_column_index(spark, idx, "bucket")
        live = _live(spark, corpus)
        got = {
            (r["doc_a"], r["doc_b"])
            for r in neardup_probe_maintained(
                spark, idx, live
            ).collect()
        }
        assert got == _batch_pairs(live), (i, got)
    # the engineered near-dups surface; the re-texted doc 2 does not
    assert (3, 4) in got and all(2 not in p for p in got)


def test_probe_large_bucket_set_stays_off_driver(spark, tmp_path):
    """A shard-sized probe (buckets >> the 256 cap) must not build a
    driver value list: spy on collect() through the probe and bound
    every result by the probe's own bucket sample."""
    from customer_segmentation_pyspark_spark.streaming.neardup import (
        _PROBE_POINT_READ_MAX,
    )

    corpus = str(tmp_path / "c")
    idx = str(tmp_path / "i")
    n_docs = 80  # 80 docs x 8 bands >> 256 distinct buckets
    rows = [
        (i, f"w{i} w{i + 1} w{i + 2} w{i + 3} w{i + 4}", 0, "U")
        for i in range(n_docs)
    ]
    _merge_wave(spark, corpus, rows)
    sync_lsh_index(spark, corpus, idx, num_partitions=4)
    live = _live(spark, corpus)
    n_buckets = (
        _band_rows(live, "doc_id", "text", 3, 16, 8, 2)
        .select("bucket").distinct().count()
    )
    assert n_buckets > _PROBE_POINT_READ_MAX

    from pyspark.sql.classic.dataframe import DataFrame as _DF

    import pytest as _pytest

    sizes = []
    orig = _DF.collect

    def spy(self):
        out = orig(self)
        sizes.append(len(out))
        return out

    mp = _pytest.MonkeyPatch()
    mp.setattr(_DF, "collect", spy)
    try:
        got = orig(neardup_probe_maintained(spark, idx, live))
    finally:
        mp.undo()
    assert sizes, "probe made no collects — spy misses the path"
    assert max(sizes) <= _PROBE_POINT_READ_MAX + 1, sorted(
        sizes, reverse=True
    )[:5]
    # sequential vocab shares 3-grams between neighbors -> pairs exist
    assert {(r["doc_a"], r["doc_b"]) for r in got} == _batch_pairs(live)


def test_lsh_sync_up_to_pins_slice_then_catches_up(spark, tmp_path):
    """r10 wave pipelining twin of the BM25 test: a pinned
    `sync_lsh_index(..., up_to=v)` folds exactly one wave's CDF slice
    even with a later corpus version already committed, leaves the
    cursor at the pin, and the next un-pinned sync catches up to the
    batch band-key recompute."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.views import (
        view_src_version,
    )

    corpus = str(tmp_path / "c")
    idx = str(tmp_path / "i")
    _merge_wave(spark, corpus, WAVES[0])
    sync_lsh_index(spark, corpus, idx, num_partitions=4)
    pin = versioned.latest_version(corpus) + 1
    _merge_wave(spark, corpus, WAVES[1])
    _merge_wave(spark, corpus, WAVES[2])
    sync_lsh_index(spark, corpus, idx, num_partitions=4, up_to=pin)
    assert view_src_version(idx) == pin
    # reference: sequential build through wave 1 only
    cr = str(tmp_path / "cr")
    ir = str(tmp_path / "ir")
    for i in range(2):
        _merge_wave(spark, cr, WAVES[i])
        sync_lsh_index(spark, cr, ir, num_partitions=4)
    got = {
        (r["doc_id"], r["band_id"], r["band_hash"])
        for r in read_lsh_index(spark, idx).collect()
    }
    want = {
        (r["doc_id"], r["band_id"], r["band_hash"])
        for r in read_lsh_index(spark, ir).collect()
    }
    assert got == want, (len(got), len(want))
    # catch-up: un-pinned sync folds wave 2; index == batch recompute
    sync_lsh_index(spark, corpus, idx, num_partitions=4)
    got = {
        (r["doc_id"], r["band_id"], r["band_hash"])
        for r in read_lsh_index(spark, idx).collect()
    }
    want = {
        (r["doc_id"], r["band_id"], r["band_hash"])
        for r in _band_rows(
            _live(spark, corpus), "doc_id", "text", 3, 16, 8, 2
        ).collect()
    }
    assert got == want, (len(got), len(want))
