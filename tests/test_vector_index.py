"""Maintained IVF vector index: build/query twin-equality with the
one-shot IVF probe, incremental update ≡ full rebuild on the final
corpus, O(affected-cells) rewrites (untouched dirs carried verbatim),
delete/insert routing through the keymap, and manifest time travel."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from customer_segmentation_pyspark_spark.operators import similarity
from customer_segmentation_pyspark_spark.operators.vector_index import (
    build_ivf_index,
    query_ivf_index,
    read_ivf_index,
    update_ivf_index,
)
from customer_segmentation_pyspark_spark.sources import load_table, versioned
from tests.conftest import SF_SMOKE

CELLS = np.random.RandomState(11).normal(size=(8, 64)).tolist()

CH_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
        StructField("seq", LongType()),
        StructField("op", StringType()),
    ]
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )


def _wave(e):
    """Moves (re-embed %10), deletes (%7, higher seq so delete wins a
    %70 collision), inserts (+100000 from %9)."""
    moved = e.filter(F.col("vec_id") % 10 == 0).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double") + 0.5).alias(
            "embedding"
        ),
        F.lit(1).cast("long").alias("seq"),
        F.lit("U").alias("op"),
    )
    dels = e.filter(F.col("vec_id") % 7 == 0).select(
        "vec_id",
        F.lit(None).cast("array<double>").alias("embedding"),
        F.lit(2).cast("long").alias("seq"),
        F.lit("D").alias("op"),
    )
    ins = e.filter(F.col("vec_id") % 9 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") * 0.5).alias(
            "embedding"
        ),
        F.lit(1).cast("long").alias("seq"),
        F.lit("U").alias("op"),
    )
    return moved.unionByName(dels).unionByName(ins)


def test_build_query_equals_oneshot_ivf(spark, tmp_path):
    e = _emb(spark)
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, e, CELLS)
    q = e.filter(F.col("vec_id") < 5)
    got = query_ivf_index(spark, idx, q, n_probe=3, k=5)
    want = similarity.ivf_topk_cosine(e, q, n_probe=3, k=5, cells=CELLS)
    assert _rows(got) == _rows(want)


def test_incremental_update_equals_rebuild(spark, tmp_path):
    e = _emb(spark)
    inc = str(tmp_path / "inc")
    build_ivf_index(spark, inc, e, CELLS)
    update_ivf_index(spark, inc, _wave(e))

    final = read_ivf_index(spark, inc)
    # the maintained corpus is exactly the replayed change log
    n_e = e.count()
    n_moved_dead = e.filter(
        (F.col("vec_id") % 7 == 0)
    ).count()
    n_ins = e.filter(F.col("vec_id") % 9 == 0).count()
    assert final.count() == n_e - n_moved_dead + n_ins

    rebuilt = str(tmp_path / "rebuilt")
    build_ivf_index(spark, rebuilt, final, CELLS)
    q = final.filter(F.col("vec_id") < 5)
    got = query_ivf_index(spark, inc, q, n_probe=3, k=5)
    want = query_ivf_index(spark, rebuilt, q, n_probe=3, k=5)
    assert _rows(got) == _rows(want)
    # and both equal the one-shot probe over the final corpus
    oneshot = similarity.ivf_topk_cosine(
        final, q, n_probe=3, k=5, cells=CELLS
    )
    assert _rows(got) == _rows(oneshot)


def test_update_rewrites_only_affected_cells(spark, tmp_path):
    e = _emb(spark)
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, e, CELLS)
    man1 = versioned.read_manifest(idx)
    # a single-key move touches at most 2 cells (old + new)
    one = spark.createDataFrame(
        [
            (
                int(e.select("vec_id").first()["vec_id"]),
                [0.1] * 64,
                1,
                "U",
            )
        ],
        CH_SCHEMA,
    )
    update_ivf_index(spark, idx, one)
    man2 = versioned.read_manifest(idx)
    changed = {
        c
        for c in set(man1["parts"]) | set(man2["parts"])
        if man1["parts"].get(c) != man2["parts"].get(c)
    }
    assert 1 <= len(changed) <= 2, changed
    for c in set(man1["parts"]) - changed:
        assert man1["parts"][c] == man2["parts"][c], "untouched dir replaced"


def test_deletes_and_inserts_route(spark, tmp_path):
    e = _emb(spark)
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, e, CELLS)
    update_ivf_index(spark, idx, _wave(e))
    ids = {r["vec_id"] for r in read_ivf_index(spark, idx).collect()}
    dead = {
        r["vec_id"]
        for r in e.filter(F.col("vec_id") % 7 == 0).collect()
    }
    assert not (ids & dead), "deleted keys must leave the index"
    assert any(i >= 100000 for i in ids), "inserted keys must arrive"
    # metadata row count stays exact through incremental rewrites
    assert versioned.snapshot_row_count(idx) == len(ids)


def test_query_time_travel(spark, tmp_path):
    e = _emb(spark)
    idx = str(tmp_path / "idx")
    v1 = build_ivf_index(spark, idx, e, CELLS)
    q = e.filter(F.col("vec_id") < 5)
    before = _rows(query_ivf_index(spark, idx, q, n_probe=3, k=5))
    update_ivf_index(spark, idx, _wave(e))
    after = _rows(query_ivf_index(spark, idx, q, n_probe=3, k=5))
    at_v1 = _rows(query_ivf_index(spark, idx, q, n_probe=3, k=5, version=v1))
    assert at_v1 == before
    assert after != before


def test_sync_index_follows_corpus_cdf(spark, tmp_path):
    """Capstone pipeline: corpus MERGE waves -> CDF -> incremental index
    update with an exactly-once src_version cursor. The synced index
    must equal a fresh build over the corpus's final state; a re-sync
    with no new corpus version is a no-op."""
    from customer_segmentation_pyspark_spark.operators.vector_index import (
        sync_ivf_index_to_snapshot,
    )
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )

    e = _emb(spark)
    corpus = str(tmp_path / "corpus")
    merge_into_partitioned_snapshot(
        spark,
        corpus,
        e.withColumn("seq", F.lit(0).cast("long")),
        key="vec_id",
        seq="seq",
        num_partitions=8,
    )
    idx = str(tmp_path / "idx")
    assert sync_ivf_index_to_snapshot(spark, corpus, idx, CELLS) == 1

    # corpus takes the move/delete/insert wave as a MERGE
    merge_into_partitioned_snapshot(
        spark,
        corpus,
        _wave(e),
        key="vec_id",
        seq="seq",
        delete_when="op = 'D'",
        marker_cols=("op",),
    )
    assert sync_ivf_index_to_snapshot(spark, corpus, idx, CELLS) == 2
    assert sync_ivf_index_to_snapshot(spark, corpus, idx, CELLS) == 2  # no-op

    final = read_partitioned_snapshot(spark, corpus).select(
        "vec_id", "embedding"
    )
    rebuilt = str(tmp_path / "rebuilt")
    build_ivf_index(spark, rebuilt, final, CELLS)
    q = final.filter(F.col("vec_id") < 5)
    got = query_ivf_index(spark, idx, q, n_probe=3, k=5)
    want = query_ivf_index(spark, rebuilt, q, n_probe=3, k=5)
    assert _rows(got) == _rows(want)


def test_update_reapply_converges(spark, tmp_path):
    """Applying the same CDC batch twice (the crash-retry path) must
    leave the index identical to a single application — the superset
    keymap makes the second pass a content no-op."""
    e = _emb(spark)
    once = str(tmp_path / "once")
    twice = str(tmp_path / "twice")
    for d in (once, twice):
        build_ivf_index(spark, d, e, CELLS)
    update_ivf_index(spark, once, _wave(e))
    update_ivf_index(spark, twice, _wave(e))
    update_ivf_index(spark, twice, _wave(e))  # the retry
    assert _rows(read_ivf_index(spark, once)) == _rows(
        read_ivf_index(spark, twice)
    )


def test_rebuild_keymap_shrinks_supersets(spark, tmp_path):
    """After moves bloat a key's cell set, rebuild shrinks live keys to
    singletons and the next update's affected set follows suit."""
    from customer_segmentation_pyspark_spark.operators.vector_index import (
        rebuild_ivf_keymap,
    )
    from customer_segmentation_pyspark_spark.streaming.merge import (
        read_partitioned_snapshot,
    )

    e = _emb(spark)
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, e, CELLS)
    k = int(e.select("vec_id").first()["vec_id"])
    # bounce the key between two embeddings so its set accumulates
    for i, emb in enumerate(([0.1] * 64, [-9.0] * 64, [0.1] * 64)):
        update_ivf_index(
            spark,
            idx,
            spark.createDataFrame([(k, emb, i + 1, "U")], CH_SCHEMA),
        )
    km = str(tmp_path / "idx" / "_keymap")
    bloated = read_partitioned_snapshot(spark, km, key_in=[k]).collect()
    assert len(bloated[0]["cells"]) >= 2
    rebuild_ivf_keymap(spark, idx)
    shrunk = read_partitioned_snapshot(spark, km, key_in=[k]).collect()
    assert len(shrunk[0]["cells"]) == 1
    # index content untouched by the rebuild
    assert versioned.snapshot_row_count(idx) == e.count()


def test_streaming_ivf_upsert_equals_batch(spark, tmp_path):
    """A CDC stream replayed through streaming_ivf_upsert must leave the
    index identical to the batch update path."""
    from customer_segmentation_pyspark_spark.operators.vector_index import (
        streaming_ivf_upsert,
    )

    e = _emb(spark)
    batch_idx = str(tmp_path / "batch_idx")
    stream_idx = str(tmp_path / "stream_idx")
    for d in (batch_idx, stream_idx):
        build_ivf_index(spark, d, e, CELLS)
    update_ivf_index(spark, batch_idx, _wave(e))

    src = str(tmp_path / "cdc_src")
    _wave(e).write.parquet(src)
    stream = (
        spark.readStream.schema(CH_SCHEMA).format("parquet").load(src)
    )
    q = streaming_ivf_upsert(
        spark, stream, stream_idx, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)
    assert _rows(read_ivf_index(spark, stream_idx)) == _rows(
        read_ivf_index(spark, batch_idx)
    )


def test_sync_advances_cursor_over_no_change_versions(spark, tmp_path):
    """A source version bump that changes no rows (compaction) must
    still advance the index's CDF cursor so sync stops re-diffing."""
    from customer_segmentation_pyspark_spark.operators.vector_index import (
        sync_ivf_index_to_snapshot,
    )
    from customer_segmentation_pyspark_spark.streaming.merge import (
        compact_partitioned_snapshot,
        merge_into_partitioned_snapshot,
    )

    e = _emb(spark)
    corpus = str(tmp_path / "corpus")
    merge_into_partitioned_snapshot(
        spark,
        corpus,
        e.withColumn("seq", F.lit(0).cast("long")),
        key="vec_id",
        seq="seq",
        num_partitions=8,
    )
    idx = str(tmp_path / "idx")
    sync_ivf_index_to_snapshot(spark, corpus, idx, CELLS)
    compact_partitioned_snapshot(spark, corpus, target_files=1)
    v = versioned.latest_version(corpus)
    assert sync_ivf_index_to_snapshot(spark, corpus, idx, CELLS) == v
    assert versioned.read_manifest(idx)["src_version"] == v
    # and the probe still matches the untouched corpus content
    q = e.filter(F.col("vec_id") < 3)
    got = query_ivf_index(spark, idx, q, n_probe=3, k=5)
    assert got.count() == 15


def test_expire_versions_collects_index_cells(spark, tmp_path):
    """Retention works on index tables: expiring old index versions
    collects the cell dirs only they referenced, while the live
    version's dirs and reads survive."""
    import os

    e = _emb(spark)
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, e, CELLS)
    update_ivf_index(spark, idx, _wave(e))
    before = {
        d for d in os.listdir(idx) if d.startswith("c-")
    }
    live = set(versioned.read_manifest(idx)["parts"].values())
    assert before - live, "old versions should hold superseded dirs"
    expired = versioned.expire_versions(idx, keep_last=1, grace_sec=0)
    assert expired
    after = {d for d in os.listdir(idx) if d.startswith("c-")}
    assert after == live, "exactly the live dirs must survive"
    q = e.filter(F.col("vec_id") < 5)
    assert query_ivf_index(spark, idx, q, n_probe=3, k=5).count() > 0


def test_cloned_index_heals_missing_keymap(spark, tmp_path):
    """clone_snapshot copies the manifest but not the _keymap subtable;
    the first update on the clone must rebuild it rather than ghost a
    moved key."""
    e = _emb(spark)
    src = str(tmp_path / "src")
    build_ivf_index(spark, src, e, CELLS)
    dst = str(tmp_path / "dst")
    versioned.clone_snapshot(src, dst)
    update_ivf_index(spark, dst, _wave(e))
    got = read_ivf_index(spark, dst)
    # no duplicated keys (the ghost-copy failure mode)
    assert got.count() == got.select("vec_id").distinct().count()
    # and content equals the batch path on the original
    update_ivf_index(spark, src, _wave(e))
    assert _rows(got) == _rows(read_ivf_index(spark, src))


def test_ivf_random_walk_model(spark, tmp_path):
    """Seeded random walk of CDC batches: after every update the index
    content equals a Python dict replay, and the keymap-superset
    invariant holds (every key's actual cell is in its keymap set)."""
    import random

    from customer_segmentation_pyspark_spark.operators.vector_index import (
        _cell_expr,
    )
    from customer_segmentation_pyspark_spark.streaming.merge import (
        read_partitioned_snapshot,
    )

    rng = random.Random(13)
    dim = 8
    cells = np.random.RandomState(3).normal(size=(4, dim)).tolist()
    keys = list(range(40))
    base = {k: [float(k % 5), *([0.5] * (dim - 1))] for k in keys[:20]}
    idx = str(tmp_path / "idx")
    corpus = spark.createDataFrame(
        [(k, v) for k, v in base.items()], "vec_id long, embedding array<double>"
    )
    build_ivf_index(spark, idx, corpus, cells)
    model = dict(base)
    for step in range(8):
        wave = []
        for i in range(rng.randint(1, 6)):
            k = rng.choice(keys)
            seq = (step + 1) * 100 + i  # unique: latest-wins is exact
            if rng.random() < 0.3:
                wave.append((k, None, seq, "D"))
            else:
                vec = [rng.uniform(-2, 2) for _ in range(dim)]
                wave.append((k, vec, seq, "U"))
        latest = {}
        for k, v, s, op in wave:
            if k not in latest or s > latest[k][0]:
                latest[k] = (s, v, op)
        update_ivf_index(
            spark,
            idx,
            spark.createDataFrame(
                [(k, v, s, op) for k, v, s, op in wave],
                "vec_id long, embedding array<double>, seq long, op string",
            ),
        )
        for k, (_s, v, op) in latest.items():
            if op == "D":
                model.pop(k, None)
            else:
                model[k] = v
        got = {
            r["vec_id"]: r["embedding"]
            for r in read_ivf_index(spark, idx).collect()
        }
        assert got == model, f"step {step}"
        # keymap superset invariant
        km = read_partitioned_snapshot(
            spark, str(tmp_path / "idx" / "_keymap")
        )
        sets = {r["vec_id"]: set(r["cells"]) for r in km.collect()}
        actual = spark.createDataFrame(
            [(k, v) for k, v in model.items()],
            "vec_id long, embedding array<double>",
        ).select(
            "vec_id",
            _cell_expr(cells, F.col("embedding")).cast("long").alias("c"),
        )
        for r in actual.collect():
            assert r["c"] in sets[r["vec_id"]], (
                f"step {step}: key {r['vec_id']} cell {r['c']} "
                f"missing from keymap set {sets.get(r['vec_id'])}"
            )


def test_filtered_search_equals_prefiltered_ivf(spark, tmp_path):
    """Post-filter probe over payload columns ≡ one-shot IVF over the
    pre-filtered corpus (fixed quantizer: cell assignment is
    per-vector, so filtering commutes with indexing)."""
    e = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, e, CELLS)
    q = e.filter(F.col("vec_id") < 5)
    got = query_ivf_index(
        spark, idx, q, n_probe=3, k=5, where=[("label", "=", 2)]
    )
    want = similarity.ivf_topk_cosine(
        e.filter(F.col("label") == 2), q, n_probe=3, k=5, cells=CELLS
    )
    assert _rows(got) == _rows(want)
    assert got.count() > 0


def test_filtered_search_stats_prune_dirs(spark, tmp_path):
    """When payload values correlate with cells, the manifest footer
    stats refute whole probed dirs before any file opens."""
    import os

    dim = 8
    centers = [[float(10 * j)] + [0.0] * (dim - 1) for j in range(4)]
    rows = [
        (j * 100 + i, [10.0 * j + 0.01 * i] + [0.0] * (dim - 1), j)
        for j in range(4)
        for i in range(20)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, corpus, centers)
    q = corpus.filter(F.col("vec_id") == 0)  # sits in cell 0
    out = query_ivf_index(
        spark, idx, q, n_probe=3, k=5, where=[("label", "=", 2)]
    )
    man = versioned.read_manifest(idx)
    # the pruning decision itself (r06: the escalation path's
    # localCheckpoint hides file scans from inputFiles(), so assert on
    # the extracted helper): probes = cells {0,1,2}, but stats kill
    # all except label 2's cell
    from customer_segmentation_pyspark_spark.operators.vector_index import (
        _pruned_probe_dirs,
    )

    dirs = _pruned_probe_dirs(
        idx, man, {"0", "1", "2"}, [("label", "=", 2)]
    )
    assert {os.path.basename(d) for d in dirs} == {man["parts"]["2"]}
    got = {r["neighbor_id"] for r in out.collect()}
    assert got and all(200 <= n < 300 for n in got)


def test_payload_column_evolution(spark, tmp_path):
    """A CDC batch may introduce a NEW payload column: rewritten cells
    gain it, untouched cells surface NULL through mergeSchema, and
    filtered search over the new column still works."""
    e = _emb(spark)
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, e, CELLS)  # no payload at all
    first = int(e.select("vec_id").first()["vec_id"])
    evolved = spark.createDataFrame(
        [(first, [0.25] * 64, 1, "U", 7)],
        "vec_id long, embedding array<double>, seq long, op string, "
        "label int",
    )
    update_ivf_index(spark, idx, evolved)
    got = query_ivf_index(
        spark, idx, e.filter(F.col("vec_id") < 5), n_probe=8, k=5,
        where=[("label", "=", 7)],
    )
    assert {r["neighbor_id"] for r in got.collect()} <= {first}


def test_update_rejects_null_keys(spark, tmp_path):
    """A NULL key in the CDC batch must be refused up front (r06,
    ADVICE: a None in the survivor isin() list silently drops every
    survivor of the affected cells)."""
    import pytest

    from customer_segmentation_pyspark_spark.operators.vector_index import (
        build_ivf_index,
        query_ivf_index,
        update_ivf_index,
    )

    idx = str(tmp_path / "idx")
    base = spark.createDataFrame(
        [(i, [float(i % 3), float(i % 5)]) for i in range(1, 21)],
        "vec_id long, embedding array<double>",
    )
    cells = [[0.0, 0.0], [2.0, 4.0]]
    build_ivf_index(spark, idx, base, cells)
    bad = spark.createDataFrame(
        [(None, [1.0, 1.0], 1, "U"), (5, [0.5, 0.5], 1, "U")],
        "vec_id long, embedding array<double>, seq long, op string",
    )
    with pytest.raises(ValueError, match="NULL"):
        update_ivf_index(spark, idx, bad)
    # the index is untouched: the survivor set is intact
    q = spark.createDataFrame(
        [(0, [0.4, 0.4])], "vec_id long, embedding array<double>"
    )
    got = query_ivf_index(spark, idx, q, k=25, n_probe=2)
    assert got.count() == 20


def test_large_wave_keys_stay_off_driver(spark, tmp_path, monkeypatch):
    """A re-embedding wave's keys must never be materialized on the
    driver (r09, VERDICT #2): past the 64-key cap the keymap read
    becomes a semi-join and the survivor filter an anti-join against
    the checkpointed delta. Spy on every collect() during the update
    and assert none returns more rows than the bounded sample — a
    wave-sized IN-list plan is impossible without a wave-sized
    collect. Exactness of this exact wave is already pinned by
    test_incremental_update_equals_rebuild."""
    # patch the CONCRETE class (pyspark.sql.DataFrame is an abstract
    # base in Spark 4 — instances resolve collect on the classic one)
    from pyspark.sql.classic.dataframe import DataFrame as _DF

    from customer_segmentation_pyspark_spark.operators.vector_index import (
        _IVF_POINT_READ_MAX,
    )

    e = _emb(spark)
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, e, CELLS)
    wave = _wave(e)
    n_keys = wave.select("vec_id").distinct().count()
    assert n_keys > _IVF_POINT_READ_MAX, "fixture no longer a large wave"
    n_before = read_ivf_index(spark, idx).count()

    sizes = []
    orig = _DF.collect

    def spy(self):
        out = orig(self)
        sizes.append(len(out))
        return out

    monkeypatch.setattr(_DF, "collect", spy)
    try:
        update_ivf_index(spark, idx, wave)
    finally:
        monkeypatch.undo()
    assert sizes, "update made no collects at all — spy misses the path"
    assert max(sizes) <= _IVF_POINT_READ_MAX + 1, (
        f"a collect returned {max(sizes)} rows during a "
        f"{n_keys}-key wave: {sorted(sizes, reverse=True)[:5]}"
    )
    # the fold still landed (deletes net against inserts per _wave)
    got = read_ivf_index(spark, idx).count()
    n_dead = e.filter(F.col("vec_id") % 7 == 0).count()
    n_ins = e.filter(F.col("vec_id") % 9 == 0).count()
    assert got == n_before - n_dead + n_ins


def _inject_foreign_index_commit_once(monkeypatch, index_dir, foreign_fn):
    """Fire foreign_fn in the read->commit window of the FIRST
    conditional commit on the INDEX manifest (keymap-table commits
    pass through untouched)."""
    real = versioned.commit_manifest
    state = {"armed": True}

    def wrapped(table_dir, manifest, expected_latest=None):
        if (
            state["armed"]
            and expected_latest is not None
            and table_dir == index_dir
        ):
            state["armed"] = False
            foreign_fn()
        return real(table_dir, manifest, expected_latest)

    monkeypatch.setattr(versioned, "commit_manifest", wrapped)


def _one_up(spark, key, vec):
    return spark.createDataFrame([(key, vec, 1, "U")], CH_SCHEMA)


def test_concurrent_disjoint_index_updates_both_survive(
    spark, tmp_path, monkeypatch
):
    """OCC (r06, VERDICT #1): two interleaved CDC waves touching
    DISJOINT cells must both commit — the loser rebases, nothing is
    reverted, and no ghost copies remain anywhere."""
    e = _emb(spark)
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, e, CELLS)
    # vectors AT two distinct centers land in exactly those cells
    va, vb = list(CELLS[0]), list(CELLS[3])

    def foreign():
        update_ivf_index(spark, idx, _one_up(spark, 777001, vb))

    _inject_foreign_index_commit_once(monkeypatch, idx, foreign)
    update_ivf_index(spark, idx, _one_up(spark, 777000, va))

    final = read_ivf_index(spark, idx)
    ids = {r["vec_id"] for r in final.select("vec_id").collect()}
    assert 777000 in ids and 777001 in ids  # both updates survive
    assert final.count() == e.count() + 2
    # no ghost cells: the maintained index answers queries exactly like
    # a fresh build over its own content
    rebuilt = str(tmp_path / "rebuilt")
    build_ivf_index(spark, rebuilt, final, CELLS)
    q = spark.createDataFrame(
        [(0, va), (1, vb)], "vec_id long, embedding array<double>"
    )
    assert _rows(query_ivf_index(spark, idx, q, n_probe=2, k=5)) == _rows(
        query_ivf_index(spark, rebuilt, q, n_probe=2, k=5)
    )


def test_concurrent_same_cell_index_update_raises(
    spark, tmp_path, monkeypatch
):
    """Overlapping cell sets must NOT silently compose: the loser's
    survivor read is stale. Re-running the loser converges."""
    import pytest

    from customer_segmentation_pyspark_spark.streaming.merge import (
        ConcurrentMergeError,
    )

    e = _emb(spark)
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, e, CELLS)
    va = list(CELLS[0])

    def foreign():
        update_ivf_index(spark, idx, _one_up(spark, 888001, va))

    _inject_foreign_index_commit_once(monkeypatch, idx, foreign)
    with pytest.raises(ConcurrentMergeError):
        update_ivf_index(spark, idx, _one_up(spark, 888000, va))
    # the foreign commit is intact; the re-run lands on top of it
    update_ivf_index(spark, idx, _one_up(spark, 888000, va))
    ids = {r["vec_id"] for r in read_ivf_index(spark, idx).collect()}
    assert 888000 in ids and 888001 in ids
    assert versioned.snapshot_row_count(idx) == e.count() + 2


def test_cursor_advance_does_not_revert_foreign_update(
    spark, tmp_path, monkeypatch
):
    """The empty-batch CDF-cursor commit used to write the WHOLE stale
    manifest unconditionally — a foreign update in the window was
    silently reverted. Now it rebases (r06, VERDICT #1)."""
    e = _emb(spark)
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, e, CELLS, src_version=1)
    va = list(CELLS[0])

    def foreign():
        update_ivf_index(spark, idx, _one_up(spark, 999000, va))

    _inject_foreign_index_commit_once(monkeypatch, idx, foreign)
    empty = spark.createDataFrame([], CH_SCHEMA)
    update_ivf_index(spark, idx, empty, src_version=2)
    man = versioned.read_manifest(idx)
    assert man["src_version"] == 2  # cursor advanced
    ids = {r["vec_id"] for r in read_ivf_index(spark, idx).collect()}
    assert 999000 in ids  # ... without reverting the foreign update


# ---------------------------------------------------------------- r06: splits


def _split_mod(spark, tmp_path):
    from customer_segmentation_pyspark_spark.operators import vector_index

    return vector_index


def test_split_preserves_content_and_queries(spark, tmp_path):
    """Splitting hot cells must not change a single probe result: the
    probe opens the sub dirs of a probed split cell, so the candidate
    set is identical (VERDICT #2's oracle property)."""
    from customer_segmentation_pyspark_spark.operators.vector_index import (
        split_ivf_cells,
    )

    e = _emb(spark)
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, e, CELLS)
    q = e.filter(F.col("vec_id") < 5)
    before = _rows(query_ivf_index(spark, idx, q, n_probe=3, k=5))
    man0 = versioned.read_manifest(idx)
    hot = sorted(man0["rows"], key=lambda c: -man0["rows"][c])[:2]
    done = split_ivf_cells(spark, idx, cell_ids=hot, sub_k=2, seed=7)
    assert sorted(done) == sorted(hot)
    man1 = versioned.read_manifest(idx)
    # content preserved exactly
    assert read_ivf_index(spark, idx).count() == e.count()
    assert versioned.snapshot_row_count(idx) == e.count()
    # untouched cells carried byte-identical (same dir names)
    for c in set(man0["parts"]) - set(hot):
        assert man1["parts"][c] == man0["parts"][c]
    for c in hot:
        assert c not in man1["parts"]
        assert str(c) in man1["subcells"]
    # probe results identical pre/post split
    after = _rows(query_ivf_index(spark, idx, q, n_probe=3, k=5))
    assert after == before


def test_split_bounds_hot_cell_rows(spark, tmp_path):
    """A genuinely hot cell ends with every resulting dir under the old
    size (trained sub-centers actually divide the data)."""
    from customer_segmentation_pyspark_spark.operators.vector_index import (
        split_ivf_cells,
    )

    e = _emb(spark)
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, e, CELLS)
    man0 = versioned.read_manifest(idx)
    hot = max(man0["rows"], key=lambda c: man0["rows"][c])
    n_hot = man0["rows"][hot]
    split_ivf_cells(spark, idx, cell_ids=[hot], sub_k=4, seed=3)
    man1 = versioned.read_manifest(idx)
    subs = man1["subcells"][hot]["ids"]
    sub_rows = [man1["rows"].get(str(i), 0) for i in subs]
    assert sum(sub_rows) == n_hot  # no rows lost or duplicated
    assert max(sub_rows) < n_hot  # the hot dir actually shrank


def test_update_routes_through_split_cells_no_ghosts(spark, tmp_path):
    """After a split, CDC updates must route into sub-cells and leave
    no ghost copies: incremental result equals a fresh rebuild."""
    from customer_segmentation_pyspark_spark.operators.vector_index import (
        split_ivf_cells,
    )

    e = _emb(spark)
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, e, CELLS)
    man0 = versioned.read_manifest(idx)
    hot = sorted(man0["rows"], key=lambda c: -man0["rows"][c])[:2]
    split_ivf_cells(spark, idx, cell_ids=hot, sub_k=2, seed=7)
    update_ivf_index(spark, idx, _wave(e))
    final = read_ivf_index(spark, idx)
    # one copy per key — a missed sub dir would leave a moved key twice
    assert final.count() == final.select("vec_id").distinct().count()
    rebuilt = str(tmp_path / "rebuilt")
    build_ivf_index(spark, rebuilt, final, CELLS)
    q = final.filter(F.col("vec_id") < 5)
    assert _rows(query_ivf_index(spark, idx, q, n_probe=3, k=5)) == _rows(
        query_ivf_index(spark, rebuilt, q, n_probe=3, k=5)
    )


def test_resplit_widens_and_stays_exact(spark, tmp_path):
    """Re-splitting a still-hot sub cell retrains the WHOLE top cell
    with more centers; probe results stay identical."""
    from customer_segmentation_pyspark_spark.operators.vector_index import (
        split_ivf_cells,
    )

    e = _emb(spark)
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, e, CELLS)
    q = e.filter(F.col("vec_id") < 5)
    before = _rows(query_ivf_index(spark, idx, q, n_probe=3, k=5))
    man0 = versioned.read_manifest(idx)
    hot = max(man0["rows"], key=lambda c: man0["rows"][c])
    split_ivf_cells(spark, idx, cell_ids=[hot], sub_k=2, seed=7)
    man1 = versioned.read_manifest(idx)
    sub0 = man1["subcells"][hot]["ids"][0]
    split_ivf_cells(spark, idx, cell_ids=[sub0], sub_k=2, seed=7)
    man2 = versioned.read_manifest(idx)
    assert len(man2["subcells"][hot]["ids"]) >= 3  # widened
    for i in man1["subcells"][hot]["ids"]:
        assert str(i) not in man2["parts"]  # old sub dirs retired
    assert read_ivf_index(spark, idx).count() == e.count()
    assert _rows(query_ivf_index(spark, idx, q, n_probe=3, k=5)) == before


def test_filtered_search_escalates_to_k(spark, tmp_path):
    """k-guarantee (VERDICT #3): a selective predicate that starves the
    initial probe set widens to deeper cells; result equals the
    same rule applied over a brute-force rerank."""
    import numpy as np

    # 4 tight clusters; label-9 rows live ONLY near center 3, so a
    # query near center 0 with n_probe=1 finds none initially
    rng = np.random.RandomState(5)
    centers = rng.normal(size=(4, 8)) * 10
    rows = []
    for i in range(200):
        c = i % 4
        v = (centers[c] + rng.normal(size=8) * 0.01).tolist()
        label = 9 if c == 3 else c
        rows.append((i, v, label))
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, corpus, centers.tolist())
    q = corpus.filter(F.col("vec_id") == 0)  # cluster 0
    got = query_ivf_index(
        spark, idx, q, n_probe=1, k=5, where=[("label", "=", 9)]
    )
    out = got.collect()
    assert len(out) == 5, "starved result must escalate to k"
    assert all(r["neighbor_id"] % 4 == 3 for r in out)
    # unfiltered probe with n_probe=1 is untouched: only cluster-0 rows
    plain = query_ivf_index(spark, idx, q, n_probe=1, k=5)
    assert all(r["neighbor_id"] % 4 == 0 for r in plain.collect())


def test_index_random_walk(spark, tmp_path):
    """Seeded fuzz over the index op set (VERDICT r05 #1's fuzz ask):
    interleave CDC waves, hot-cell splits, re-splits, and keymap
    rebuilds in random order, checking the indexed corpus against a
    plain dict model after every step and probe-equality vs a fresh
    build at the end."""
    import random

    import numpy as np

    from customer_segmentation_pyspark_spark.operators.vector_index import (
        rebuild_ivf_keymap,
        split_ivf_cells,
    )

    rng = random.Random(7)
    nprng = np.random.RandomState(7)
    idx = str(tmp_path / "idx")
    keys = list(range(100))
    model = {
        k: [float(nprng.randint(-5, 5)) for _ in range(8)] for k in keys
    }
    cells = nprng.normal(size=(4, 8)).tolist()
    corpus = spark.createDataFrame(
        [(k, v) for k, v in model.items()],
        "vec_id long, embedding array<double>",
    )
    build_ivf_index(spark, idx, corpus, cells)
    seq = 0
    for step in range(10):
        seq += 1
        roll = rng.random()
        if roll < 0.55:  # CDC wave: moves, deletes, inserts
            rows = []
            seen = set()
            for _ in range(rng.randint(1, 8)):
                k = rng.randrange(140)
                if k in seen:
                    continue
                seen.add(k)
                if rng.random() < 0.3:
                    rows.append((k, None, seq, "D"))
                    model.pop(k, None)
                else:
                    v = [float(rng.randint(-5, 5)) for _ in range(8)]
                    rows.append((k, v, seq, "U"))
                    model[k] = v
            if rows:
                update_ivf_index(
                    spark,
                    idx,
                    spark.createDataFrame(
                        rows,
                        "vec_id long, embedding array<double>, "
                        "seq long, op string",
                    ),
                )
        elif roll < 0.85:  # split (or re-split) a random live cell
            man = versioned.read_manifest(idx)
            if man["rows"]:
                target = rng.choice(sorted(man["rows"]))
                split_ivf_cells(
                    spark, idx, cell_ids=[target], sub_k=2,
                    seed=rng.randrange(100),
                )
        else:
            rebuild_ivf_keymap(spark, idx)
        got = {
            r["vec_id"]: list(r["embedding"])
            for r in read_ivf_index(spark, idx).collect()
        }
        assert got == model, f"step {step}: index diverged from model"
        assert versioned.snapshot_row_count(idx) == len(model)
    # probe equality vs a fresh build over the final state
    final = read_ivf_index(spark, idx)
    rebuilt = str(tmp_path / "rebuilt")
    build_ivf_index(spark, rebuilt, final, cells)
    q = final.filter(F.col("vec_id") < 5)
    assert _rows(query_ivf_index(spark, idx, q, n_probe=2, k=5)) == _rows(
        query_ivf_index(spark, rebuilt, q, n_probe=2, k=5)
    )


def test_sub_probe_narrows_io_with_full_recall_on_clustered_data(
    spark, tmp_path
):
    """r06 scale path: sub_probe opens only the nearest sub-cells of a
    probed split cell — fewer files read, and on tightly clustered
    data the nearest sub-cell holds every true neighbor (recall 1.0
    here by construction)."""
    import numpy as np

    from customer_segmentation_pyspark_spark.operators.vector_index import (
        split_ivf_cells,
    )

    rng = np.random.RandomState(9)
    top = (rng.normal(size=(2, 8)) * 20).tolist()
    # two tight sub-clusters INSIDE top cell 0, far apart from each
    # other relative to their spread
    sub_a = np.array(top[0]) + 3.0
    sub_b = np.array(top[0]) - 3.0
    rows = []
    for i in range(200):
        base = sub_a if i % 2 == 0 else sub_b
        rows.append(
            (i, (base + rng.normal(size=8) * 0.01).tolist())
        )
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, corpus, top)
    split_ivf_cells(
        spark, idx, cell_ids=["0"],
        sub_centers={"0": [sub_a.tolist(), sub_b.tolist()]},
    )
    q = corpus.filter(F.col("vec_id") == 0)  # lives in sub_a
    exact = query_ivf_index(spark, idx, q, n_probe=1, k=5)
    narrow = query_ivf_index(spark, idx, q, n_probe=1, k=5, sub_probe=1)
    assert _rows(narrow) == _rows(exact)  # full recall here
    assert len(set(narrow.inputFiles())) < len(set(exact.inputFiles()))
    # the narrowed probe returns only even ids (the sub_a cluster)
    assert all(r["neighbor_id"] % 2 == 0 for r in narrow.collect())


def test_split_raises_on_concurrent_update(spark, tmp_path, monkeypatch):
    """A CDC update landing in the split's read->commit window must
    abort the split (its staged rewrite derives from a stale survivor
    read); the re-run composes on the updated index and probes stay
    exact."""
    import pytest

    from customer_segmentation_pyspark_spark.operators.vector_index import (
        split_ivf_cells,
    )
    from customer_segmentation_pyspark_spark.streaming.merge import (
        ConcurrentMergeError,
    )

    e = _emb(spark)
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, e, CELLS)
    man0 = versioned.read_manifest(idx)
    hot = max(man0["rows"], key=lambda c: man0["rows"][c])

    def foreign():
        update_ivf_index(
            spark, idx, _one_up(spark, 555000, list(CELLS[int(hot)]))
        )

    _inject_foreign_index_commit_once(monkeypatch, idx, foreign)
    with pytest.raises(ConcurrentMergeError):
        split_ivf_cells(spark, idx, cell_ids=[hot], sub_k=2, seed=7)
    # the foreign update survived; the retried split lands on top
    split_ivf_cells(spark, idx, cell_ids=[hot], sub_k=2, seed=7)
    final = read_ivf_index(spark, idx)
    ids = {r["vec_id"] for r in final.select("vec_id").collect()}
    assert 555000 in ids
    assert final.count() == e.count() + 1
    rebuilt = str(tmp_path / "rebuilt")
    build_ivf_index(spark, rebuilt, final, CELLS)
    q = final.filter(F.col("vec_id") < 5)
    assert _rows(query_ivf_index(spark, idx, q, n_probe=3, k=5)) == _rows(
        query_ivf_index(spark, rebuilt, q, n_probe=3, k=5)
    )


def test_unfiltered_probe_plan_has_no_escalation_artifacts(
    spark, tmp_path
):
    """VERDICT r05 #3 done-criteria: the k-guarantee machinery must not
    touch the unfiltered path — its plan stays the single-pass probe
    (no checkpointed-RDD scans, no union of escalation levels)."""
    e = _emb(spark)
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, e, CELLS)
    q = e.filter(F.col("vec_id") < 5)
    plain = query_ivf_index(spark, idx, q, n_probe=3, k=5)
    plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan  # no localCheckpoint scan
    assert "Union" not in plan  # no escalation-level union
    # the filtered path MAY carry both; just assert it still runs
    got = query_ivf_index(
        spark, idx, q, n_probe=3, k=5, where=[("vec_id", "<", 100000)]
    )
    assert got.count() > 0


def test_vacuum_keymap_drops_deleted_keys(spark, tmp_path):
    """r06 keymap GC: after churn, vacuum leaves exactly one keymap row
    per LIVE key (stale deleted-key rows gone), preserves the keymap's
    partition sizing, and later updates still route correctly."""
    from customer_segmentation_pyspark_spark.operators.vector_index import (
        _keymap_dir,
        vacuum_ivf_keymap,
    )
    from customer_segmentation_pyspark_spark.streaming.merge import (
        read_partitioned_snapshot,
    )

    e = _emb(spark)
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, e, CELLS, keymap_partitions=8)
    update_ivf_index(spark, idx, _wave(e))  # deletes %7, moves, inserts
    live = read_ivf_index(spark, idx)
    n_live = live.count()
    km = read_partitioned_snapshot(spark, _keymap_dir(idx))
    assert km.count() > n_live  # stale rows for the deleted keys
    vacuum_ivf_keymap(spark, idx)
    km2 = read_partitioned_snapshot(spark, _keymap_dir(idx))
    assert km2.count() == n_live
    assert versioned.read_manifest(_keymap_dir(idx))["num_partitions"] == 8
    # a later update still finds keys and leaves no ghosts
    update_ivf_index(
        spark, idx, _one_up(spark, int(live.first()["vec_id"]),
                            list(CELLS[2]))
    )
    final = read_ivf_index(spark, idx)
    assert final.count() == final.select("vec_id").distinct().count()


def test_read_latest_bounded_on_stranded_pointer(spark, tmp_path):
    """r07 (ADVICE): a _LATEST pointer stranded above the highest
    committed manifest (the withdrawn-OCC-manifest race) must not spin
    the reader forever — after bounded retries it falls back to the
    highest committed manifest file, like read_manifest(dir, None)."""
    from customer_segmentation_pyspark_spark.operators.vector_index import (
        _read_latest_ivf,
    )

    e = _emb(spark)
    idx = str(tmp_path / "idx")
    committed = build_ivf_index(spark, idx, e, CELLS)
    # strand the pointer two versions above any committed manifest
    with open(f"{idx}/_LATEST", "w") as f:
        f.write(str(committed + 2))
    v, man = _read_latest_ivf(idx)
    assert v == committed
    assert man is not None and man["kind"] == "ivf"


def test_vacuum_repairs_and_raises_on_concurrent_update(
    spark, tmp_path, monkeypatch
):
    """r07 (ADVICE): an update whose commit lands during the vacuum's
    sweep may have had its just-merged keymap entries clipped — the
    vacuum's conditional final commit must fail, repair the keymap from
    the NEW manifest, and raise; the re-run converges with no ghosts."""
    import pytest

    from customer_segmentation_pyspark_spark.operators.vector_index import (
        vacuum_ivf_keymap,
    )
    from customer_segmentation_pyspark_spark.streaming.merge import (
        ConcurrentMergeError,
    )

    e = _emb(spark)
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, e, CELLS)
    moved_key = int(e.first()["vec_id"])

    real = versioned.commit_manifest
    state = {"armed": True}

    def wrapped(table_dir, manifest, expected_latest=None):
        if state["armed"] and manifest.get("operation") == "ivf-vacuum":
            state["armed"] = False
            update_ivf_index(
                spark, idx, _one_up(spark, moved_key, list(CELLS[5]))
            )
        return real(table_dir, manifest, expected_latest)

    monkeypatch.setattr(versioned, "commit_manifest", wrapped)
    with pytest.raises(ConcurrentMergeError):
        vacuum_ivf_keymap(spark, idx)
    monkeypatch.setattr(versioned, "commit_manifest", real)
    vacuum_ivf_keymap(spark, idx)  # re-run converges
    # move the key again: the keymap must still know its CURRENT cell
    update_ivf_index(spark, idx, _one_up(spark, moved_key, list(CELLS[1])))
    final = read_ivf_index(spark, idx)
    assert final.count() == final.select("vec_id").distinct().count()
    assert final.filter(F.col("vec_id") == moved_key).count() == 1


def test_update_rebases_over_vacuum_restoring_clipped_entries(
    spark, tmp_path, monkeypatch
):
    """r07: the other interleaving — a vacuum sweeping WHILE an update
    is between its keymap merge and its data commit clips the update's
    fresh entries; the update's rebase must re-merge them before
    retrying, so the key's next move still rewrites its real cell (no
    ghost copy)."""
    from customer_segmentation_pyspark_spark.operators.vector_index import (
        vacuum_ivf_keymap,
    )

    e = _emb(spark)
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, e, CELLS)
    # churn so the vacuum has stale rows to sweep
    update_ivf_index(spark, idx, _wave(e))

    def foreign():
        vacuum_ivf_keymap(spark, idx)

    _inject_foreign_index_commit_once(monkeypatch, idx, foreign)
    # a brand-new key: its keymap entry exists only from this update's
    # own merge — exactly what the vacuum's stale sweep clips
    update_ivf_index(spark, idx, _one_up(spark, 888000, list(CELLS[4])))
    # the update landed (rebased over the vacuum) ...
    final = read_ivf_index(spark, idx)
    assert final.filter(F.col("vec_id") == 888000).count() == 1
    # ... and moving the key MUST leave exactly one copy — a clipped
    # keymap entry would leave the CELLS[4] ghost behind
    update_ivf_index(spark, idx, _one_up(spark, 888000, list(CELLS[6])))
    final = read_ivf_index(spark, idx)
    assert final.count() == final.select("vec_id").distinct().count()
    assert final.filter(F.col("vec_id") == 888000).count() == 1


def test_filtered_probe_no_starvation_keeps_single_pass_plan(
    spark, tmp_path
):
    """r07 (VERDICT #4): when level 1 satisfies every query, the
    filtered path must return the r05 single-pass plan — no
    checkpointed-RDD scan, no escalation union, no semi-join — and
    still equal the always-checkpoint result."""
    e = _emb(spark)
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, e, CELLS)
    q = e.filter(F.col("vec_id") < 5)
    # a predicate satisfied by ~everything: nobody starves at level 1
    got = query_ivf_index(
        spark, idx, q, n_probe=3, k=5, where=[("vec_id", ">=", 0)]
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan  # no localCheckpoint scan
    assert "Union" not in plan  # no escalation-level union
    # equals the unfiltered probe (the predicate filters nothing)
    want = query_ivf_index(spark, idx, q, n_probe=3, k=5)
    assert _rows(got) == _rows(want)


def _skewed_wave(spark, start, n, seq):
    """80% of vectors near CELLS[0] (the hot cell), the rest spread."""
    rng = np.random.RandomState(start % 9973 + 7)
    rows = []
    for i in range(n):
        base = CELLS[0] if i % 5 else CELLS[(i // 5) % len(CELLS)]
        v = (np.array(base) + rng.normal(scale=0.05, size=64)).tolist()
        rows.append((start + i, v, seq))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, seq long"
    )


def test_sync_auto_split_bounds_cells_across_waves(spark, tmp_path):
    """r07 (VERDICT #3): with split_max_rows set, the CDF sync alone
    keeps every live cell under the threshold across a skewed
    multi-wave ingest — no operator action — and probes of the
    maintained (split) index stay exact vs an unsplit build over the
    same final corpus."""
    from customer_segmentation_pyspark_spark.operators.vector_index import (
        sync_ivf_index_to_snapshot,
    )
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )

    tbl = str(tmp_path / "tbl")
    idx = str(tmp_path / "idx")
    cap = 120
    merge_into_partitioned_snapshot(
        spark, tbl, _skewed_wave(spark, 0, 300, 0),
        key="vec_id", seq="seq", num_partitions=8,
    )
    sync_ivf_index_to_snapshot(spark, tbl, idx, CELLS,
                               split_max_rows=cap)
    for w in (1, 2):
        merge_into_partitioned_snapshot(
            spark, tbl, _skewed_wave(spark, 10000 * w, 300, w),
            key="vec_id", seq="seq",
        )
        sync_ivf_index_to_snapshot(spark, tbl, idx, CELLS,
                                   split_max_rows=cap)
        man = versioned.read_manifest(idx)
        assert all(int(n) <= cap for n in man["rows"].values())
    man = versioned.read_manifest(idx)
    assert man.get("subcells")  # the skew actually forced splits
    # exactness: same top-k as a fresh unsplit index on the final state
    final = read_partitioned_snapshot(spark, tbl).select(
        "vec_id", "embedding"
    )
    unsplit = str(tmp_path / "unsplit")
    build_ivf_index(spark, unsplit, final, CELLS)
    q = final.filter(F.col("vec_id") % 97 == 1)
    assert _rows(query_ivf_index(spark, idx, q, n_probe=3, k=5)) == _rows(
        query_ivf_index(spark, unsplit, q, n_probe=3, k=5)
    )


def test_sync_auto_split_concurrent_commit_raises_then_converges(
    spark, tmp_path, monkeypatch
):
    """A foreign commit landing between the sync's CDF fold and its
    auto-split must raise (the split never silently loses either side);
    re-running the sync finishes the maintenance."""
    import pytest

    from customer_segmentation_pyspark_spark.operators.vector_index import (
        sync_ivf_index_to_snapshot,
    )
    from customer_segmentation_pyspark_spark.streaming.merge import (
        ConcurrentMergeError,
        merge_into_partitioned_snapshot,
    )

    tbl = str(tmp_path / "tbl")
    idx = str(tmp_path / "idx")
    cap = 120
    merge_into_partitioned_snapshot(
        spark, tbl, _skewed_wave(spark, 0, 300, 0),
        key="vec_id", seq="seq", num_partitions=8,
    )

    real = versioned.commit_manifest
    state = {"armed": True}

    def wrapped(table_dir, manifest, expected_latest=None):
        if (
            state["armed"]
            and table_dir == idx
            and manifest.get("operation") == "ivf-split"
        ):
            state["armed"] = False
            update_ivf_index(
                spark, idx, _one_up(spark, 999000, list(CELLS[3]))
            )
        return real(table_dir, manifest, expected_latest)

    monkeypatch.setattr(versioned, "commit_manifest", wrapped)
    with pytest.raises(ConcurrentMergeError):
        sync_ivf_index_to_snapshot(spark, tbl, idx, CELLS,
                                   split_max_rows=cap)
    monkeypatch.setattr(versioned, "commit_manifest", real)
    # the foreign update survived; the re-run finishes the split
    sync_ivf_index_to_snapshot(spark, tbl, idx, CELLS, split_max_rows=cap)
    man = versioned.read_manifest(idx)
    assert all(int(n) <= cap for n in man["rows"].values())
    final = read_ivf_index(spark, idx)
    assert final.count() == final.select("vec_id").distinct().count()
    assert final.filter(F.col("vec_id") == 999000).count() == 1


@pytest.mark.parametrize("fuzz_seed", [11, 22, 33])
def test_threaded_sync_split_vacuum_fuzz(spark, tmp_path, fuzz_seed):
    """r07 (VERDICT #6): genuinely concurrent threads interleaving CDF
    syncs, hot-cell splits, and keymap vacuums. Invariants: every
    operation either lands or raises ConcurrentMergeError (nothing
    else escapes), the terminal index equals the corpus (a sequential
    replay of the landed commits — no ghost or lost keys), and probes
    match a fresh rebuild."""
    import threading

    from customer_segmentation_pyspark_spark.operators.vector_index import (
        split_ivf_cells,
        sync_ivf_index_to_snapshot,
        vacuum_ivf_keymap,
    )
    from customer_segmentation_pyspark_spark.streaming.merge import (
        ConcurrentMergeError,
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )

    tbl = str(tmp_path / "tbl")
    idx = str(tmp_path / "idx")
    cap = 90
    merge_into_partitioned_snapshot(
        spark, tbl, _skewed_wave(spark, 0, 200, 0),
        key="vec_id", seq="seq", num_partitions=8,
    )
    sync_ivf_index_to_snapshot(spark, tbl, idx, CELLS)

    unexpected: list = []
    cme = [0]

    def guard(fn):
        try:
            fn()
        except ConcurrentMergeError:
            cme[0] += 1
        except Exception as e:  # noqa: BLE001 — the invariant under test
            unexpected.append(e)

    def ingest():
        for w in (1, 2):
            merge_into_partitioned_snapshot(
                spark, tbl,
                _skewed_wave(spark, 10000 * w + fuzz_seed, 150, w),
                key="vec_id", seq="seq",
            )
            guard(
                lambda: sync_ivf_index_to_snapshot(spark, tbl, idx, CELLS)
            )

    def splitter():
        for _ in range(2):
            guard(
                lambda: split_ivf_cells(
                    spark, idx, max_rows=cap, seed=fuzz_seed
                )
            )

    def vacuumer():
        for _ in range(2):
            guard(lambda: vacuum_ivf_keymap(spark, idx))

    threads = [
        threading.Thread(target=t) for t in (ingest, splitter, vacuumer)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not unexpected, unexpected

    # serial convergence pass: fold anything a raised op left behind
    for _ in range(10):
        try:
            sync_ivf_index_to_snapshot(spark, tbl, idx, CELLS)
            vacuum_ivf_keymap(spark, idx)
            break
        except ConcurrentMergeError:  # pragma: no cover — serial now
            continue
    final = read_ivf_index(spark, idx)
    corpus = read_partitioned_snapshot(spark, tbl).select(
        "vec_id", "embedding"
    )
    assert final.count() == final.select("vec_id").distinct().count()
    assert final.exceptAll(corpus).count() == 0
    assert corpus.exceptAll(final).count() == 0
    # probes equal a fresh unsplit rebuild over the same content
    rebuilt = str(tmp_path / "rebuilt")
    build_ivf_index(spark, rebuilt, corpus, CELLS)
    q = corpus.filter(F.col("vec_id") % 89 == 1)
    assert _rows(query_ivf_index(spark, idx, q, n_probe=3, k=5)) == _rows(
        query_ivf_index(spark, rebuilt, q, n_probe=3, k=5)
    )


def test_probe_reads_only_probed_cell_dirs(spark, tmp_path):
    """r07 (VERDICT #8): the probe's data reads are exactly the probed
    cells' dirs — no keymap files, no unprobed cells — asserted on
    inputFiles() of the returned plan (unfiltered path; the filtered
    path's pruning decision is asserted via _pruned_probe_dirs)."""
    import os as _os

    from customer_segmentation_pyspark_spark.operators.vector_index import (
        _keymap_dir,
    )

    e = _emb(spark)
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, e, CELLS)
    man = versioned.read_manifest(idx)
    q = e.filter(F.col("vec_id") < 3)
    out = query_ivf_index(spark, idx, q, n_probe=2, k=5)
    files = [f for f in out.inputFiles() if str(tmp_path) in f]
    assert files, "probe plan must expose its index reads"
    # probe set: union over the 3 queries of their 2 nearest cells
    probed_dirs = set()
    for r in q.collect():
        import numpy as _np

        d = [
            float(_np.sum((_np.array(r["embedding"]) - _np.array(c)) ** 2))
            for c in CELLS
        ]
        order = sorted(range(len(CELLS)), key=lambda i: (d[i], i))[:2]
        probed_dirs |= {man["parts"][str(i)] for i in order}
    allowed = {_os.path.join(idx, d) for d in probed_dirs}
    for f in files:
        parent = _os.path.dirname(f.split("://", 1)[-1])
        assert parent in allowed, f"unexpected read outside probe set: {f}"
        assert _keymap_dir(idx) not in f
    # the opened dirs are EXACTLY the probe set (nothing extra read,
    # nothing probed left unread)
    opened = {
        _os.path.basename(_os.path.dirname(f.split("://", 1)[-1]))
        for f in files
    }
    assert opened == probed_dirs


def test_vacuum_crash_at_bracket_leaves_marker_and_update_heals(
    spark, tmp_path, monkeypatch
):
    """r08 (ADVICE): a vacuum that dies at the bracketing conditional
    commit (after its clipping merges landed) leaves the in-progress
    marker behind; the next update must rebuild the keymap before
    trusting point-reads, and a completing vacuum clears the marker."""
    import os

    from customer_segmentation_pyspark_spark.operators import (
        vector_index as vi,
    )

    e = _emb(spark)
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, e, CELLS)
    update_ivf_index(spark, idx, _wave(e))  # churn: stale rows to sweep

    real = versioned.commit_manifest
    state = {"armed": True}

    def boom(table_dir, manifest, expected_latest=None):
        if state["armed"] and manifest.get("operation") == "ivf-vacuum":
            state["armed"] = False
            raise RuntimeError("simulated crash at the bracket commit")
        return real(table_dir, manifest, expected_latest)

    monkeypatch.setattr(versioned, "commit_manifest", boom)
    with pytest.raises(RuntimeError):
        vi.vacuum_ivf_keymap(spark, idx)
    marker = vi._vacuum_marker_path(idx)
    assert os.path.exists(marker)  # crash path: marker survives
    # the next update heals (rebuild) and proceeds correctly — and the
    # marker stays: the vacuum owns its removal
    update_ivf_index(spark, idx, _one_up(spark, 444000, list(CELLS[2])))
    update_ivf_index(spark, idx, _one_up(spark, 444000, list(CELLS[6])))
    final = read_ivf_index(spark, idx)
    assert final.count() == final.select("vec_id").distinct().count()
    assert final.filter(F.col("vec_id") == 444000).count() == 1
    assert os.path.exists(marker)
    vi.vacuum_ivf_keymap(spark, idx)  # disarmed: completes
    assert not os.path.exists(marker)


def test_vacuum_inner_merge_failure_repairs_and_raises(
    spark, tmp_path, monkeypatch
):
    """r08 (ADVICE): an inner sweep merge that raises (the stale-row
    delete here) must trigger the repair-and-clear path — the keymap is
    rebuilt on the way out, the marker is cleared, and the error
    surfaces."""
    import os

    from customer_segmentation_pyspark_spark.operators import (
        vector_index as vi,
    )
    from customer_segmentation_pyspark_spark.streaming import merge

    e = _emb(spark)
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, e, CELLS)
    update_ivf_index(spark, idx, _wave(e))

    real_merge = merge.merge_into_partitioned_snapshot
    calls = {"rebuilds": 0}

    def boom(spark_, table_dir, delta, **kw):
        if table_dir.endswith("_keymap") and kw.get("delete_when"):
            raise RuntimeError("simulated stale-delete failure")
        return real_merge(spark_, table_dir, delta, **kw)

    real_rebuild = vi.rebuild_ivf_keymap

    def spy_rebuild(spark_, index_dir):
        calls["rebuilds"] += 1
        return real_rebuild(spark_, index_dir)

    monkeypatch.setattr(merge, "merge_into_partitioned_snapshot", boom)
    monkeypatch.setattr(vi, "rebuild_ivf_keymap", spy_rebuild)
    with pytest.raises(RuntimeError, match="stale-delete"):
        vi.vacuum_ivf_keymap(spark, idx)
    assert calls["rebuilds"] == 1  # repaired on the way out
    assert not os.path.exists(vi._vacuum_marker_path(idx))


def test_interrupted_vacuum_marker_forces_keymap_rebuild(
    spark, tmp_path
):
    """r08 (ADVICE): the hard-crash shape — a keymap CLIPPED by a dead
    vacuum (its marker still present) must not ghost: the next update
    rebuilds before trusting its point-read, so moving the clipped key
    still rewrites its real cell."""
    import os

    from customer_segmentation_pyspark_spark.operators import (
        vector_index as vi,
    )
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
    )

    e = _emb(spark)
    idx = str(tmp_path / "idx")
    build_ivf_index(spark, idx, e, CELLS)
    update_ivf_index(spark, idx, _one_up(spark, 555000, list(CELLS[2])))
    # simulate the dead vacuum: clip the key's keymap row, drop marker
    km_dir = os.path.join(idx, "_keymap")
    clip = spark.createDataFrame(
        [(555000, [0], 99)], "vec_id long, cells array<long>, seq long"
    ).withColumn("__op", F.lit("D"))
    merge_into_partitioned_snapshot(
        spark, km_dir, clip, key="vec_id", seq="seq",
        delete_when="__op = 'D'", marker_cols=("__op",),
        collect_stats=False,
    )
    with open(vi._vacuum_marker_path(idx), "w") as f:
        f.write("1")
    # move the clipped key: without the heal its CELLS[2] copy ghosts
    update_ivf_index(spark, idx, _one_up(spark, 555000, list(CELLS[6])))
    final = read_ivf_index(spark, idx)
    assert final.filter(F.col("vec_id") == 555000).count() == 1
    assert final.count() == final.select("vec_id").distinct().count()
