"""Maintained IVF vector index: a cell-partitioned, versioned ANN index
that updates INCREMENTALLY — the missing piece between the one-shot
`similarity.ivf_topk_cosine` probe and a production embedding store
that ingests a change stream.

Layout (the same manifest protocol as the lakehouse tables —
`sources/versioned.py`):

    index_dir/
      manifest-vN.json   {"kind": "ivf", "cells": [[...], ...],
                          "key": ..., "vec": ...,
                          "parts": {"<cell id>": "c-xxxx"}, "rows": {...}}
      c-xxxx/            immutable parquet, all vectors of ONE cell
      _keymap/           partitioned snapshot (key -> cell), hash-keyed

Why this shape at 100 TB:
  * QUERIES read O(n_probe) cell dirs, not the corpus: the probe set is
    computed from the manifest's plan-literal centers and only those
    directories are opened (object-store prefix pruning, the FAISS
    inverted-list walk as parquet dirs).
  * UPDATES rewrite O(affected cells), not the index: changed keys'
    OLD cells come from an O(|changes|) point read of the keymap (its
    own hash-partitioned snapshot — the FAISS IDMap as a lakehouse
    table), new cells from a projection against the centers; every
    other cell dir is untouched bytes.
  * The coarse quantizer is FIXED at build time (the production IVF
    shape: train once on a sample, reuse forever) — so cell assignment
    is deterministic, survivors never move cells, and the whole path is
    SQL-oracle-able exactly.

Single-writer per index (updates are read-modify-write on the manifest;
concurrent updaters would need the merge module's OCC loop). Reference
parity: the reference has no vector index at all (codeText.txt is a
k-means notebook); this is engine surface for the LLM-pipeline north
star, sharing its argmin/centroid semantics with `plans/kmeans.py`
(first-min tie-break, codeText.txt:69).
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.functions.arrays import (
    array_argmin,
    array_lit,
    cosine_similarity,
    sq_dist,
)

KEYMAP_PARTITIONS = 32


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _cell_expr(cells: Sequence[Sequence[float]], vec):
    """First-min argmin over plan-literal squared distances — identical
    semantics to `similarity.ivf_topk_cosine` and the kmeans assign."""
    return array_argmin(
        F.array(*[sq_dist(vec, array_lit(list(map(float, c)))) for c in cells])
    )


def _keymap_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "_keymap")


def _land_cells(
    index_dir: str, staging: str
) -> tuple[dict[str, str], dict[str, int]]:
    """Rename each staging ``__cell=N`` dir to an immutable ``c-*`` dir;
    returns ({cell: dir}, {cell: rowcount}). Footer-only counts."""
    from customer_segmentation_pyspark_spark.sources import versioned

    parts: dict[str, str] = {}
    rows: dict[str, int] = {}
    for entry in sorted(os.listdir(staging)):
        if not entry.startswith("__cell="):
            continue
        cell = entry.split("=", 1)[1]
        dest = f"c-{uuid.uuid4().hex[:12]}"
        os.rename(os.path.join(staging, entry), os.path.join(index_dir, dest))
        n = versioned.collect_dir_rowcount(os.path.join(index_dir, dest))
        if n == 0:
            shutil.rmtree(os.path.join(index_dir, dest), ignore_errors=True)
            continue
        parts[cell] = dest
        rows[cell] = n
    shutil.rmtree(staging, ignore_errors=True)
    return parts, rows


def _merge_keymap(
    spark: SparkSession,
    index_dir: str,
    entries: DataFrame,
    key: str,
    num_partitions: int = KEYMAP_PARTITIONS,
) -> None:
    """Upsert (key, cells array) rows into the keymap snapshot.
    O(touched hash partitions) like any lakehouse merge.

    The keymap is a SUPERSET multimap, not the exact current location:
    each key maps to every cell it may still occupy. Updates UNION the
    new cell into the prior set and commit the keymap BEFORE the data
    rewrite — so under a crash at any point the set can only be a
    superset of where the key's rows actually live, and the next
    update's affected-cell computation can never miss a dir (a missed
    dir would leave a ghost copy of a moved key — the one corruption
    this ordering makes impossible). Stale extra cells cost one extra
    dir rewrite on the key's next update, never correctness; a keymap
    rebuild (scan the index, collect_set cells per key) prunes them."""
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
    )

    merge_into_partitioned_snapshot(
        spark,
        _keymap_dir(index_dir),
        entries,
        key=key,
        seq="seq",
        num_partitions=num_partitions,
    )


def build_ivf_index(
    spark: SparkSession,
    index_dir: str,
    corpus: DataFrame,
    cells: Sequence[Sequence[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    src_version: int | None = None,
    keymap_partitions: int = KEYMAP_PARTITIONS,
) -> int:
    """Build version 1: assign every vector to its nearest fixed cell,
    land one immutable dir per cell (ONE partitionBy job), seed the
    keymap, commit the manifest. ``src_version`` records which source-
    table version this index reflects (the CDF-sync cursor).
    ``keymap_partitions`` sizes the keymap table at creation (size it
    to the corpus: each update's keymap merge rewrites O(touched
    keymap partitions) dirs, so a small corpus wants few and a 100 TB
    one wants thousands); later merges read the count from the
    keymap's own manifest. Returns the committed version."""
    from customer_segmentation_pyspark_spark.sources import versioned

    cells = [list(map(float, c)) for c in cells]
    os.makedirs(index_dir, exist_ok=True)
    # PAYLOAD columns (anything beyond key+vector) ride along in the
    # cell dirs and get per-cell footer stats — filtered vector search
    # prunes probed dirs on them and post-filters candidates
    extras = [c for c in corpus.columns if c not in (id_col, vec_col)]
    tagged = corpus.select(
        F.col(id_col).alias(id_col),
        _as_double(F.col(vec_col)).alias(vec_col),
        *extras,
    ).withColumn("__cell", _cell_expr(cells, F.col(vec_col)))
    keymap = tagged.select(
        F.col(id_col),
        F.array(F.col("__cell").cast("long")).alias("cells"),
        F.lit(0).cast("long").alias("seq"),
    )
    _merge_keymap(
        spark, index_dir, keymap, id_col, num_partitions=keymap_partitions
    )  # superset-first
    staging = os.path.join(index_dir, f".staging-{uuid.uuid4().hex[:8]}")
    tagged.write.mode("overwrite").partitionBy("__cell").parquet(staging)
    parts, rows = _land_cells(index_dir, staging)
    stats = {
        c: versioned.collect_dir_stats(os.path.join(index_dir, d))
        for c, d in parts.items()
    }
    return versioned.commit_manifest(
        index_dir,
        {
            "kind": "ivf",
            "cells": cells,
            "key": id_col,
            "vec": vec_col,
            "parts": parts,
            "rows": rows,
            "stats": stats,
            "src_version": src_version,
            "operation": "ivf-build",
            "committed_at": time.time(),
        },
    )


def update_ivf_index(
    spark: SparkSession,
    index_dir: str,
    changes: DataFrame,
    seq: str = "seq",
    op: str = "op",
    src_version: int | None = None,
) -> int:
    """Apply a CDC batch (upserts re-embed/move/insert vectors; op='D'
    rows delete them) by rewriting ONLY the affected cell dirs.

    Affected = the changed keys' keymap cell sets (point read — an
    O(|changes|-partitions) pruned scan, bounded collect of |changes|
    rows) union the upserts' NEW cells. One Spark job reads those dirs,
    drops changed keys, unions the re-assigned upserts, and lands fresh
    dirs; every other manifest entry is carried byte-identical.
    Latest-wins per key inside the batch (same rule as MERGE).

    Payload semantics are REPLACE, not coalesce: an upsert that omits a
    payload column the index carries leaves that column NULL for the
    key (unionByName fills missing columns) — CDC batches should carry
    the full row, as the CDF sync path does.

    Crash ordering: the keymap (a superset multimap — see
    :func:`_merge_keymap`) commits FIRST with the new cells unioned in,
    then the dirs rewrite, then the manifest flips. A crash leaves
    either (stale data + superset keymap) — retry rewrites a superset
    of the needed dirs — or the committed pair; no interleaving can
    leave a moved key's ghost in an unlisted dir."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        latest_per_key,
        read_partitioned_snapshot,
    )

    man = versioned.read_manifest(index_dir)
    if man is None or man.get("kind") != "ivf":
        raise FileNotFoundError(f"no IVF index committed in {index_dir}")
    cells = man["cells"]
    key, vec = man["key"], man["vec"]

    ch = latest_per_key(changes, key, seq)
    extras = [c for c in changes.columns if c not in (key, vec, seq, op)]
    ups = (
        ch.filter(F.col(op) != "D")
        .select(
            F.col(key),
            _as_double(F.col(vec)).alias(vec),
            *extras,
        )
        .withColumn("__cell", _cell_expr(cells, F.col(vec)))
    )
    # bounded collects: a CDC batch is small by contract (same bound as
    # the merge module's key routing) — |changes| rows each
    changed_keys = [r[key] for r in ch.select(key).collect()]
    if not changed_keys:
        # nothing to rewrite — but still advance the CDF cursor, or a
        # sync whose slice was empty (compaction-only source versions)
        # would re-diff the same slice on every call
        if src_version is not None and man.get("src_version") != src_version:
            return versioned.commit_manifest(
                index_dir,
                {
                    **man,
                    "src_version": src_version,
                    "operation": "ivf-cursor",
                    "committed_at": time.time(),
                },
            )
        return versioned.latest_version(index_dir)
    new_cells = {
        str(r["__cell"]) for r in ups.select("__cell").distinct().collect()
    }
    old_cells: set[str] = set()
    prior = None
    try:
        prior = read_partitioned_snapshot(
            spark, _keymap_dir(index_dir), key_in=changed_keys
        ).select(key, "cells")
    except FileNotFoundError:
        # a populated index with NO keymap (e.g. a shallow-cloned index
        # dir — clone_snapshot copies the manifest, not the _keymap
        # subtable): proceeding with empty old_cells would leave ghost
        # copies of moved keys, so heal by rebuilding the keymap from
        # the data first (O(index) once). A truly empty index has
        # nothing to ghost and needs no keymap yet.
        if man["parts"]:
            rebuild_ivf_keymap(spark, index_dir)
            prior = read_partitioned_snapshot(
                spark, _keymap_dir(index_dir), key_in=changed_keys
            ).select(key, "cells")
    if prior is not None:
        old_cells = {
            str(r["c"])
            for r in prior.select(
                F.explode("cells").alias("c")
            ).distinct().collect()
        }

    # keymap FIRST: each changed key's set becomes prior ∪ new cell
    new_assign = ups.select(
        F.col(key), F.array(F.col("__cell").cast("long")).alias("cells")
    )
    entries = (
        new_assign
        if prior is None
        else new_assign.unionByName(prior).groupBy(key).agg(
            F.array_distinct(
                F.flatten(F.collect_list("cells"))
            ).alias("cells")
        )
    )
    _merge_keymap(
        spark,
        index_dir,
        entries.withColumn("seq", F.lit(0).cast("long")),
        key,
    )

    affected = sorted(
        c for c in (new_cells | old_cells) if c in man["parts"] or c in new_cells
    )
    # one job: survivors of the affected dirs (cell recomputed from the
    # vector — fixed centers mean survivors never move) + new upserts
    frames = []
    old_dirs = [man["parts"][c] for c in affected if c in man["parts"]]
    if old_dirs:
        frames.append(
            # mergeSchema: dirs written before a payload column evolved
            # surface it as NULL instead of a schema mismatch
            spark.read.option("mergeSchema", "true").parquet(
                *[os.path.join(index_dir, d) for d in old_dirs]
            ).filter(~F.col(key).isin(changed_keys))
            .withColumn("__cell", _cell_expr(cells, F.col(vec)))
        )
    frames.append(ups)
    allr = frames[0]
    for f in frames[1:]:
        allr = allr.unionByName(f, allowMissingColumns=True)
    staging = os.path.join(index_dir, f".staging-{uuid.uuid4().hex[:8]}")
    allr.write.mode("overwrite").partitionBy("__cell").parquet(staging)
    new_parts, new_rows = _land_cells(index_dir, staging)
    new_stats = {
        c: versioned.collect_dir_stats(os.path.join(index_dir, d))
        for c, d in new_parts.items()
    }

    parts = dict(man["parts"])
    rows = dict(man.get("rows", {}))
    stats = dict(man.get("stats", {}))
    for c in affected:
        parts.pop(c, None)
        rows.pop(c, None)
        stats.pop(c, None)
    parts.update(new_parts)
    rows.update(new_rows)
    stats.update(new_stats)
    return versioned.commit_manifest(
        index_dir,
        {
            **man,
            "parts": parts,
            "rows": rows,
            "stats": stats,
            "src_version": (
                src_version
                if src_version is not None
                else man.get("src_version")
            ),
            "operation": "ivf-update",
            "committed_at": time.time(),
        },
    )


def sync_ivf_index_to_snapshot(
    spark: SparkSession,
    table_dir: str,
    index_dir: str,
    cells: Sequence[Sequence[float]],
    vec_col: str | None = None,
    keymap_partitions: int = KEYMAP_PARTITIONS,
) -> int:
    """Keep the index fresh from a lakehouse table's CHANGE DATA FEED —
    the corpus→index pipeline: MERGE waves land in the corpus table,
    this driver folds only `read_snapshot_changes(v0, latest)` into the
    index, where v0 is the source version recorded in the index's own
    manifest (committed atomically with the index data, the same
    exactly-once cursor shape as `streaming.views.sync_view_to_snapshot`).

    Cost per sync is the index-update cost of the NET changes — the
    corpus is never rescanned after the seed build. A crash mid-update
    retries the same CDF slice: the keymap-first superset ordering makes
    the re-apply converge (see :func:`update_ivf_index`). Returns the
    source version the index now reflects."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        read_partitioned_snapshot,
        read_snapshot_changes,
    )

    cur = versioned.latest_version(table_dir)
    if cur < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    src_man = versioned.read_manifest(table_dir)
    key = src_man["key"]
    vec = vec_col or src_man.get("vec", "embedding")
    idx_man = versioned.read_manifest(index_dir)
    if idx_man is None:
        build_ivf_index(
            spark,
            index_dir,
            read_partitioned_snapshot(spark, table_dir, version=cur),
            cells,
            id_col=key,
            vec_col=vec,
            src_version=cur,
            keymap_partitions=keymap_partitions,
        )
        return cur
    v0 = idx_man.get("src_version")
    if v0 is None:
        raise ValueError(
            f"index {index_dir} was not built with src_version — "
            "seed it through this function to enable CDF sync"
        )
    if v0 >= cur:
        return v0  # already current — the idempotent no-op
    cdf = read_snapshot_changes(spark, table_dir, v0, cur)
    extras = [
        c
        for c in cdf.columns
        if c not in (key, vec, "_change_type", "seq", "op")
        and not c.startswith("_")
    ]
    batch = cdf.filter(F.col("_change_type") != "update_preimage").select(
        F.col(key),
        F.col(vec),
        *extras,  # payload columns ride into the index for filtered search
        F.lit(1).cast("long").alias("seq"),
        F.when(F.col("_change_type") == "delete", "D")
        .otherwise("U")
        .alias("op"),
    )
    update_ivf_index(spark, index_dir, batch, src_version=cur)
    return cur


def rebuild_ivf_keymap(spark: SparkSession, index_dir: str) -> None:
    """Keymap maintenance: shrink every LIVE key's superset cell set
    back to its exact singleton by scanning the index once (the cell is
    the dir it sits in — recomputed from the vector, same fixed
    centers) and merging the exact entries over the bloated ones.
    Repeatedly-moved keys stop dragging their historical cells into
    every update's affected set. Keys deleted from the index keep a
    stale keymap row (a superset is always safe; rows are 2 columns) —
    resetting those needs a quiescent rebuild of the keymap table.
    Crash-safe: this is an ordinary merge commit; a partial run leaves
    some keys shrunk and the rest superset, both correct."""
    from customer_segmentation_pyspark_spark.sources import versioned

    man = versioned.read_manifest(index_dir)
    if man is None or man.get("kind") != "ivf":
        raise FileNotFoundError(f"no IVF index committed in {index_dir}")
    if not man["parts"]:
        return
    key, vec = man["key"], man["vec"]
    exact = (
        spark.read.parquet(
            *[os.path.join(index_dir, d) for d in man["parts"].values()]
        )
        .select(
            F.col(key),
            F.array(
                _cell_expr(man["cells"], F.col(vec)).cast("long")
            ).alias("cells"),
            F.lit(0).cast("long").alias("seq"),
        )
    )
    _merge_keymap(spark, index_dir, exact, key)


def streaming_ivf_upsert(
    spark: SparkSession,
    updates: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    seq: str = "seq",
    op: str = "op",
):
    """Maintain the IVF index from a structured stream of CDC rows
    (key, vector, seq, op) — each micro-batch becomes one
    :func:`update_ivf_index` call (the foreachBatch sink shape shared
    with `streaming.merge.streaming_mor_upsert`). Exactly-once by
    convergence: a replayed batch re-applies the same latest-per-key
    rows, and the superset keymap makes the re-apply a content no-op
    (the property `test_update_reapply_converges` pins)."""

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        update_ivf_index(spark, index_dir, batch_df, seq=seq, op=op)

    return (
        updates.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_ivf_index(
    spark: SparkSession, index_dir: str, version: int | None = None
) -> DataFrame:
    """The full indexed corpus (key, vector) at a version — a union scan
    of every cell dir (time travel works: manifests are immutable)."""
    from customer_segmentation_pyspark_spark.sources import versioned

    man = versioned.read_manifest(index_dir, version)
    if man is None or man.get("kind") != "ivf":
        raise FileNotFoundError(f"no IVF index committed in {index_dir}")
    dirs = [os.path.join(index_dir, d) for d in man["parts"].values()]
    if not dirs:
        return spark.createDataFrame(
            [], f"{man['key']} long, {man['vec']} array<double>"
        )
    return spark.read.parquet(*dirs).select(man["key"], man["vec"])


def query_ivf_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    n_probe: int = 3,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    version: int | None = None,
    where=None,
) -> DataFrame:
    """Probe the index: rank each query's n_probe nearest cells from the
    manifest's centers, open ONLY the probed cell dirs, exact-rescore
    with cosine, window top-k (ties by neighbor id; self-matches
    excluded) — identical result semantics to
    `similarity.ivf_topk_cosine` with the same fixed quantizer.

    ``where`` — a list of ``(payload_col, op, value)`` tuples (the same
    contract as ``read_partitioned_snapshot``) — makes this a FILTERED
    vector search: candidates inside the probed cells must satisfy
    every predicate. Pruning is two-level: probed dirs whose manifest
    footer stats refute a predicate are never opened, and the residual
    filter runs before scoring (post-filter IVF semantics: a query can
    return fewer than k when its probed cells hold too few matching
    vectors — raise n_probe to trade IO for recall)."""
    from customer_segmentation_pyspark_spark.sources import versioned

    man = versioned.read_manifest(index_dir, version)
    if man is None or man.get("kind") != "ivf":
        raise FileNotFoundError(f"no IVF index committed in {index_dir}")
    cells = man["cells"]
    key, vec = man["key"], man["vec"]
    n_probe = min(n_probe, len(cells))

    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    )
    dists = F.array(
        *[sq_dist(F.col("qv"), array_lit(list(map(float, c)))) for c in cells]
    )
    ranked = F.slice(
        F.array_sort(
            F.zip_with(
                dists,
                F.sequence(F.lit(0), F.lit(len(cells) - 1)),
                lambda d, i: F.struct(d.alias("d"), i.alias("cell")),
            )
        ),
        1,
        n_probe,
    )
    probes = q.withColumn(
        "cell", F.explode(F.transform(ranked, lambda s: s["cell"]))
    )
    # bounded collect: <= n_cells rows — the dir-pruning step (at scale:
    # open n_probe object-store prefixes per query set, not the corpus)
    probe_ids = {
        str(r["cell"]) for r in probes.select("cell").distinct().collect()
    }
    stats = man.get("stats", {})
    if where:
        from customer_segmentation_pyspark_spark.streaming.merge import (
            _dir_may_match,
        )

        probe_ids = {
            c
            for c in probe_ids
            if all(
                _dir_may_match(stats.get(c, {}), col, op_, val)
                for col, op_, val in where
            )
        }
    dirs = [
        os.path.join(index_dir, d)
        for c, d in man["parts"].items()
        if c in probe_ids
    ]
    if not dirs:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cos_sim double, rank int"
        )
    cand = spark.read.option("mergeSchema", "true").parquet(*dirs)
    if where:
        ops = {
            "=": lambda c, v: c == v,
            "<": lambda c, v: c < v,
            "<=": lambda c, v: c <= v,
            ">": lambda c, v: c > v,
            ">=": lambda c, v: c >= v,
        }
        for col, op_, val in where:
            if op_ not in ops:
                raise ValueError(
                    f"unsupported where op {op_!r}; use one of {sorted(ops)}"
                )
            cand = cand.filter(ops[op_](F.col(col), F.lit(val)))
    tagged = (
        cand
        .select(F.col(key).alias("neighbor_id"), F.col(vec).alias("cv"))
        .withColumn("cell", _cell_expr(cells, F.col("cv")))
    )
    scored = (
        tagged.join(F.broadcast(probes), on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_similarity(F.col("qv"), F.col("cv")), 4
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
