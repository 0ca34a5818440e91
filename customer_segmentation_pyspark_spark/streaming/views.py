"""Incremental materialized-view maintenance (r05): keep an aggregate
table in sync with a lakehouse snapshot by consuming its change data
feed instead of recomputing — the classic delta-maintenance shape
(self-maintainable SUM/COUNT views), applied to the engine's own CDF
(``streaming/merge.py:read_snapshot_changes``).

Cost model at 100 TB: one maintenance step is O(|changes| + |affected
groups|) — the CDF is already partition-pruned to changed partitions,
the signed contributions reduce map-side, and the view merge touches
only groups present in the delta. A full recompute is O(snapshot);
the equality of the two is exactly what the DuckDB oracle on
``incremental_agg_view`` checks.

The reference has no view maintenance (SURVEY.md §2.11 — no streaming
surface at all); this is engine surface for the LLM-pipeline north
star: per-source corpus dashboards that stay fresh per merge wave
without rescanning the corpus.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.sources.sinks import (
    crash_safe_swap,
    recover_swap,
)


#: marker file inside the view dir recording which source-table version
#: the view reflects — swapped atomically WITH the data, so the pair is
#: never torn (files starting with "_" are invisible to parquet reads)
SRC_VERSION_FILE = "_SRC_VERSION"


def _write_marker(dir_path: str, src_version) -> None:
    if src_version is not None:
        with open(os.path.join(dir_path, SRC_VERSION_FILE), "w") as f:
            f.write(str(int(src_version)))


def view_src_version(view_dir: str) -> int | None:
    """The source-table version this view reflects (None for a view
    maintained without markers)."""
    try:
        with open(os.path.join(view_dir, SRC_VERSION_FILE)) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def _materialize_small(spark: SparkSession, df: DataFrame, cap: int = 64):
    """Execute ``df``'s plan exactly once and return a re-usable frame:
    at most ``cap`` rows come back as a literal LocalRelation (zero
    further jobs, broadcastable — the r10 _fold_agg_delta trick),
    anything larger as an eager localCheckpoint. For the swap-style IVM
    updaters whose output plan references the signed delta in several
    union/join branches, this turns N executions of the CDF diff plan
    into one (Spark does not CSE across those branches — r11)."""
    head = df.limit(cap + 1).collect()
    if len(head) <= cap:
        return spark.createDataFrame(head, df.schema)
    return df.localCheckpoint(eager=True)


def sync_view_to_snapshot(
    spark: SparkSession,
    table_dir: str,
    view_dir: str,
    group_col: str,
    value_col,
) -> int:
    """Exactly-once incremental maintenance: bring the view up to the
    source table's latest version, folding only the change feed since
    the version recorded IN the view (seeding on first call). The
    version marker swaps atomically with the data, so a crash at any
    point leaves a consistent (data, version) pair and the retry
    either re-folds the same CDF slice onto the OLD pair or no-ops on
    the NEW one — the additive apply can never double-count. This is
    the driver loop the module docstring's exactly-once caveat points
    to; returns the version the view now reflects."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        read_partitioned_snapshot,
        read_snapshot_changes,
    )

    cur = versioned.latest_version(table_dir)
    if cur < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    recover_swap(view_dir)
    v0 = view_src_version(view_dir) if os.path.exists(view_dir) else None
    if v0 is None:
        seed_count_sum_view(
            spark,
            view_dir,
            _snapshot_or_empty(spark, table_dir, cur),
            group_col,
            value_col,
            src_version=cur,
        )
        return cur
    if v0 >= cur:
        return v0  # already current — the idempotent no-op
    update_count_sum_view(
        spark,
        view_dir,
        read_snapshot_changes(spark, table_dir, v0, cur),
        group_col,
        value_col,
        src_version=cur,
    )
    return cur


def update_count_sum_view(
    spark: SparkSession,
    view_dir: str,
    cdf: DataFrame,
    group_col: str,
    value_col,
    src_version: int | None = None,
) -> None:
    """Apply one CDF slice to a (group, n_rows, total) view.

    Signed contributions: ``insert``/``update_postimage`` rows add
    (+1, +value), ``delete``/``update_preimage`` rows subtract — an
    update whose value did not change cancels exactly, NULL values
    count 0 toward the total but still count the row. A group whose
    row count reaches zero LEAVES the view (COUNT/SUM views are
    self-maintainable, no rescan needed — the textbook IVM property).
    Crash-safe like the merge sinks: fresh directory + swap, and
    re-applying the same CDF slice is NOT idempotent (contributions
    are additive) — drive this through
    :func:`sync_view_to_snapshot`, whose version marker makes the
    apply exactly-once, or rebuild from :func:`seed_count_sum_view`
    on doubt."""
    value = F.coalesce(value_col, F.lit(0))
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = cdf.groupBy(group_col).agg(
        F.sum(sign).cast("long").alias("__d_n"),
        F.sum(sign * value).cast("long").alias("__d_sum"),
    )
    recover_swap(view_dir)
    if os.path.exists(view_dir):
        base = spark.read.parquet(view_dir)
        g = F.coalesce(F.col(group_col), F.col("__g")).alias(group_col)
        merged = (
            base.join(
                delta.select(
                    F.col(group_col).alias("__g"), "__d_n", "__d_sum"
                ),
                # eqNullSafe: a NULL group present in both sides must
                # MATCH (plain equality would leave two NULL-group rows
                # with split counters — r06, ADVICE)
                F.col(group_col).eqNullSafe(F.col("__g")),
                "full_outer",
            )
            .select(
                g,
                (
                    F.coalesce(F.col("n_rows"), F.lit(0))
                    + F.coalesce(F.col("__d_n"), F.lit(0))
                ).alias("n_rows"),
                (
                    F.coalesce(F.col("total"), F.lit(0))
                    + F.coalesce(F.col("__d_sum"), F.lit(0))
                ).alias("total"),
            )
            .filter(F.col("n_rows") > 0)
        )
    else:
        merged = delta.filter(F.col("__d_n") > 0).select(
            F.col(group_col),
            F.col("__d_n").alias("n_rows"),
            F.col("__d_sum").alias("total"),
        )
    tmp = f"{view_dir}.tmp-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    _write_marker(tmp, src_version)
    crash_safe_swap(view_dir, tmp)


def seed_count_sum_view(
    spark: SparkSession,
    view_dir: str,
    snapshot: DataFrame,
    group_col: str,
    value_col,
    src_version: int | None = None,
) -> None:
    """Bootstrap (or rebuild) the view from a full snapshot — the one
    O(snapshot) step; every later wave goes through
    :func:`update_count_sum_view` at delta cost."""
    import shutil

    shutil.rmtree(view_dir, ignore_errors=True)
    agg = snapshot.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.coalesce(value_col, F.lit(0))).cast("long").alias("total"),
    )
    tmp = f"{view_dir}.tmp-{uuid.uuid4().hex[:8]}"
    agg.write.mode("overwrite").parquet(tmp)
    _write_marker(tmp, src_version)
    crash_safe_swap(view_dir, tmp)


# ---------------------------------------------------------------------------
# Incremental COUNT-DISTINCT view (r07): the classic support-multiset
# construction — COUNT(DISTINCT value) per group is NOT self-maintainable
# from the view alone (a delete may or may not remove the group's last
# copy of a value), but it IS self-maintainable from the auxiliary
# multiset {(group, value) -> multiplicity}: each CDF row contributes a
# signed ±1 to its pair, pairs at multiplicity 0 leave, and the exposed
# view is exact counts over the support (n_distinct = pairs, n_rows =
# Σmult). No rescan path at all — this sits between COUNT/SUM
# (self-maintainable directly) and MIN/MAX (scoped rescan) in the IVM
# family. State is per distinct (group, value) pair and rewrites per
# wave like the other swap-style views; a domain too large for that
# wants the same keyed-MERGE-table treatment as the JOIN view (hkey =
# group⊕value) — documented upgrade path, same delta rule.
# ---------------------------------------------------------------------------


def seed_distinct_view(
    spark: SparkSession,
    view_dir: str,
    snapshot: DataFrame,
    group_col: str,
    value_col,
    src_version: int | None = None,
) -> None:
    """Bootstrap the support multiset from a full snapshot."""
    import shutil

    shutil.rmtree(view_dir, ignore_errors=True)
    sup = snapshot.groupBy(
        F.col(group_col).alias("__g"), value_col.alias("__v")
    ).agg(F.count(F.lit(1)).cast("long").alias("__mult"))
    tmp = f"{view_dir}.tmp-{uuid.uuid4().hex[:8]}"
    sup.write.mode("overwrite").parquet(tmp)
    _write_marker(tmp, src_version)
    crash_safe_swap(view_dir, tmp)


def update_distinct_view(
    spark: SparkSession,
    view_dir: str,
    cdf: DataFrame,
    group_col: str,
    value_col,
    src_version: int | None = None,
) -> None:
    """Fold one CDF slice into the support multiset: ±1 per
    (group, value) pair; zero-multiplicity pairs leave. Additive like
    the COUNT/SUM view — drive through
    :func:`sync_distinct_view_to_snapshot` for exactly-once."""
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = cdf.groupBy(
        F.col(group_col).alias("__dg"), value_col.alias("__dv")
    ).agg(F.sum(sign).cast("long").alias("__d"))
    recover_swap(view_dir)
    base = spark.read.parquet(view_dir)
    merged = (
        base.join(
            delta,
            F.col("__g").eqNullSafe(F.col("__dg"))
            & F.col("__v").eqNullSafe(F.col("__dv")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("__g"), F.col("__dg")).alias("__g"),
            F.coalesce(F.col("__v"), F.col("__dv")).alias("__v"),
            (
                F.coalesce(F.col("__mult"), F.lit(0))
                + F.coalesce(F.col("__d"), F.lit(0))
            ).alias("__mult"),
        )
        .filter(F.col("__mult") > 0)
    )
    tmp = f"{view_dir}.tmp-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    _write_marker(tmp, src_version)
    crash_safe_swap(view_dir, tmp)


def read_distinct_view(spark: SparkSession, view_dir: str) -> DataFrame:
    """(group, n_distinct, n_rows) derived exactly from the support
    multiset — NULL values count rows but not distincts (SQL
    COUNT(DISTINCT) semantics)."""
    recover_swap(view_dir)
    sup = spark.read.parquet(view_dir)
    return sup.groupBy(F.col("__g")).agg(
        F.count(F.when(F.col("__v").isNotNull(), F.lit(1)))
        .cast("long")
        .alias("n_distinct"),
        F.sum("__mult").cast("long").alias("n_rows"),
    )


def sync_distinct_view_to_snapshot(
    spark: SparkSession,
    table_dir: str,
    view_dir: str,
    group_col: str,
    value_col,
) -> int:
    """Exactly-once driver: seed on first call, then fold only the CDF
    since the cursored version (same marker shape as
    :func:`sync_view_to_snapshot`)."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        read_partitioned_snapshot,
        read_snapshot_changes,
    )

    cur = versioned.latest_version(table_dir)
    if cur < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    recover_swap(view_dir)
    v0 = view_src_version(view_dir) if os.path.exists(view_dir) else None
    if v0 is None:
        seed_distinct_view(
            spark,
            view_dir,
            _snapshot_or_empty(spark, table_dir, cur),
            group_col,
            value_col,
            src_version=cur,
        )
        return cur
    if v0 >= cur:
        return v0
    update_distinct_view(
        spark,
        view_dir,
        read_snapshot_changes(spark, table_dir, v0, cur),
        group_col,
        value_col,
        src_version=cur,
    )
    return cur


# ---------------------------------------------------------------------------
# Incremental JOIN-view maintenance (r06, VERDICT #4): the other classic
# materialized-view shape. The view is a fact-grain LEFT-join enrichment
# (one row per fact row, dimension attributes denormalized in), stored as
# a partitioned MERGE table keyed by the FACT key — so the maintenance
# step is itself an O(touched partitions) merge, not a view rewrite.
#
# Delta rule per wave (upsert-key semantics — both feeds are keyed):
#   * Δfact post-images re-enrich against the CURRENT dim and upsert;
#     fact deletes tombstone their view row.                O(|Δfact|)
#   * Δdim waves invalidate every view row whose join value appears in
#     the dim CDF (pre- OR post-image: a dim-key retarget invalidates
#     both sides); those rows re-enrich and upsert. The invalidation
#     READ is pruned by the inverted join-value map (r07, VERDICT #1):
#     only the view partitions that contain dependents are opened, so
#     a 1-key dim change costs O(dependent partitions), not O(view);
#     the WRITE stays O(touched rows' partitions).
# Re-enrichment uses UPDATE SET * merge semantics (update_set_all):
# a dim row that vanished must NULL the attributes it contributed —
# per-column coalesce would resurrect them.
#
# Exactly-once: per-source version cursors persist in a marker file
# written AFTER the merge commits; unlike the additive COUNT/SUM view
# the apply is idempotent (re-enriching the same slice reproduces the
# same rows; tombstones of absent keys no-op), so a crash between
# commit and marker converges on retry.
# ---------------------------------------------------------------------------

JOIN_CURSOR_FILE = "_JOIN_SRC_VERSIONS"

#: inverted join-value map (r07, VERDICT #1): a tiny MERGE subtable
#: inside the view dir, keyed by the JOIN VALUE, whose payload is the
#: set of view hash-PARTITION ids that contain (or ever contained)
#: dependent fact rows. A dim wave point-reads the changed join values
#: (pruned by the map's own key hash), collects <= num_partitions ints,
#: and re-enriches from ONLY those view partitions — dim-side
#: invalidation drops from O(view) to O(dependent partitions). The map
#: is a SUPERSET (fact deletes and join-key retargets never remove
#: entries — extra partitions cost IO, never correctness).
#:
#: Maintenance is LAZY (r08, VERDICT #6): the map carries its own
#: fact-version marker (the views module's ``_SRC_VERSION`` file in
#: the map dir) recording the highest fact version whose post-images'
#: (value -> partition) entries it contains. Fact waves commit NOTHING
#: to the map; a dim wave unions the map lookup with an ESCAPE HATCH —
#: the view partitions of every fact key changed in
#: (marker, view's fact cursor] (one pruned CDF read) — so staleness
#: is exact, never a correctness risk. The map catches up (one merge,
#: folding the whole lag plus the current wave's upserts) only when a
#: dim wave finds a nonzero lag — amortizing the per-fact-wave merge
#: commit r07 paid into at most one commit per dim wave, and zero when
#: fact and dim waves alternate within one sync. Same marker-escape
#: discipline as the secondary column index (`streaming/colindex.py`).
JVMAP_SUBDIR = "_jvmap"


def _jvmap_dir(view_dir: str) -> str:
    return os.path.join(view_dir, JVMAP_SUBDIR)


def _merge_jvmap(
    spark: SparkSession,
    view_dir: str,
    entries: DataFrame,
    join_col: str,
    num_partitions: int,
) -> None:
    """Upsert (join value, partition-id array) rows; NULL join values
    are dropped (a NULL never equi-joins a dim key, so it can have no
    dependents to invalidate — and the merge refuses NULL keys)."""
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
    )

    merge_into_partitioned_snapshot(
        spark,
        _jvmap_dir(view_dir),
        entries.filter(F.col(join_col).isNotNull()),
        key=join_col,
        seq="__seq",
        num_partitions=num_partitions,
        # map reads prune by join-value hash, never by stats
        collect_stats=False,
        # structurally one row per join value at every call site (r11):
        # _jvmap_entries_from and _union_jvmap_parts end in a
        # groupBy(join_col); vacuum_jvmap unions a groupBy output with
        # its own anti-join complement (key-disjoint) — the dedup
        # window was a per-merge exchange+sort for nothing
        assume_unique_keys=True,
    )


def _jvmap_entries_from(
    df: DataFrame, join_col: str, fact_key: str, num_partitions: int
) -> DataFrame:
    """(join value -> sorted distinct view-partition ids) of df's fact
    rows — the partition id is the view merge's own hash expression, so
    map and view can never disagree on routing."""
    from customer_segmentation_pyspark_spark.streaming.merge import (
        _part_expr,
    )

    return (
        df.select(
            F.col(join_col), _part_expr(fact_key, num_partitions).alias("__p")
        )
        .groupBy(join_col)
        .agg(F.sort_array(F.collect_set("__p")).alias("parts"))
        .withColumn("__seq", F.lit(0).cast("long"))
    )


#: above this many distinct join values, map reads switch from a
#: key_in point-read (driver list + partition pruning — the 1-key dim
#: change fast path) to a distributed semi-join against the whole map
#: table (tiny: 2 columns x distinct values) — a 15k-element IN-list
#: plan costs more than the scan it saves (r07 bench: it tripled
#: incremental_join_view)
_JVMAP_POINT_READ_MAX = 64


def _jvmap_rows_for(
    spark: SparkSession, view_dir: str, jv: DataFrame, join_col: str
) -> DataFrame:
    """Map rows of the join values in ``jv`` — point-read when few
    (collect + partition-pruned key_in), semi-join over the small map
    table otherwise. Raises FileNotFoundError when no map exists."""
    from customer_segmentation_pyspark_spark.streaming.merge import (
        read_partitioned_snapshot,
    )

    sample = jv.limit(_JVMAP_POINT_READ_MAX + 1).collect()
    if len(sample) <= _JVMAP_POINT_READ_MAX:
        vals = [r[0] for r in sample if r[0] is not None]
        return read_partitioned_snapshot(
            spark, _jvmap_dir(view_dir), key_in=vals
        ).select(join_col, "parts")
    # jv is a dim CDF's distinct join values — small by the module's
    # key-routing contract; broadcasting it keeps the probe a single
    # shuffle-free stage over the (tiny) map table (r08, VERDICT #6)
    return (
        read_partitioned_snapshot(spark, _jvmap_dir(view_dir))
        .join(F.broadcast(jv), join_col, "leftsemi")
        .select(join_col, "parts")
    )


def _union_jvmap_parts(
    spark: SparkSession,
    view_dir: str,
    fresh: DataFrame,
    join_col: str,
    num_partitions: int,
) -> None:
    """Fold fresh (join value, parts) entries into the map: each value's
    set becomes prior ∪ fresh (the superset rule — entries only grow).
    Prior entries come from a point-read for small waves and a
    semi-join over the (tiny) map table for large ones — never a
    driver-side IN-list proportional to the wave."""
    from customer_segmentation_pyspark_spark.sources import versioned

    fresh = fresh.filter(F.col(join_col).isNotNull())
    if versioned.latest_version(_jvmap_dir(view_dir)) < 1:
        # the map table was never initialized (a pre-r07 view): merging
        # ONLY this wave's entries would create a map that misses every
        # seed-era dependent — leave it absent; _ensure_jvmap owns the
        # one full-scan backfill that initializes it completely
        return
    # single execution of the fold plan (r11): the old flow executed it
    # THREE times — isEmpty(), the prior lookup's bounded sample, and
    # the merge's staging job. One bounded collect answers emptiness
    # AND the point-read key list; past the cap the checkpoint feeds
    # both the prior semi-join and the staging job.
    head = fresh.limit(_JVMAP_POINT_READ_MAX + 1).collect()
    if not head:
        return
    if len(head) <= _JVMAP_POINT_READ_MAX:
        fresh = spark.createDataFrame(head, fresh.schema)
    else:
        fresh = fresh.localCheckpoint(eager=True)
    prior = _jvmap_rows_for(
        spark, view_dir, fresh.select(join_col), join_col
    )
    entries = (
        fresh.select(join_col, "parts")
        .unionByName(prior)
        .groupBy(join_col)
        .agg(
            F.sort_array(
                F.array_distinct(F.flatten(F.collect_list("parts")))
            ).alias("parts")
        )
        .withColumn("__seq", F.lit(0).cast("long"))
    )
    _merge_jvmap(spark, view_dir, entries, join_col, num_partitions)


#: dropped inside the map dir for the duration of a vacuum sweep (r08,
#: VERDICT #4) — see :func:`vacuum_jvmap`; the file's CONTENT is the
#: view's fact cursor at derivation time, the ceiling every concurrent
#: marker write clamps to
JVMAP_VACUUM_MARKER = "_vacuum-inprogress"


def _jvmap_vacuum_marker_path(view_dir: str) -> str:
    return os.path.join(_jvmap_dir(view_dir), JVMAP_VACUUM_MARKER)


def _write_jvmap_marker(view_dir: str, fact_version: int) -> None:
    """Stamp the map's fact-version marker — CLAMPED to a live vacuum
    sweep's derivation version (r08): advancing the marker past what
    the sweep is about to clip entries back to would stamp coverage
    the map no longer has; the escape hatch starts at the marker, so
    a too-low marker only costs IO, never correctness."""
    os.makedirs(_jvmap_dir(view_dir), exist_ok=True)
    try:
        with open(_jvmap_vacuum_marker_path(view_dir)) as f:
            fact_version = min(
                int(fact_version), int(f.read().strip() or 0)
            )
    except FileNotFoundError:
        pass
    except ValueError:
        fact_version = 0  # unreadable sweep marker: claim nothing
    _write_marker(_jvmap_dir(view_dir), fact_version)


def _ensure_jvmap(
    spark: SparkSession,
    view_dir: str,
    join_col: str,
    fact_cursor: int | None = None,
) -> None:
    """Initialize the inverted map from the CURRENT view when it does
    not exist yet (a view seeded pre-r07, or a crash before the seed's
    map merge) — the one O(view) backfill; committed maps make this a
    single manifest read. ``fact_cursor`` (r08) is the fact version the
    view reflects: it becomes the map's fact-version marker — for a
    backfill the entries cover exactly the committed view, and for a
    pre-r08 map (committed but markerless) the eager per-wave merges
    guaranteed coverage through the view's cursor."""
    from customer_segmentation_pyspark_spark.sources import versioned

    if versioned.latest_version(_jvmap_dir(view_dir)) >= 1:
        if (
            fact_cursor is not None
            and view_src_version(_jvmap_dir(view_dir)) is None
        ):
            _write_jvmap_marker(view_dir, fact_cursor)
        return
    man = versioned.read_manifest(view_dir)
    if man is None:
        return
    view_now = _snapshot_or_empty(
        spark, view_dir, versioned.latest_version(view_dir)
    )
    _merge_jvmap(
        spark,
        view_dir,
        _jvmap_entries_from(
            view_now, join_col, man["key"], int(man["num_partitions"])
        ),
        join_col,
        int(man["num_partitions"]),
    )
    if fact_cursor is not None:
        _write_jvmap_marker(view_dir, fact_cursor)


def vacuum_jvmap(spark: SparkSession, view_dir: str) -> None:
    """Inverted-map GC (r08, VERDICT #4): the superset rule means fact
    deletes and join-key retargets never remove entries, so a
    churn-heavy view accretes (a) partition ids no current dependent
    occupies and (b) whole rows for join values with no dependents
    left — read IO, never correctness. This re-derives every live join
    value's EXACT entry from the committed view (replace-merge over the
    bloated superset) and DELETES the rows of vanished values, as ONE
    ordinary merge commit — never a table drop: concurrent readers keep
    reading committed map versions, and a concurrent sync's map merge
    either composes (disjoint map partitions) or raises the merge
    layer's own ``ConcurrentMergeError``.

    Crash-safety: reads stay exact through ANY partial state — a
    clipped entry only loses partitions with no current dependent at
    the derivation version, newer dependents ride the fact-version
    escape hatch, and the version marker is only advanced after the
    merge, clamped to the derivation cursor recorded in the
    ``_vacuum-inprogress`` marker. The in-progress marker guards the
    one true race (a concurrent sync stamping coverage over entries
    this sweep just clipped): syncs seeing it rebuild exact entries
    instead of folding incrementally, their marker stamps clamp to the
    derivation cursor, and only a completing vacuum removes it — the
    IVF keymap vacuum's discipline (`operators/vector_index.py`)."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )

    jm = _jvmap_dir(view_dir)
    if versioned.latest_version(jm) < 1:
        return  # no committed map: nothing to vacuum
    man = versioned.read_manifest(view_dir)
    if man is None:
        raise FileNotFoundError(f"no committed view in {view_dir}")
    join_col = versioned.read_manifest(jm)["key"]
    fact_key, view_parts = man["key"], int(man["num_partitions"])
    cur = _join_cursors(view_dir)
    va0 = cur[0] if cur is not None else 0
    with open(_jvmap_vacuum_marker_path(view_dir), "w") as f:
        f.write(str(va0))
    view_now = _snapshot_or_empty(
        spark, view_dir, versioned.latest_version(view_dir)
    )
    exact = _jvmap_entries_from(
        view_now, join_col, fact_key, view_parts
    ).filter(F.col(join_col).isNotNull()).withColumn("__op", F.lit("U"))
    try:
        live_vals = read_partitioned_snapshot(spark, jm).select(join_col)
    except FileNotFoundError:
        live_vals = None  # committed-empty map
    batch = exact
    if live_vals is not None:
        stale = (
            live_vals.join(exact.select(join_col), join_col, "left_anti")
            .withColumn("parts", F.lit(None).cast("array<int>"))
            .withColumn("__seq", F.lit(1).cast("long"))
            .withColumn("__op", F.lit("D"))
        )
        batch = exact.unionByName(stale)
    merge_into_partitioned_snapshot(
        spark,
        jm,
        batch,
        key=join_col,
        seq="__seq",
        delete_when="__op = 'D'",
        marker_cols=("__op",),
        collect_stats=False,
    )
    _write_jvmap_marker(view_dir, va0)
    try:
        os.remove(_jvmap_vacuum_marker_path(view_dir))
    except OSError:
        pass


def _invalidated_view_read(
    spark: SparkSession,
    view_dir: str,
    join_col: str,
    jv: DataFrame,
    extra_pids=(),
) -> DataFrame:
    """The dim-wave view read, pruned by the inverted map: look up the
    changed join values' map rows (point-read for small waves,
    semi-join for large — `_jvmap_rows_for`), collect the union of
    their partition ids (<= the view's num_partitions ints), and open
    ONLY those view partitions. ``extra_pids`` (r08) is the lazy-map
    escape hatch: the view partitions of fact keys changed since the
    map's fact-version marker — unioned in so a stale map can never
    hide a dependent. Separated so tests can assert the pruning on
    ``inputFiles()``. Falls back to the full view scan when the map
    subtable does not exist (an all-NULL-join-value view has no
    committable map entries; :func:`_ensure_jvmap` owns backfills)."""
    from customer_segmentation_pyspark_spark.sources import versioned

    view_v = versioned.latest_version(view_dir)
    try:
        hit = _jvmap_rows_for(spark, view_dir, jv, join_col)
    except FileNotFoundError:
        return _snapshot_or_empty(spark, view_dir, view_v)
    pids = {
        int(r["p"])
        for r in hit.select(F.explode("parts").alias("p")).collect()
    } | {int(p) for p in extra_pids}
    return _snapshot_or_empty_partitions(
        spark, view_dir, view_v, sorted(pids)
    )


def _snapshot_or_empty_partitions(
    spark: SparkSession, table_dir: str, version: int, pids: list
):
    """Partition-projected read that degrades to an empty typed frame
    when nothing survives (all rows deleted, or no dependent
    partitions)."""
    from pyspark.sql.types import StructType

    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        read_partitioned_snapshot,
    )

    try:
        return read_partitioned_snapshot(
            spark, table_dir, version=version, partitions_in=pids
        )
    except FileNotFoundError:
        man = versioned.read_manifest(table_dir, version)
        if man is None or "schema" not in man:
            raise
        return spark.createDataFrame([], StructType.fromJson(man["schema"]))


def _join_cursors(view_dir: str) -> tuple[int, int] | None:
    import json

    try:
        with open(os.path.join(view_dir, JOIN_CURSOR_FILE)) as f:
            d = json.load(f)
        return int(d["fact"]), int(d["dim"])
    except (FileNotFoundError, ValueError, KeyError):
        return None


def _write_join_cursors(view_dir: str, fact_v: int, dim_v: int) -> None:
    import json

    # an empty seed (zero-row fact) commits no view data, so the merge
    # never created the dir — the cursors still need a home (r08)
    os.makedirs(view_dir, exist_ok=True)
    tmp = os.path.join(view_dir, f".cursor-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump({"fact": int(fact_v), "dim": int(dim_v)}, f)
    os.replace(tmp, os.path.join(view_dir, JOIN_CURSOR_FILE))


def _snapshot_or_empty(spark: SparkSession, table_dir: str, version: int):
    """A table whose every row was deleted still has a manifest (with
    schema) but no part dirs — the reader raises there; the view must
    treat it as an EMPTY state, not a missing table."""
    from pyspark.sql.types import StructType

    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        read_partitioned_snapshot,
    )

    try:
        return read_partitioned_snapshot(spark, table_dir, version=version)
    except FileNotFoundError:
        man = versioned.read_manifest(table_dir, version)
        if man is None or "schema" not in man:
            raise
        return spark.createDataFrame(
            [], StructType.fromJson(man["schema"])
        )


def sync_join_view_to_snapshots(
    spark: SparkSession,
    fact_dir: str,
    dim_dir: str,
    view_dir: str,
    join_col: str,
    num_partitions: int = 32,
) -> tuple[int, int]:
    """Bring the enrichment view up to both sources' latest versions,
    folding only their change feeds since the cursored versions
    (seeding with one full join on first call). The dim table must be
    keyed BY ``join_col`` (the FK-dim shape); fact and dim payload
    column names must be disjoint so the view's columns are
    unambiguous. Returns the (fact, dim) versions the view reflects."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        _part_expr,
        merge_into_partitioned_snapshot,
        read_snapshot_changes,
    )

    fa = versioned.latest_version(fact_dir)
    db = versioned.latest_version(dim_dir)
    if fa < 1 or db < 1:
        raise FileNotFoundError("both sources need a committed snapshot")
    fact_man = versioned.read_manifest(fact_dir)
    dim_man = versioned.read_manifest(dim_dir)
    fact_key = fact_man["key"]
    if dim_man["key"] != join_col:
        raise ValueError(
            f"dim table {dim_dir} is keyed by '{dim_man['key']}', not the "
            f"join column '{join_col}' — the enrichment view needs the "
            "FK-dim shape"
        )
    dim_now = _snapshot_or_empty(spark, dim_dir, db)
    fact_fields_now = _snapshot_or_empty(
        spark, fact_dir, fa
    ).schema.fields
    fact_cols_now = [f.name for f in fact_fields_now]
    clash = (set(dim_now.columns) - {join_col}) & set(fact_cols_now)
    if clash:
        raise ValueError(
            f"fact and dim share non-join columns {sorted(clash)}; "
            "rename one side before building the view"
        )

    cur = _join_cursors(view_dir) if os.path.isdir(view_dir) else None
    if cur is not None and versioned.read_manifest(view_dir) is None:
        # cursors exist but the view never committed: a seed sync over a
        # zero-row fact table writes the cursors while the merge commits
        # nothing ("if not touched: return") — re-seed instead of
        # subscripting the None manifest below (r08, ADVICE)
        cur = None
    if cur is None:
        fact = _snapshot_or_empty(spark, fact_dir, fa)
        seeded = fact.withColumn("__seq", F.lit(0).cast("long")).join(
            dim_now, join_col, "left"
        )
        merge_into_partitioned_snapshot(
            spark,
            view_dir,
            seeded,
            key=fact_key,
            seq="__seq",
            num_partitions=num_partitions,
            # fact snapshot (keyed table: one row per key) left-joined
            # to a dim keyed BY the join column (at most one match)
            assume_unique_keys=True,
        )
        _ensure_jvmap(spark, view_dir, join_col, fact_cursor=fa)
        _write_join_cursors(view_dir, fa, db)
        return fa, db
    va0, vb0 = cur
    if va0 >= fa and vb0 >= db:
        return va0, vb0  # already current — the idempotent no-op

    # one-time backfill for views seeded before the inverted map
    # existed; a no-op (one manifest read) on every later sync
    _ensure_jvmap(spark, view_dir, join_col, fact_cursor=va0)
    view_parts = int(versioned.read_manifest(view_dir)["num_partitions"])

    fact_cols = [c for c in fact_cols_now]
    changed_parts = []
    ups_a = None
    map_catchup = None  # deferred jvmap fold, run ∥ the view merge (r10)
    if fa > va0:
        # materialize the fact CDF once: the escape-hatch/catch-up path
        # and the view merge each action it, and every action would
        # otherwise re-run the manifest-diff plan (the same fixed-cost
        # lesson as the r06 index sync)
        cdf_a = read_snapshot_changes(
            spark, fact_dir, va0, fa
        ).localCheckpoint(eager=True)
        ups_a = (
            cdf_a.filter(
                F.col("_change_type").isin("insert", "update_postimage")
            )
            .select(*fact_cols)
            .withColumn("__seq", F.lit(2).cast("long"))
            .withColumn("__op", F.lit("U"))
        )
        dels_a = (
            cdf_a.filter(F.col("_change_type") == "delete")
            .select(*fact_cols)
            .withColumn("__seq", F.lit(3).cast("long"))
            .withColumn("__op", F.lit("D"))
        )
        changed_parts += [ups_a, dels_a]
        # NO eager map merge (r08, VERDICT #6): the map's fact-version
        # marker plus the dim-wave escape hatch below keep stale maps
        # exact, so fact waves commit nothing to the map — the r07
        # design paid one map merge commit per fact wave here
    if db > vb0:
        cdf_b = read_snapshot_changes(
            spark, dim_dir, vb0, db
        ).localCheckpoint(eager=True)
        # join values invalidated by the dim wave — pre AND post images,
        # so a dim-key retarget re-enriches both old and new dependents
        jv = cdf_b.select(join_col).distinct()
        # interrupted (or live) vacuum sweep (r08): incremental
        # catch-up folds can't be trusted to compose with a mid-flight
        # clip — rebuild exact entries from the committed view instead
        # (redundant if the sweep is live, the heal if it crashed); the
        # sweep marker stays, only a completing vacuum removes it, and
        # the marker stamp clamps to the sweep's derivation version
        jvmap_frozen = os.path.exists(_jvmap_vacuum_marker_path(view_dir))
        if (
            jvmap_frozen
            and versioned.latest_version(_jvmap_dir(view_dir)) >= 1
        ):
            view_cur = _snapshot_or_empty(
                spark, view_dir, versioned.latest_version(view_dir)
            )
            _merge_jvmap(
                spark,
                view_dir,
                _jvmap_entries_from(
                    view_cur, join_col, fact_key, view_parts
                ),
                join_col,
                view_parts,
            )
            _write_jvmap_marker(view_dir, va0)
        # lazy-map escape hatch (r08): fact post-images in
        # (map marker, view's fact cursor] are dependents the committed
        # map has not learned yet — their view partitions (a pruned CDF
        # read, no join-value filter needed: a superset of partitions
        # costs IO, never correctness) are unioned into the dim read
        mv = view_src_version(_jvmap_dir(view_dir))
        escape_pids: list = []
        lag_posts = None
        if mv is not None and va0 > mv:
            try:
                lag_posts = (
                    read_snapshot_changes(spark, fact_dir, mv, va0)
                    .filter(
                        F.col("_change_type").isin(
                            "insert", "update_postimage"
                        )
                    )
                    .select(
                        F.col(join_col),
                        _part_expr(fact_key, view_parts).alias("__p"),
                    )
                    .localCheckpoint(eager=True)
                )
                escape_pids = sorted(
                    int(r["__p"])
                    for r in lag_posts.select("__p").distinct().collect()
                )
            except FileNotFoundError:
                # the marker version's manifest expired: the lag can no
                # longer be replayed — rebuild exact entries from the
                # committed view (the one O(view) heal; replace-merge,
                # so bloat shrinks too) and continue with a clean map
                lag_posts = None
                view_cur = _snapshot_or_empty(
                    spark, view_dir, versioned.latest_version(view_dir)
                )
                _merge_jvmap(
                    spark,
                    view_dir,
                    _jvmap_entries_from(
                        view_cur, join_col, fact_key, view_parts
                    ),
                    join_col,
                    view_parts,
                )
                _write_jvmap_marker(view_dir, va0)
                mv = va0
        view_now = _invalidated_view_read(
            spark, view_dir, join_col, jv, extra_pids=escape_pids
        )
        # schema-evolution tolerance (r07, ADVICE): a fact merge that
        # added a column since the view's last sync leaves view_now
        # without it when the first post-evolution wave is dim-only —
        # select the intersection and pad the missing columns with
        # typed NULLs (the merge's mergeSchema union already tolerates
        # that), instead of crashing until a fact wave repairs the view
        have = set(view_now.columns)
        sel = [
            F.col(f.name)
            if f.name in have
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in fact_fields_now
        ]
        re_rows = (
            view_now.join(jv, join_col, "semi")
            .select(*sel)
            .withColumn("__seq", F.lit(1).cast("long"))
            .withColumn("__op", F.lit("U"))
        )
        changed_parts.append(re_rows)
        # amortized catch-up (r08): a dim wave that found lag folds the
        # whole lag PLUS the current wave's upserts into the map in one
        # merge, then advances the marker — at most one map commit per
        # dim wave, zero when the map is already current (the marker
        # write follows its merge, so a crash between them just
        # re-folds the same slice; the union apply is idempotent)
        if lag_posts is not None and not jvmap_frozen:
            fold = (
                lag_posts.filter(F.col(join_col).isNotNull())
                .groupBy(join_col)
                .agg(F.sort_array(F.collect_set("__p")).alias("parts"))
                .withColumn("__seq", F.lit(0).cast("long"))
            )
            if ups_a is not None:
                fold = fold.unionByName(
                    _jvmap_entries_from(
                        ups_a, join_col, fact_key, view_parts
                    )
                )

            def _map_catchup(f=fold):
                _union_jvmap_parts(spark, view_dir, f, join_col, view_parts)
                _write_jvmap_marker(
                    view_dir, fa if ups_a is not None else va0
                )

            map_catchup = _map_catchup
    if not changed_parts:
        if map_catchup is not None:
            map_catchup()
        _write_join_cursors(view_dir, fa, db)
        return fa, db
    changed = changed_parts[0]
    for p in changed_parts[1:]:
        changed = changed.unionByName(p)
    # enrich ONCE against the current dim; deletes ride through with
    # their (soon-dropped) NULL attrs
    batch = changed.join(dim_now, join_col, "left")

    def _view_merge():
        merge_into_partitioned_snapshot(
            spark,
            view_dir,
            batch,
            key=fact_key,
            seq="__seq",
            delete_when="__op = 'D'",
            marker_cols=("__op",),
            update_set_all=True,
        )

    if map_catchup is not None:
        # the map catch-up and the view merge commit to DIFFERENT
        # manifests (view_dir vs its .jvmap subtable) off already-
        # checkpointed inputs, so they run concurrently (r10, VERDICT
        # #3). Either may land first: a map that got ahead of a crashed
        # view merge holds SUPERSET entries for rows the retried merge
        # will place exactly there (union-only apply — superset pruning
        # costs IO, never correctness); a map behind a landed merge is
        # the ordinary lag the escape hatch already covers.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as ex:
            futures = [ex.submit(_view_merge), ex.submit(map_catchup)]
            for fu in futures:
                fu.result()
    else:
        _view_merge()
    _write_join_cursors(view_dir, fa, db)
    return fa, db


# ---------------------------------------------------------------------------
# Incremental MIN/MAX view maintenance (r06): the textbook
# NON-self-maintainable aggregate. Inserts fold in cheaply
# (least/greatest), but deleting a group's current extremum leaves the
# new extremum unknown without data — those groups (and only those) are
# re-aggregated from the current snapshot. Per wave the cost is
# O(|changes| + rescan of DIRTY groups' rows); a wave that never
# touches an extremum costs the same as the COUNT/SUM view. This
# completes the IVM family: COUNT/SUM (self-maintainable), JOIN
# enrichment (keyed re-derivation), MIN/MAX (scoped rescan).
# ---------------------------------------------------------------------------


def seed_min_max_view(
    spark: SparkSession,
    view_dir: str,
    snapshot: DataFrame,
    group_col: str,
    value_col,
    src_version: int | None = None,
) -> None:
    """Bootstrap (group, n_rows, vmin, vmax) from a full snapshot."""
    import shutil

    shutil.rmtree(view_dir, ignore_errors=True)
    agg = snapshot.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
    )
    tmp = f"{view_dir}.tmp-{uuid.uuid4().hex[:8]}"
    agg.write.mode("overwrite").parquet(tmp)
    _write_marker(tmp, src_version)
    crash_safe_swap(view_dir, tmp)


def update_min_max_view(
    spark: SparkSession,
    view_dir: str,
    cdf: DataFrame,
    group_col: str,
    value_col,
    current_snapshot: DataFrame,
    src_version: int | None = None,
) -> None:
    """Apply one CDF slice. Insert/post-image values fold in with
    least/greatest; a group whose delete/pre-image side touches its
    recorded extremum (or that the adds alone cannot bound) goes DIRTY
    and is re-aggregated from ``current_snapshot`` — the snapshot AFTER
    the slice, so a recompute is exact. Drive through
    :func:`sync_minmax_view_to_snapshot` for exactly-once (the additive
    n_rows counter is not idempotent, same caveat as the COUNT/SUM
    view). NULL values never count toward min/max but do count rows."""
    ct = F.col("_change_type")
    adds = (
        cdf.filter(ct.isin("insert", "update_postimage"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("__a_n"),
            F.min(value_col).alias("__a_min"),
            F.max(value_col).alias("__a_max"),
        )
    )
    subs = (
        cdf.filter(ct.isin("delete", "update_preimage"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("__s_n"),
            F.min(value_col).alias("__s_min"),
            F.max(value_col).alias("__s_max"),
        )
    )
    delta = adds.withColumnRenamed(group_col, "__g").join(
        subs.withColumnRenamed(group_col, "__g2"),
        F.col("__g").eqNullSafe(F.col("__g2")),
        "full_outer",
    ).select(
        F.coalesce("__g", "__g2").alias("__g"),
        "__a_n", "__a_min", "__a_max", "__s_n", "__s_min", "__s_max",
    )
    # materialize once (r11): `merged` below is referenced by both the
    # clean branch and the dirty-group derivation, so without this the
    # write job executes the CDF diff (inside adds AND subs) up to
    # four times
    delta = _materialize_small(spark, delta)
    recover_swap(view_dir)
    base = spark.read.parquet(view_dir)
    j = base.join(
        delta, F.col(group_col).eqNullSafe(F.col("__g")), "full_outer"
    )
    g = F.coalesce(F.col(group_col), F.col("__g")).alias(group_col)
    n = (
        F.coalesce(F.col("n_rows"), F.lit(0))
        + F.coalesce(F.col("__a_n"), F.lit(0))
        - F.coalesce(F.col("__s_n"), F.lit(0))
    ).alias("n_rows")
    # dirty: a removed value ties the recorded extremum (the survivor
    # extremum is unknown), or the group is brand-new-with-history
    # complications — a group absent from base is bounded by adds alone
    dirty = (
        F.col("n_rows").isNotNull()
        & F.col("__s_n").isNotNull()
        & (
            (F.col("__s_min") <= F.col("vmin"))
            | (F.col("__s_max") >= F.col("vmax"))
        )
    ).alias("__dirty")
    merged = j.select(
        g,
        n,
        F.least("vmin", "__a_min").alias("vmin"),
        F.greatest("vmax", "__a_max").alias("vmax"),
        dirty,
    ).filter(F.col("n_rows") > 0)
    clean = merged.filter(~F.coalesce("__dirty", F.lit(False))).drop(
        "__dirty"
    )
    dirty_groups = merged.filter(
        F.coalesce("__dirty", F.lit(False))
    ).select(F.col(group_col).alias("__dg"))
    # scoped rescan: ONLY dirty groups' rows re-aggregate — n_rows too,
    # straight from the snapshot (self-heals a drifted counter)
    rescanned = (
        current_snapshot.join(
            dirty_groups,
            F.col(group_col).eqNullSafe(F.col("__dg")),
            "leftsemi",
        )
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min(value_col).alias("vmin"),
            F.max(value_col).alias("vmax"),
        )
        .select(group_col, "n_rows", "vmin", "vmax")
    )
    out = clean.unionByName(rescanned)
    tmp = f"{view_dir}.tmp-{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(tmp)
    _write_marker(tmp, src_version)
    crash_safe_swap(view_dir, tmp)


def sync_minmax_view_to_snapshot(
    spark: SparkSession,
    table_dir: str,
    view_dir: str,
    group_col: str,
    value_col,
) -> int:
    """Exactly-once driver: seed on first call, then fold only the CDF
    since the cursored version (marker swapped atomically with data,
    same shape as :func:`sync_view_to_snapshot`)."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        read_partitioned_snapshot,
        read_snapshot_changes,
    )

    cur = versioned.latest_version(table_dir)
    if cur < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    recover_swap(view_dir)
    v0 = view_src_version(view_dir) if os.path.exists(view_dir) else None
    if v0 is None:
        seed_min_max_view(
            spark,
            view_dir,
            _snapshot_or_empty(spark, table_dir, cur),
            group_col,
            value_col,
            src_version=cur,
        )
        return cur
    if v0 >= cur:
        return v0
    update_min_max_view(
        spark,
        view_dir,
        read_snapshot_changes(spark, table_dir, v0, cur),
        group_col,
        value_col,
        _snapshot_or_empty(spark, table_dir, cur),
        src_version=cur,
    )
    return cur


# ---------------------------------------------------------------------------
# Incremental TOP-K view (r08): per-group top-k DISTINCT values, the
# IVM case that sits between MIN/MAX (scoped rescan) and COUNT-DISTINCT
# (support multiset). The view buffers the top (k + slack) distinct
# values per group WITH their multiplicities, plus a per-group
# ``__complete`` flag recording whether the buffer holds ALL of the
# group's distinct values. The buffered frontier (the group's minimum
# buffered value) makes every slice decidable without touching the
# source table:
#   * a change to a BUFFERED value folds additively into its count;
#   * a brand-new value ABOVE the frontier (or any value of a complete
#     group / a brand-new group) enters with its slice-net count — it
#     cannot have prior rows, because an incomplete buffer holds every
#     existing value above its frontier;
#   * an insert BELOW the frontier of an incomplete group is discarded
#     (it cannot reach the top-k while the buffer holds >= k larger
#     values), and a delete below the frontier is ignored — neither
#     disturbs "buffer == exactly the top-|buffer| distinct values";
#   * groups are trimmed back to (k + slack) after entries (a trimmed
#     group becomes incomplete).
# A group goes DIRTY — re-aggregated from the post-slice snapshot,
# scoped to that group alone, like MIN/MAX — only when its incomplete
# buffer underflows k (deletes consumed the slack) or when a count
# drifts negative / a complete group sees a delete for a value it
# doesn't hold (impossible under the exactly-once cursor; kept as a
# self-heal). NULL values never participate (top-k over values is
# NULL-free by SQL ordering semantics).
#
# At 100 TB: the view is O(groups * (k + slack)) rows, every update is
# a join of the slice's (group, value) deltas against that small state,
# and the only source-table read is the scoped rescan of underflowed
# groups. k and slack persist at creation (changing them is a rebuild),
# same discipline as the range index's bucket width.
# ---------------------------------------------------------------------------

TOPK_META_FILE = "_TOPK_META"


def _write_topk_meta(dir_path: str, k: int, slack: int) -> None:
    import json

    with open(os.path.join(dir_path, TOPK_META_FILE), "w") as f:
        json.dump({"k": int(k), "slack": int(slack)}, f)


def topk_view_meta(view_dir: str) -> tuple[int, int]:
    """The (k, slack) this view was created with."""
    import json

    with open(os.path.join(view_dir, TOPK_META_FILE)) as f:
        m = json.load(f)
    return int(m["k"]), int(m["slack"])


def _topk_buffer(snapshot: DataFrame, group_col: str, value_col, cap: int):
    """Top-``cap`` distinct values per group with multiplicities and the
    completeness flag — the seed/rescan aggregation."""
    from pyspark.sql.window import Window

    sup = (
        snapshot.filter(value_col.isNotNull())
        .groupBy(F.col(group_col).alias("__g"), value_col.alias("__v"))
        .agg(F.count(F.lit(1)).cast("long").alias("__mult"))
    )
    w = Window.partitionBy("__g")
    ranked = sup.withColumn(
        "__rn",
        F.row_number().over(w.orderBy(F.col("__v").desc())),
    ).withColumn("__nd", F.count(F.lit(1)).over(w))
    return ranked.filter(F.col("__rn") <= cap).select(
        "__g",
        "__v",
        "__mult",
        (F.col("__nd") <= cap).alias("__complete"),
    )


def seed_topk_view(
    spark: SparkSession,
    view_dir: str,
    snapshot: DataFrame,
    group_col: str,
    value_col,
    k: int,
    slack: int = 3,
    src_version: int | None = None,
) -> None:
    """Bootstrap the buffered top-(k+slack) state from a full snapshot."""
    import shutil

    if k < 1 or slack < 0:
        raise ValueError(f"need k >= 1 and slack >= 0, got ({k}, {slack})")
    shutil.rmtree(view_dir, ignore_errors=True)
    buf = _topk_buffer(snapshot, group_col, value_col, k + slack)
    tmp = f"{view_dir}.tmp-{uuid.uuid4().hex[:8]}"
    buf.write.mode("overwrite").parquet(tmp)
    _write_marker(tmp, src_version)
    _write_topk_meta(tmp, k, slack)
    crash_safe_swap(view_dir, tmp)


def update_topk_view(
    spark: SparkSession,
    view_dir: str,
    cdf: DataFrame,
    group_col: str,
    value_col,
    current_snapshot: DataFrame,
    src_version: int | None = None,
) -> None:
    """Fold one CDF slice into the buffered state (see the family
    comment for the decision table). ``current_snapshot`` is the
    source AFTER the slice — only dirty groups read it. Additive like
    the other IVM views: drive through
    :func:`sync_topk_view_to_snapshot` for exactly-once."""
    from pyspark.sql.window import Window

    k, slack = topk_view_meta(view_dir)
    cap = k + slack
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = (
        cdf.filter(value_col.isNotNull())
        .groupBy(F.col(group_col).alias("__dg"), value_col.alias("__dv"))
        .agg(F.sum(sign).cast("long").alias("__d"))
        .filter(F.col("__d") != 0)
    )
    # materialize once (r11): `staged`/`trimmed`/`dirty_groups` below
    # fan the delta subtree into half a dozen branches of one write
    # plan — without this the CDF diff executes once per branch
    delta = _materialize_small(spark, delta)
    recover_swap(view_dir)
    base = spark.read.parquet(view_dir)
    # per-group frontier + completeness of the PRE-slice buffer
    gstats = base.groupBy(F.col("__g").alias("__sg")).agg(
        F.min("__v").alias("__fmin"),
        F.max(F.col("__complete").cast("int")).alias("__ci"),
    )
    j = base.join(
        delta,
        F.col("__g").eqNullSafe(F.col("__dg"))
        & (F.col("__v") == F.col("__dv")),
        "full_outer",
    ).select(
        F.coalesce("__g", "__dg").alias("__g"),
        F.coalesce("__v", "__dv").alias("__v"),
        "__mult",
        "__d",
    )
    m = j.join(
        gstats, F.col("__g").eqNullSafe(F.col("__sg")), "left"
    ).drop("__sg")
    in_base = F.col("__mult").isNotNull()
    known = F.col("__fmin").isNotNull()  # group existed in the buffer
    complete_g = F.col("__ci") == 1
    newm = (
        F.coalesce(F.col("__mult"), F.lit(0))
        + F.coalesce(F.col("__d"), F.lit(0))
    )
    # a delta-only value is PROVABLY brand-new when the group is new,
    # complete, or the value sits above the frontier
    provable = ~known | complete_g | (F.col("__v") > F.col("__fmin"))
    enter = ~in_base & provable & (newm > 0)
    drift = (in_base & (newm < 0)) | (
        ~in_base & provable & (F.coalesce(F.col("__d"), F.lit(0)) < 0)
    )
    staged = m.select(
        "__g",
        "__v",
        newm.alias("__mult"),
        (in_base | enter).alias("__keep"),
        drift.alias("__drift"),
        # complete-so-far: a new group starts complete; an existing
        # group carries its flag (trim below may clear it)
        F.when(known, complete_g).otherwise(F.lit(True)).alias("__c0"),
    )
    w = Window.partitionBy("__g")
    live = staged.filter(F.col("__keep") & (F.col("__mult") > 0))
    ranked = live.withColumn(
        "__rn", F.row_number().over(w.orderBy(F.col("__v").desc()))
    ).withColumn("__n", F.count(F.lit(1)).over(w))
    trimmed = ranked.filter(F.col("__rn") <= cap).select(
        "__g",
        "__v",
        "__mult",
        (F.col("__c0") & (F.col("__n") <= cap)).alias("__complete"),
        F.least(F.col("__n"), F.lit(cap)).alias("__live_n"),
    )
    # dirty: drift anywhere in the group, or an incomplete buffer that
    # underflowed k (deletes consumed the slack) — including groups
    # whose buffer emptied entirely (absent from `trimmed`)
    per_g = staged.groupBy("__g").agg(
        F.max(F.col("__drift").cast("int")).alias("__dr"),
        F.max(F.col("__c0").cast("int")).alias("__c0i"),
    )
    sizes = trimmed.groupBy(F.col("__g").alias("__zg")).agg(
        F.max("__live_n").alias("__ln"),
        F.max(F.col("__complete").cast("int")).alias("__compi"),
    )
    dirty_groups = (
        per_g.join(sizes, F.col("__g").eqNullSafe(F.col("__zg")), "left")
        .filter(
            (F.col("__dr") == 1)
            | (
                (F.coalesce(F.col("__compi"), F.col("__c0i")) == 0)
                & (F.coalesce(F.col("__ln"), F.lit(0)) < k)
            )
        )
        .select(F.col("__g").alias("__dirtyg"))
    )
    clean = trimmed.join(
        dirty_groups,
        F.col("__g").eqNullSafe(F.col("__dirtyg")),
        "left_anti",
    ).select("__g", "__v", "__mult", "__complete")
    rescanned = _topk_buffer(
        current_snapshot.join(
            dirty_groups,
            F.col(group_col).eqNullSafe(F.col("__dirtyg")),
            "leftsemi",
        ),
        group_col,
        value_col,
        cap,
    )
    out = clean.unionByName(rescanned)
    tmp = f"{view_dir}.tmp-{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(tmp)
    _write_marker(tmp, src_version)
    _write_topk_meta(tmp, k, slack)
    crash_safe_swap(view_dir, tmp)


def read_topk_view(spark: SparkSession, view_dir: str) -> DataFrame:
    """(group, value, multiplicity, rank) for rank <= k — exact top-k
    distinct values per group (groups with fewer than k distinct
    values expose them all; the post-sync invariant guarantees every
    incomplete buffer still holds >= k values)."""
    from pyspark.sql.window import Window

    k, _ = topk_view_meta(view_dir)
    recover_swap(view_dir)
    buf = spark.read.parquet(view_dir)
    w = Window.partitionBy("__g").orderBy(F.col("__v").desc())
    return (
        buf.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .select("__g", "__v", "__mult", F.col("__rank").cast("long").alias("__rank"))
    )


def sync_topk_view_to_snapshot(
    spark: SparkSession,
    table_dir: str,
    view_dir: str,
    group_col: str,
    value_col,
    k: int | None = None,
    slack: int = 3,
) -> int:
    """Exactly-once driver: seed on first call (``k`` required), then
    fold only the CDF since the cursored version. ``k``/``slack`` are
    creation-time parameters — passing a different ``k`` later raises
    (a re-parameterized view is a rebuild, same contract as the range
    index's bucket width)."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        read_partitioned_snapshot,
        read_snapshot_changes,
    )

    cur = versioned.latest_version(table_dir)
    if cur < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    recover_swap(view_dir)
    v0 = view_src_version(view_dir) if os.path.exists(view_dir) else None
    if v0 is None:
        if k is None:
            raise ValueError("k is required when seeding a top-k view")
        seed_topk_view(
            spark,
            view_dir,
            _snapshot_or_empty(spark, table_dir, cur),
            group_col,
            value_col,
            k,
            slack=slack,
            src_version=cur,
        )
        return cur
    k0, _s0 = topk_view_meta(view_dir)
    if k is not None and int(k) != k0:
        raise ValueError(
            f"view was created with k={k0}; changing k is a rebuild"
        )
    if v0 >= cur:
        return v0
    update_topk_view(
        spark,
        view_dir,
        read_snapshot_changes(spark, table_dir, v0, cur),
        group_col,
        value_col,
        _snapshot_or_empty(spark, table_dir, cur),
        src_version=cur,
    )
    return cur


# ---------------------------------------------------------------------------
# Incremental QUANTILE view (r08): percentiles with FULL delete support.
# Sketches (t-digest, GK, KLL) are insert-only — a delete cannot be
# subtracted — so the maintainable construction is the bucketized
# support multiset: per (group, floor(value/width)) multiplicities
# folded with signed CDF contributions (the COUNT-DISTINCT machinery on
# a quantized value). Every percentile then derives exactly from the
# support at BUCKET resolution — error is bounded by ``width``, chosen
# at creation, and never degrades under churn. Rank arithmetic is pure
# integers (idx = ceil(n*p/100) computed as (n*p + 99) div 100), so the
# DuckDB oracle reproduces it bit-for-bit.
#
# At 100 TB: state is O(groups x occupied buckets), an update joins the
# slice's bucket deltas against that state, and there is no rescan path
# at all (the support is self-maintainable). The p95-latency dashboard
# shape: maintained per merge wave without rescanning history.
# ---------------------------------------------------------------------------

QVIEW_META_FILE = "_QVIEW_META"


def _write_qview_meta(dir_path: str, width: float) -> None:
    import json

    with open(os.path.join(dir_path, QVIEW_META_FILE), "w") as f:
        json.dump({"width": float(width)}, f)


def quantile_view_width(view_dir: str) -> float:
    """The bucket width this view was created with."""
    import json

    with open(os.path.join(view_dir, QVIEW_META_FILE)) as f:
        return float(json.load(f)["width"])


def _bucketize(value_col, width: float):
    return F.floor(value_col / F.lit(float(width))).cast("long")


def seed_quantile_view(
    spark: SparkSession,
    view_dir: str,
    snapshot: DataFrame,
    group_col: str,
    value_col,
    width: float,
    src_version: int | None = None,
) -> None:
    """Bootstrap the bucketized support from a full snapshot (NULL
    values are excluded — SQL percentile semantics)."""
    import shutil

    if not width > 0:
        raise ValueError(f"bucket width must be positive, got {width}")
    shutil.rmtree(view_dir, ignore_errors=True)
    sup = (
        snapshot.filter(value_col.isNotNull())
        .groupBy(
            F.col(group_col).alias("__g"),
            _bucketize(value_col, width).alias("__v"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("__mult"))
    )
    tmp = f"{view_dir}.tmp-{uuid.uuid4().hex[:8]}"
    sup.write.mode("overwrite").parquet(tmp)
    _write_marker(tmp, src_version)
    _write_qview_meta(tmp, width)
    crash_safe_swap(view_dir, tmp)


def update_quantile_view(
    spark: SparkSession,
    view_dir: str,
    cdf: DataFrame,
    group_col: str,
    value_col,
    src_version: int | None = None,
) -> None:
    """Fold one CDF slice: signed ±1 per (group, bucket); empty buckets
    leave. Additive — drive through
    :func:`sync_quantile_view_to_snapshot` for exactly-once."""
    width = quantile_view_width(view_dir)
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = (
        cdf.filter(value_col.isNotNull())
        .groupBy(
            F.col(group_col).alias("__dg"),
            _bucketize(value_col, width).alias("__dv"),
        )
        .agg(F.sum(sign).cast("long").alias("__d"))
        .filter(F.col("__d") != 0)
    )
    recover_swap(view_dir)
    base = spark.read.parquet(view_dir)
    merged = (
        base.join(
            delta,
            F.col("__g").eqNullSafe(F.col("__dg"))
            & (F.col("__v") == F.col("__dv")),
            "full_outer",
        )
        .select(
            F.coalesce("__g", "__dg").alias("__g"),
            F.coalesce("__v", "__dv").alias("__v"),
            (
                F.coalesce(F.col("__mult"), F.lit(0))
                + F.coalesce(F.col("__d"), F.lit(0))
            ).alias("__mult"),
        )
        .filter(F.col("__mult") > 0)
    )
    tmp = f"{view_dir}.tmp-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    _write_marker(tmp, src_version)
    _write_qview_meta(tmp, width)
    crash_safe_swap(view_dir, tmp)


def read_quantile_view(
    spark: SparkSession,
    view_dir: str,
    percents: list[int] = (50, 90, 99),
) -> DataFrame:
    """(group, pct, q_lo, n_rows): for each requested integer percent,
    the LOWER BOUND of the bucket containing the ceil(n*pct/100)-th
    value (1-indexed over the sorted multiset) — the true percentile
    lies in [q_lo, q_lo + width). Integer rank arithmetic throughout."""
    from pyspark.sql.window import Window

    width = quantile_view_width(view_dir)
    recover_swap(view_dir)
    sup = spark.read.parquet(view_dir)
    wg = Window.partitionBy("__g")
    cum = sup.withColumn(
        "__c", F.sum("__mult").over(wg.orderBy("__v"))
    ).withColumn("__n", F.sum("__mult").over(wg))
    pcts = spark.createDataFrame(
        [(int(p),) for p in percents], "pct long"
    )
    # = ceil(n*pct/100) via long `div` — PURE integer arithmetic, so
    # exactness never hinges on n*pct staying under 2^53 the way
    # floor(double /) silently would (r09, ADVICE)
    idx = F.expr("(__n * pct + 99) div 100")
    return (
        cum.crossJoin(F.broadcast(pcts))
        .filter(F.col("__c") >= idx)
        .groupBy("__g", "pct", "__n")
        .agg(F.min("__v").alias("__b"))
        .select(
            "__g",
            "pct",
            (F.col("__b") * F.lit(float(width))).alias("q_lo"),
            F.col("__n").alias("n_rows"),
        )
    )


def sync_quantile_view_to_snapshot(
    spark: SparkSession,
    table_dir: str,
    view_dir: str,
    group_col: str,
    value_col,
    width: float | None = None,
) -> int:
    """Exactly-once driver: seed on first call (``width`` required),
    then fold only the CDF since the cursored version. ``width`` is a
    creation-time parameter — a different value later raises (rebuild
    contract, same as the TOP-K view's k and the range index's bucket
    width)."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        read_partitioned_snapshot,
        read_snapshot_changes,
    )

    cur = versioned.latest_version(table_dir)
    if cur < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    recover_swap(view_dir)
    v0 = view_src_version(view_dir) if os.path.exists(view_dir) else None
    if v0 is None:
        if width is None:
            raise ValueError(
                "width is required when seeding a quantile view"
            )
        seed_quantile_view(
            spark,
            view_dir,
            _snapshot_or_empty(spark, table_dir, cur),
            group_col,
            value_col,
            width,
            src_version=cur,
        )
        return cur
    w0 = quantile_view_width(view_dir)
    if width is not None and float(width) != w0:
        raise ValueError(
            f"view was created with width={w0}; changing it is a rebuild"
        )
    if v0 >= cur:
        return v0
    update_quantile_view(
        spark,
        view_dir,
        read_snapshot_changes(spark, table_dir, v0, cur),
        group_col,
        value_col,
        src_version=cur,
    )
    return cur


# ---------------------------------------------------------------------------
# MERGE-backed COUNT/SUM view (r08): the swap-style views above rewrite
# the WHOLE view parquet per sync — O(groups), fine for dashboard-sized
# views, wrong for millions of groups. This variant stores the same
# (group, n_rows, total) state in an ordinary partitioned MERGE table
# keyed by a group surrogate, so one sync is O(|Δ| + changed groups'
# partitions): the slice's signed per-group deltas point-read their
# current rows (bounded key_in, semi-join fallback past 64 groups — the
# _jvmap_rows_for discipline), fold, and merge back; groups reaching
# zero rows tombstone.
#
# Exactly-once WITHOUT the atomic-swap trick: the additive fold is made
# convergent by a per-group ``__applied`` source-version witness. The
# view merge is atomic (manifest commit), so after a crash between the
# merge and the cursor write, the replayed slice finds every one of its
# groups already stamped ``__applied == cur`` and skips them — the fold
# can never double-count. (Group deletes replay as tombstones of absent
# keys — idempotent no-ops.)
#
# Because the view is a versioned MERGE table, it has an exact CDF of
# its own — aggregate views can feed further views (the N-level cascade
# the swap-style gold cannot anchor, having no manifests). NULL groups
# are legal: the merge key is a string surrogate ('n' prefix for NULL,
# 'v:<str>' otherwise); the real group value rides as payload.
# ---------------------------------------------------------------------------

GKEY = "__gkey"


def _group_surrogate(group_col):
    return F.when(
        group_col.isNull(), F.lit("n")
    ).otherwise(F.concat(F.lit("v:"), group_col.cast("string")))


def read_agg_merge_view(spark: SparkSession, view_dir: str) -> DataFrame:
    """(group, <n_col>, <sum_col>) — surrogate key and bookkeeping
    dropped; the aggregate column names are whatever the sync was
    created with."""
    from customer_segmentation_pyspark_spark.streaming.merge import (
        read_partitioned_snapshot,
    )

    return read_partitioned_snapshot(spark, view_dir).drop(
        GKEY, "__applied", "__seq", "__op"
    )


def _applied_high_water(spark: SparkSession, view_dir: str) -> int | None:
    """The highest ``__applied`` stamp any live view row carries —
    the witness of the last LANDED fold, independent of the cursor
    marker. Read from the manifest's per-partition column stats
    (driver-side, O(partitions)); the exact aggregate is the fallback
    for any stats gap. Returns None for a view with no committed
    manifest."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        read_partitioned_snapshot,
    )

    man = versioned.read_manifest(view_dir)
    if man is None:
        return None
    meta_v = (man.get("app_meta") or {}).get("src_version")
    if meta_v is not None:
        # authoritative: every fold commits its target source version
        # into its own manifest (atomically with the data), and row
        # stamps are greatest(old, that version) — the manifest stamp
        # can only be >= any surviving row's stamp. This is the ONLY
        # witness a pure-tombstone fold leaves (no positive row
        # survives to carry __applied), so it must win (r09, ADVICE).
        return int(meta_v)
    vals = []
    stats = man.get("stats", {})
    for pid in man.get("parts", {}):
        st = (stats.get(pid) or {}).get("__applied")
        if not st or st[1] is None:
            r = (
                read_partitioned_snapshot(spark, view_dir)
                .agg(F.max("__applied"))
                .first()[0]
            )
            return int(r) if r is not None else None
        vals.append(int(st[1]))
    return max(vals) if vals else None


def sync_agg_merge_view(
    spark: SparkSession,
    table_dir: str,
    view_dir: str,
    group_col: str,
    value_col,
    num_partitions: int = 32,
    point_read_max_groups: int = 64,
    n_col: str = "n_rows",
    sum_col: str = "total",
) -> int:
    """Bring the merge-backed COUNT/SUM view up to the source's latest
    version, folding only the CDF since the cursored version (seeding
    from the snapshot on first call). Returns the reflected version.
    NULL values count the row and add 0, same as the swap-style view."""
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
        read_snapshot_changes,
    )

    cur = versioned.latest_version(table_dir)
    if cur < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    v0 = view_src_version(view_dir) if os.path.isdir(view_dir) else None
    if v0 is not None:
        # crash healing: a landed fold whose cursor write was lost
        # leaves rows stamped ABOVE the marker. The per-group
        # __applied witness alone is not enough once the SOURCE has
        # advanced past the crashed slice (the retry would fold
        # (marker, cur2] and re-apply (marker, crashed] on top of the
        # landed state), so the effective cursor is the view's own
        # high-water stamp — and the marker is healed to it. A fold
        # that produced ONLY tombstones leaves no stamped row, so the
        # fold's target version is also committed as app_meta inside
        # the same view manifest (r09, ADVICE) — the high-water read
        # prefers that stamp and the heal covers every fold shape.
        hw = _applied_high_water(spark, view_dir)
        if hw is not None and hw > v0:
            v0 = hw
            _write_marker(view_dir, v0)
    if v0 is not None and v0 >= cur:
        return v0
    if v0 is None:
        try:
            snap = read_partitioned_snapshot(
                spark, table_dir, version=cur
            )
        except FileNotFoundError:
            # source committed but currently EMPTY (all rows deleted):
            # the view is trivially empty at cur — record the cursor;
            # the update path re-seeds once rows exist
            os.makedirs(view_dir, exist_ok=True)
            _write_marker(view_dir, cur)
            return cur
        g = F.col(group_col)
        agg_rows = snap.groupBy(g.alias(group_col)).agg(
            F.count(F.lit(1)).cast("long").alias(n_col),
            F.sum(F.coalesce(value_col, F.lit(0)))
            .cast("long")
            .alias(sum_col),
        )
        return _seed_agg_view_rows(
            spark, view_dir, agg_rows, group_col, cur,
            num_partitions=num_partitions, n_col=n_col, sum_col=sum_col,
        )

    if versioned.latest_version(view_dir) < 1:
        # a seed over a zero-row source wrote the cursor but the merge
        # committed nothing (no touched partitions -> no manifest) —
        # re-seed instead of reading a manifest-less dir (the r07
        # join-view None-manifest lesson, applied at birth)
        os.remove(os.path.join(view_dir, SRC_VERSION_FILE))
        return sync_agg_merge_view(
            spark, table_dir, view_dir, group_col, value_col,
            num_partitions=num_partitions,
            point_read_max_groups=point_read_max_groups,
            n_col=n_col, sum_col=sum_col,
        )
    cdf = read_snapshot_changes(spark, table_dir, v0, cur)
    value = F.coalesce(value_col, F.lit(0))
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = (
        cdf.groupBy(F.col(group_col).alias("__dg"))
        .agg(
            F.sum(sign).cast("long").alias("__d_n"),
            F.sum(sign * value).cast("long").alias("__d_sum"),
        )
        .filter((F.col("__d_n") != 0) | (F.col("__d_sum") != 0))
    )
    return _fold_agg_delta(
        spark,
        view_dir,
        delta,
        group_col,
        cur,
        point_read_max_groups=point_read_max_groups,
        n_col=n_col,
        sum_col=sum_col,
    )


def _seed_agg_view_rows(
    spark: SparkSession,
    view_dir: str,
    agg_rows: DataFrame,
    group_col: str,
    cur: int,
    num_partitions: int = 32,
    n_col: str = "n_rows",
    sum_col: str = "total",
) -> int:
    """Seed the merge-backed COUNT/SUM view from a PRE-AGGREGATED
    ``(group_col, n_col, sum_col)`` frame, stamped as reflecting
    source version ``cur``. Extracted from :func:`sync_agg_merge_view`
    (r10, VERDICT #3) so composed wave syncs can seed a view from a
    frame they already computed (e.g. the df view from the postings
    batch) instead of re-reading the table they just wrote."""
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
    )

    rows = agg_rows.select(
        _group_surrogate(F.col(group_col)).alias(GKEY),
        group_col,
        n_col,
        sum_col,
        F.lit(cur).cast("long").alias("__applied"),
        F.lit(0).cast("long").alias("__seq"),
        F.lit("U").alias("__op"),
    )
    merge_into_partitioned_snapshot(
        spark,
        view_dir,
        rows,
        key=GKEY,
        seq="__seq",
        num_partitions=num_partitions,
        delete_when="__op = 'D'",
        marker_cols=("__op",),
        app_meta={"src_version": int(cur)},
        # pre-aggregated: one row per group surrogate by construction
        assume_unique_keys=True,
    )
    os.makedirs(view_dir, exist_ok=True)
    _write_marker(view_dir, cur)
    return cur


def _fold_agg_delta(
    spark: SparkSession,
    view_dir: str,
    delta: DataFrame,
    group_col: str,
    cur: int,
    point_read_max_groups: int = 64,
    n_col: str = "n_rows",
    sum_col: str = "total",
) -> int:
    """Fold one pre-aggregated signed delta — ``(__dg, __d_n,
    __d_sum)``, nonzero rows only — into the merge-backed COUNT/SUM
    view and stamp it as reflecting source version ``cur``. Extracted
    from :func:`sync_agg_merge_view` (r10, VERDICT #3) so composed
    wave syncs can hand a delta computed from a SHARED upstream CDF
    slice straight to the fold, skipping the intermediate table's own
    CDF diff; the replay guard, bounded point-read, and app_meta
    crash witness are identical either way."""
    from customer_segmentation_pyspark_spark.streaming.merge import (
        merge_into_partitioned_snapshot,
        read_partitioned_snapshot,
    )

    delta = delta.withColumn("__dkey", _group_surrogate(F.col("__dg")))
    # bounded-delta fast path (r10, guide §1.2): a wave's group delta is
    # usually a handful of rows — collect it ONCE (the same single
    # execution the old localCheckpoint paid) and rebuild it as a
    # literal LocalRelation, so no checkpoint job runs, the key list is
    # free, and the fold join gets a known-tiny broadcastable side.
    # Past the cap, fall back to the checkpoint (never a wave-sized
    # driver list — the _jvmap_rows_for discipline).
    head = delta.limit(point_read_max_groups + 1).collect()
    if not head:
        _write_marker(view_dir, cur)
        return cur
    if len(head) <= point_read_max_groups:
        delta = spark.createDataFrame(head, delta.schema)
        keys = [r["__dkey"] for r in head]
    else:
        delta = delta.localCheckpoint(eager=True)  # reused: fold below
        keys = head  # only the length matters past the cap
    if len(keys) <= point_read_max_groups:
        current = read_partitioned_snapshot(spark, view_dir, key_in=keys)
    else:
        # wave-sized group set: never build a driver IN-list — read the
        # view and semi-join (the _jvmap_rows_for discipline)
        current = read_partitioned_snapshot(spark, view_dir).join(
            delta.select(F.col("__dkey").alias(GKEY)), GKEY, "leftsemi"
        )
    j = current.join(
        delta, F.col(GKEY) == F.col("__dkey"), "full_outer"
    )
    # replay guard: a group already stamped at this source version took
    # its fold in the crashed run's landed merge — skip it
    replayed = F.col("__applied").isNotNull() & (
        F.col("__applied") >= F.lit(cur)
    )
    n_new = F.when(replayed, F.col(n_col)).otherwise(
        F.coalesce(F.col(n_col), F.lit(0))
        + F.coalesce(F.col("__d_n"), F.lit(0))
    )
    t_new = F.when(replayed, F.col(sum_col)).otherwise(
        F.coalesce(F.col(sum_col), F.lit(0))
        + F.coalesce(F.col("__d_sum"), F.lit(0))
    )
    out = j.select(
        F.coalesce(F.col(GKEY), F.col("__dkey")).alias(GKEY),
        F.coalesce(F.col(group_col), F.col("__dg")).alias(group_col),
        n_new.alias(n_col),
        t_new.alias(sum_col),
        F.greatest(
            F.coalesce(F.col("__applied"), F.lit(0)), F.lit(cur)
        ).cast("long").alias("__applied"),
        F.lit(1).cast("long").alias("__seq"),
        F.when(n_new <= 0, F.lit("D")).otherwise(F.lit("U")).alias("__op"),
    )
    merge_into_partitioned_snapshot(
        spark,
        view_dir,
        out,
        key=GKEY,
        seq="__seq",
        delete_when="__op = 'D'",
        marker_cols=("__op",),
        app_meta={"src_version": int(cur)},
        # full-outer of two per-group frames: one row per group key
        assume_unique_keys=True,
    )
    _write_marker(view_dir, cur)
    return cur
