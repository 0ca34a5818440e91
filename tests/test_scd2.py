"""SCD2 dimension history (r07, capstone #13): incremental
temporal-validity maintenance from the CDF vs a full gaps-and-islands
recompute over the dim's own time-travel states, exactly-once replay,
as-of join semantics, and a seeded fuzz interleaving."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from customer_segmentation_pyspark_spark.sources import versioned
from customer_segmentation_pyspark_spark.streaming.merge import (
    merge_into_partitioned_snapshot,
    read_partitioned_snapshot,
)
from customer_segmentation_pyspark_spark.streaming.scd import (
    read_scd2_history,
    scd2_asof_join,
    sync_scd2_history,
)


def _dim_wave(spark, rows):
    return spark.createDataFrame(
        rows, "ck long, attr string, bal double, dseq long, dop string"
    )


def _merge_dim(spark, dim_dir, rows):
    merge_into_partitioned_snapshot(
        spark, dim_dir, _dim_wave(spark, rows), key="ck", seq="dseq",
        num_partitions=4, delete_when="dop = 'D'", marker_cols=("dop",),
    )


def _reference_history(spark, dim_dir):
    """Driver-side gaps-and-islands recompute over every committed dim
    version (time travel is the ground truth the increments must
    match)."""
    latest = versioned.latest_version(dim_dir)
    states = {}
    for v in range(1, latest + 1):
        try:
            rows = read_partitioned_snapshot(
                spark, dim_dir, version=v
            ).collect()
        except FileNotFoundError:  # fully-emptied version
            rows = []
        states[v] = {r["ck"]: (r["attr"], r["bal"]) for r in rows}
    hist = set()
    keys = {k for s in states.values() for k in s}
    for k in sorted(keys):
        start, content = None, None
        for v in range(1, latest + 1):
            now = states[v].get(k)
            if now != content:
                if content is not None:
                    hist.add((k, *content, start, v))
                start, content = v, now
        if content is not None:
            hist.add((k, *content, start, None))
    return hist


def _got_history(spark, hist_dir):
    return {
        (r["ck"], r["attr"], r["bal"], r["valid_from"], r["valid_to"])
        for r in read_scd2_history(spark, hist_dir).collect()
    }


def test_scd2_history_equals_time_travel_recompute(spark, tmp_path):
    dim = str(tmp_path / "dim")
    hist = str(tmp_path / "hist")
    # v1: seed 6 keys
    _merge_dim(spark, dim, [(k, f"a{k}", float(k), 0, "U")
                            for k in range(6)])
    sync_scd2_history(spark, dim, hist, num_partitions=4)
    # v2: update 0/2, delete 4
    _merge_dim(spark, dim, [
        (0, "a0-v2", 100.0, 1, "U"),
        (2, "a2-v2", 102.0, 1, "U"),
        (4, "a4", 4.0, 1, "D"),
    ])
    sync_scd2_history(spark, dim, hist)
    # v3: re-insert 4, update 0 again, delete 1
    _merge_dim(spark, dim, [
        (4, "a4-back", 204.0, 2, "U"),
        (0, "a0-v3", 300.0, 2, "U"),
        (1, "a1", 1.0, 2, "D"),
    ])
    sync_scd2_history(spark, dim, hist)
    assert _got_history(spark, hist) == _reference_history(spark, dim)
    # key 0 has three stacked intervals, key 4 a gap then a reopen
    got = _got_history(spark, hist)
    assert {t[3:] for t in got if t[0] == 0} == {(1, 2), (2, 3), (3, None)}
    assert {t[3:] for t in got if t[0] == 4} == {(1, 2), (3, None)}
    assert {t[3:] for t in got if t[0] == 1} == {(1, 3)}


def test_scd2_sync_exactly_once_replay(spark, tmp_path):
    """A crash between the history merge and the cursor marker replays
    the same CDF slice — the apply must converge (no duplicated or
    degenerate intervals)."""
    import os

    from customer_segmentation_pyspark_spark.streaming.views import (
        SRC_VERSION_FILE,
    )

    dim = str(tmp_path / "dim")
    hist = str(tmp_path / "hist")
    _merge_dim(spark, dim, [(k, f"a{k}", float(k), 0, "U")
                            for k in range(4)])
    sync_scd2_history(spark, dim, hist, num_partitions=4)
    _merge_dim(spark, dim, [(0, "a0-v2", 9.0, 1, "U"),
                            (1, "a1", 1.0, 1, "D")])
    sync_scd2_history(spark, dim, hist)
    want = _got_history(spark, hist)
    # simulated crash between the merge and the marker write: the
    # marker still holds the PREVIOUS cursor, so the retry re-folds
    # the same v1->v2 slice onto the already-merged history
    with open(os.path.join(hist, SRC_VERSION_FILE), "w") as f:
        f.write("1")
    sync_scd2_history(spark, dim, hist)  # replays the v1->v2 slice
    assert _got_history(spark, hist) == want


def test_scd2_dim_backfill_wave_exact_and_off_driver(spark, tmp_path):
    """A dim-backfill wave (every key rewritten at once) is O(dim)
    changed keys: past the 64-key cap the sync must read open rows via
    the valid_to-IS-NULL semi-join, never a wave-sized driver IN-list
    (r09, VERDICT #3). Spy on collect() through the backfill sync and
    pin the result against the time-travel recompute."""
    from customer_segmentation_pyspark_spark.streaming.scd import (
        _SCD2_POINT_READ_MAX,
    )

    dim = str(tmp_path / "dim")
    hist = str(tmp_path / "hist")
    n = _SCD2_POINT_READ_MAX + 36  # comfortably past the cap
    kw = dict(num_partitions=4, tracked_cols=["attr", "bal"])
    _merge_dim(spark, dim, [(k, f"a{k}", float(k), 0, "U")
                            for k in range(n)])
    sync_scd2_history(spark, dim, hist, **kw)
    # the backfill: every key's attr rewritten in one wave, plus a few
    # no-op rewrites (same tracked values, only dseq moves) mixed in to
    # keep the suppression path under the large-wave read
    _merge_dim(
        spark, dim,
        [(k, f"a{k}" if k % 10 == 0 else f"b{k}", float(k), 1, "U")
         for k in range(n)],
    )

    from pyspark.sql.classic.dataframe import DataFrame as _DF

    sizes = []
    orig = _DF.collect

    def spy(self):
        out = orig(self)
        sizes.append(len(out))
        return out

    import pytest as _pytest

    mp = _pytest.MonkeyPatch()
    mp.setattr(_DF, "collect", spy)
    try:
        sync_scd2_history(spark, dim, hist, **kw)
    finally:
        mp.undo()
    assert sizes, "sync made no collects — spy misses the path"
    assert max(sizes) <= _SCD2_POINT_READ_MAX + 1, (
        f"a collect returned {max(sizes)} rows during an {n}-key "
        f"backfill wave: {sorted(sizes, reverse=True)[:5]}"
    )
    assert _got_history(spark, hist) == _reference_history(spark, dim)


def test_scd2_asof_join_picks_version_in_effect(spark, tmp_path):
    dim = str(tmp_path / "dim")
    hist = str(tmp_path / "hist")
    _merge_dim(spark, dim, [(1, "old", 1.0, 0, "U"),
                            (2, "gone", 2.0, 0, "U")])
    sync_scd2_history(spark, dim, hist, num_partitions=4)
    _merge_dim(spark, dim, [(1, "new", 10.0, 1, "U"),
                            (2, "gone", 2.0, 1, "D")])
    sync_scd2_history(spark, dim, hist)
    facts = spark.createDataFrame(
        [(100, 1, 1), (101, 1, 2), (102, 2, 1), (103, 2, 2)],
        "fid long, ck long, v long",
    )
    got = {
        (r["fid"], r["attr"])
        for r in scd2_asof_join(
            facts, read_scd2_history(spark, hist), "ck", "v"
        ).collect()
    }
    assert got == {
        (100, "old"),   # v1 sees the original
        (101, "new"),   # v2 sees the update
        (102, "gone"),  # v1 sees the soon-deleted row
        (103, None),    # v2: key deleted, LEFT join nulls
    }
    # every fact matched at most one interval
    j = scd2_asof_join(facts, read_scd2_history(spark, hist), "ck", "v")
    assert j.count() == facts.count()


@pytest.mark.parametrize("seed", [5, 17])
def test_scd2_fuzzed_interleaving(spark, tmp_path, seed):
    """Seeded random interleaving of dim waves (update/delete/insert)
    and syncs — syncing after EVERY wave so version granularity matches
    the time-travel recompute."""
    rng = random.Random(seed)
    dim = str(tmp_path / "dim")
    hist = str(tmp_path / "hist")
    _merge_dim(spark, dim, [(k, f"a{k}", float(k), 0, "U")
                            for k in range(10)])
    sync_scd2_history(spark, dim, hist, num_partitions=4)
    for step in range(1, 9):
        rows = []
        for _ in range(rng.randint(1, 4)):
            k = rng.randrange(14)
            if rng.random() < 0.25:
                rows.append((k, f"x{k}", 0.0, step, "D"))
            else:
                rows.append(
                    (k, f"a{k}s{step}", float(rng.randint(0, 99)),
                     step, "U")
                )
        _merge_dim(spark, dim, rows)
        sync_scd2_history(spark, dim, hist)
    assert _got_history(spark, hist) == _reference_history(spark, dim)


def test_scd2_tracked_cols_suppress_noop_close_reopen(spark, tmp_path):
    """r08 (ADVICE): the dim's merge SEQ column is bookkeeping — a wave
    that advances dseq but lands IDENTICAL tracked values (the
    acctbal = -200.00 coincidence: orig+100 == orig*0.5) must not
    close and reopen the interval, because any recompute/island oracle
    over the tracked attrs keeps it whole."""
    dim = str(tmp_path / "dim")
    hist = str(tmp_path / "hist")
    kw = dict(num_partitions=4, tracked_cols=["attr", "bal"])
    _merge_dim(spark, dim, [(0, "a0", -200.0, 0, "U"),
                            (1, "a1", 1.0, 0, "U"),
                            (2, "a2", 2.0, 0, "U")])
    sync_scd2_history(spark, dim, hist, **kw)
    # key 0: identical tracked values, new dseq (the no-op upsert);
    # key 1: a real change; key 2: a delete
    _merge_dim(spark, dim, [(0, "a0", -200.0, 1, "U"),
                            (1, "a1-v2", 9.0, 1, "U"),
                            (2, "a2", 2.0, 1, "D")])
    sync_scd2_history(spark, dim, hist, **kw)
    got = _got_history(spark, hist)
    assert got == _reference_history(spark, dim)
    # key 0's interval stayed whole and OPEN from v1
    assert {t[3:] for t in got if t[0] == 0} == {(1, None)}
    # key 1 split; key 2 closed without a reopen
    assert {t[3:] for t in got if t[0] == 1} == {(1, 2), (2, None)}
    assert {t[3:] for t in got if t[0] == 2} == {(1, 2)}
    # a later REAL change to key 0 still closes the original interval
    _merge_dim(spark, dim, [(0, "a0-v3", 7.0, 2, "U")])
    sync_scd2_history(spark, dim, hist, **kw)
    got = _got_history(spark, hist)
    assert got == _reference_history(spark, dim)
    assert {t[3:] for t in got if t[0] == 0} == {(1, 3), (3, None)}


def test_scd2_suppression_replay_converges(spark, tmp_path):
    """A crash-replay of a slice containing a suppressed no-op upsert
    must converge to the same history (the suppression re-derives the
    same way; nothing double-applies)."""
    import os

    from customer_segmentation_pyspark_spark.streaming.views import (
        SRC_VERSION_FILE,
    )

    dim = str(tmp_path / "dim")
    hist = str(tmp_path / "hist")
    kw = dict(num_partitions=4, tracked_cols=["attr", "bal"])
    _merge_dim(spark, dim, [(0, "a0", -200.0, 0, "U"),
                            (1, "a1", 1.0, 0, "U")])
    sync_scd2_history(spark, dim, hist, **kw)
    _merge_dim(spark, dim, [(0, "a0", -200.0, 1, "U"),
                            (1, "a1-v2", 9.0, 1, "U")])
    sync_scd2_history(spark, dim, hist, **kw)
    want = _got_history(spark, hist)
    with open(os.path.join(hist, SRC_VERSION_FILE), "w") as f:
        f.write("1")
    sync_scd2_history(spark, dim, hist, **kw)  # replay the v1->v2 slice
    assert _got_history(spark, hist) == want
    assert want == _reference_history(spark, dim)


def _merge_fact(spark, fact_dir, rows):
    merge_into_partitioned_snapshot(
        spark, fact_dir,
        spark.createDataFrame(
            rows, "fk long, ck long, amt double, v long, seq long, "
                  "op string"
        ),
        key="fk", seq="seq", num_partitions=4,
        delete_when="op = 'D'", marker_cols=("op",),
    )


@pytest.mark.parametrize("seed", [7, 19])
def test_scd2_enriched_view_fuzzed_vs_recompute(spark, tmp_path, seed):
    """r08 (capstone #14): after a seeded random interleaving of dim
    waves, fact waves (with as-of stamps <= the dim version in effect
    at write time), and view syncs, the incrementally maintained
    enriched view equals the full recompute — final live facts as-of
    joined to the final history. The incremental path never re-enriches
    on dim waves (as-of attribution is stable), so any divergence here
    means the stability argument is wrong."""
    from customer_segmentation_pyspark_spark.streaming.scd import (
        sync_scd2_enriched_view,
    )

    rng = random.Random(seed)
    dim_dir = str(tmp_path / "dim")
    fact_dir = str(tmp_path / "fact")
    hist_dir = str(tmp_path / "hist")
    view_dir = str(tmp_path / "view")

    _merge_dim(spark, dim_dir,
               [(k, f"a{k}", float(k), 0, "U") for k in range(8)])
    _merge_fact(spark, fact_dir,
                [(f, f % 8, float(f), 1, 0, "U") for f in range(30)])
    sync_scd2_enriched_view(
        spark, fact_dir, dim_dir, hist_dir, view_dir, "v",
        num_partitions=4, tracked_cols=["attr", "bal"],
    )

    seq = 0
    for _ in range(14):
        seq += 1
        roll = rng.random()
        if roll < 0.35:  # dim wave: attr changes, deletes, reinserts
            rows = []
            for _ in range(rng.randint(1, 3)):
                k = rng.randrange(10)
                op = "D" if rng.random() < 0.25 else "U"
                rows.append((k, f"a{k}s{seq}", float(seq), seq, op))
            _merge_dim(spark, dim_dir, rows)
        elif roll < 0.7:  # fact wave: stamps <= current dim version
            dv = versioned.latest_version(dim_dir)
            rows = []
            for _ in range(rng.randint(1, 5)):
                f = rng.randrange(40)
                op = "D" if rng.random() < 0.2 else "U"
                rows.append(
                    (f, rng.randrange(10), float(rng.randint(0, 99)),
                     rng.randint(1, dv), seq, op)
                )
            _merge_fact(spark, fact_dir, rows)
        else:
            sync_scd2_enriched_view(
                spark, fact_dir, dim_dir, hist_dir, view_dir, "v",
                num_partitions=4, tracked_cols=["attr", "bal"],
            )
    sync_scd2_enriched_view(
        spark, fact_dir, dim_dir, hist_dir, view_dir, "v",
        num_partitions=4, tracked_cols=["attr", "bal"],
    )

    cols = ["fk", "ck", "amt", "v", "attr", "bal", "valid_from"]
    got = sorted(
        tuple(r)
        for r in read_partitioned_snapshot(spark, view_dir)
        .select(*cols).collect()
    )
    facts = read_partitioned_snapshot(spark, fact_dir)
    hist = read_scd2_history(spark, hist_dir)
    want = sorted(
        tuple(r)
        for r in scd2_asof_join(facts, hist, "ck", "v")
        .select(*cols).collect()
    )
    assert got == want


def test_scd2_enriched_view_cursors_and_stamp_contract(spark, tmp_path):
    """Exactly-once on both CDFs: a replayed sync no-ops on the fact
    cursor while the dim cursor (the history's own marker) advances
    independently; dim-only waves change the HISTORY but commit nothing
    to the view; a fact stamped beyond the dim version raises."""
    from customer_segmentation_pyspark_spark.streaming.scd import (
        sync_scd2_enriched_view,
    )

    dim_dir = str(tmp_path / "dim")
    fact_dir = str(tmp_path / "fact")
    hist_dir = str(tmp_path / "hist")
    view_dir = str(tmp_path / "view")
    _merge_dim(spark, dim_dir,
               [(k, f"a{k}", float(k), 0, "U") for k in range(4)])
    _merge_fact(spark, fact_dir, [(f, f % 4, 1.0, 1, 0, "U")
                                  for f in range(12)])
    assert sync_scd2_enriched_view(
        spark, fact_dir, dim_dir, hist_dir, view_dir, "v",
        num_partitions=4, tracked_cols=["attr", "bal"],
    ) == (1, 1)
    v_view = versioned.latest_version(view_dir)
    # replay: fact-current no-op (view table untouched)
    assert sync_scd2_enriched_view(
        spark, fact_dir, dim_dir, hist_dir, view_dir, "v",
        num_partitions=4, tracked_cols=["attr", "bal"],
    ) == (1, 1)
    assert versioned.latest_version(view_dir) == v_view
    # dim-only wave: history advances, view commits NOTHING — and the
    # already-enriched rows keep their stamped attribution (stability)
    _merge_dim(spark, dim_dir, [(0, "a0-v2", 99.0, 1, "U")])
    assert sync_scd2_enriched_view(
        spark, fact_dir, dim_dir, hist_dir, view_dir, "v",
        num_partitions=4, tracked_cols=["attr", "bal"],
    ) == (1, 2)
    assert versioned.latest_version(view_dir) == v_view
    got = {
        (r["fk"], r["attr"])
        for r in read_partitioned_snapshot(spark, view_dir)
        .filter(F.col("ck") == 0).collect()
    }
    assert got == {(f, "a0") for f in range(12) if f % 4 == 0}
    # a fact stamped at v=3 when the dim is only at v=2 must refuse
    _merge_fact(spark, fact_dir, [(100, 0, 5.0, 3, 1, "U")])
    with pytest.raises(ValueError, match="stamp"):
        sync_scd2_enriched_view(
            spark, fact_dir, dim_dir, hist_dir, view_dir, "v",
            num_partitions=4, tracked_cols=["attr", "bal"],
        )
    # once the dim reaches v=3 the same fold succeeds and enriches
    # the pending row against the interval in effect at 3
    _merge_dim(spark, dim_dir, [(1, "a1-v3", 7.0, 2, "U")])
    fa, h = sync_scd2_enriched_view(
        spark, fact_dir, dim_dir, hist_dir, view_dir, "v",
        num_partitions=4, tracked_cols=["attr", "bal"],
    )
    assert (fa, h) == (2, 3)
    row = read_partitioned_snapshot(spark, view_dir).filter(
        F.col("fk") == 100
    ).collect()[0]
    assert row["attr"] == "a0-v2" and row["v"] == 3


def test_scd2_batch_hkeys_disjoint_under_debug_guard(
    spark, tmp_path, monkeypatch
):
    """r10 ADVICE: assume_unique_keys on the SCD2 history batch relies
    on reopens and retires being key-disjoint (both map to 'key:open').
    read_snapshot_changes emits at most one change type per key today;
    run full close/reopen/retire waves under SPARK_GRAFT_MERGE_DEBUG=1
    so the merge's exact duplicate-hkey probe fails loudly if a future
    CDF change ever emits both for one key."""
    monkeypatch.setenv("SPARK_GRAFT_MERGE_DEBUG", "1")
    dim = str(tmp_path / "dim")
    hist = str(tmp_path / "hist")
    _merge_dim(spark, dim, [(k, f"a{k}", float(k), 0, "U")
                            for k in range(6)])
    sync_scd2_history(spark, dim, hist, num_partitions=4)
    # one wave mixing updates (close+reopen), a delete (close+retire),
    # and an insert (reopen only)
    _merge_dim(spark, dim, [
        (0, "a0-v2", 100.0, 1, "U"),
        (2, "a2-v2", 102.0, 1, "U"),
        (4, "a4", 4.0, 1, "D"),
        (9, "a9", 9.0, 1, "U"),
    ])
    sync_scd2_history(spark, dim, hist)
    # delete-then-reinsert across waves (gap + reopen at the same hkey)
    _merge_dim(spark, dim, [(4, "a4-back", 204.0, 2, "U"),
                            (9, "a9", 9.0, 2, "D")])
    sync_scd2_history(spark, dim, hist)
    assert _got_history(spark, hist) == _reference_history(spark, dim)
