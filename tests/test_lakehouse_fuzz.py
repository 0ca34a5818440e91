"""Seeded random-walk fuzz over the whole lakehouse op set: interleave
CoW merges, MoR appends, delete waves, schema evolution, type
widening, fold-back compaction, file compaction, clustering,
partition evolution, RESTORE rollbacks, and shallow CLONEs (the walk
SWITCHES to the clone, so later ops run against foreign part refs) in
random order, checking the table against a plain Python dict model
after EVERY step — the cross-feature interactions (a delete wave
landing on a logged partition, widening mid-log, repartition over
pending deltas, restore across an evolution, MoR append into a
clone, ...) that no single-purpose test walks."""

from __future__ import annotations

import copy
import random

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from customer_segmentation_pyspark_spark.sources import versioned
from customer_segmentation_pyspark_spark.streaming.merge import (
    cluster_partitioned_snapshot,
    compact_mor_partitions,
    compact_partitioned_snapshot,
    merge_into_partitioned_snapshot,
    merge_mor_into_partitioned_snapshot,
    read_partitioned_snapshot,
    read_snapshot_changes,
    repartition_snapshot,
)

BASE_SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("val", IntegerType()),
        StructField("tag", StringType()),
        StructField("seq", LongType()),
        StructField("op", StringType()),
    ]
)
# the widening / evolving variant: val int->long widened, extra added
EVO_SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("val", LongType()),
        StructField("tag", StringType()),
        StructField("extra", DoubleType()),
        StructField("seq", LongType()),
        StructField("op", StringType()),
    ]
)

KEYS = list(range(1, 61))


class Model:
    """Per-key dict of column dicts with the merge's coalesce rule —
    or, for ``replace=True`` waves (UPDATE SET * semantics, r06), row
    replacement of every column the wave carries, explicit NULLs
    included."""

    def __init__(self):
        self.rows: dict[int, dict] = {}

    def apply(self, wave, replace=False):
        latest: dict[int, tuple] = {}
        for row in wave:
            k, seq = row["k"], row["seq"]
            if k not in latest or seq > latest[k][0]:
                latest[k] = (seq, row)
        for k, (_seq, row) in latest.items():
            if row["op"] == "D":
                self.rows.pop(k, None)
                continue
            cur = self.rows.get(k, {})
            nxt = dict(cur)
            for c, v in row.items():
                if c in ("op", "seq") or c == "k":
                    continue
                if replace:
                    nxt[c] = v
                elif v is not None or c not in cur:
                    nxt[c] = v if v is not None else cur.get(c)
            nxt.setdefault("extra", None)
            self.rows[k] = nxt

    def expected(self):
        return {
            k: (r.get("val"), r.get("tag"), r.get("extra"))
            for k, r in self.rows.items()
        }


def _table_state(spark, table):
    df = read_partitioned_snapshot(spark, table)
    if "extra" not in df.columns:
        df = df.withColumn("extra", F.lit(None).cast("double"))
    return {
        r["k"]: (r["val"], r["tag"], r["extra"]) for r in df.collect()
    }


def _random_wave(rng, seq, evolved):
    n = rng.randint(1, 12)
    wave = []
    for _ in range(n):
        k = rng.choice(KEYS)
        op = "D" if rng.random() < 0.25 else "U"
        row = {
            "k": k,
            "val": rng.randint(-5, 5) * (10**10 if evolved and rng.random() < 0.3 else 1),
            "tag": rng.choice(["x", "y", None]),
            "seq": seq,
            "op": op,
        }
        if evolved:
            row["extra"] = rng.choice([1.5, -2.0, None])
        wave.append(row)
    return wave


def _wave_df(spark, wave, evolved):
    sch = EVO_SCHEMA if evolved else BASE_SCHEMA
    rows = [tuple(w.get(f.name) for f in sch.fields) for w in wave]
    return spark.createDataFrame(rows, sch)


#: cumulative roll thresholds: cow, mor, compact_mor, compact, cluster,
#: repartition, restore, clone (else: evolve schema)
DEFAULT_WEIGHTS = (0.30, 0.60, 0.68, 0.73, 0.77, 0.82, 0.88, 0.93)
#: the restore/clone-heavy mix — those two ops fire every few steps
ROLLBACK_WEIGHTS = (0.20, 0.40, 0.45, 0.50, 0.54, 0.58, 0.82, 0.95)


def _run_walk(spark, tmp_path, seed, n_ops, weights=DEFAULT_WEIGHTS):
    rng = random.Random(seed)
    table = str(tmp_path / f"t{seed}")
    model = Model()
    seq = 0
    evolved = False
    # seed the table
    wave = [
        {"k": k, "val": k, "tag": "x", "seq": 0, "op": "U"}
        for k in rng.sample(KEYS, 30)
    ]
    merge_into_partitioned_snapshot(
        spark, table, _wave_df(spark, wave, False), "k", "seq",
        num_partitions=4, delete_when="op = 'D'", marker_cols=("op",),
    )
    model.apply(wave)
    prev_version = versioned.latest_version(table)
    prev_state = _table_state(spark, table)
    # model.rows as of each committed version, for RESTORE targets
    snapshots = {prev_version: copy.deepcopy(model.rows)}
    clones = 0
    w_cow, w_mor, w_cmor, w_comp, w_clus, w_rep, w_rest, w_clone = weights
    fired: set[str] = set()
    for step in range(n_ops):
        seq += 1
        roll = rng.random()
        if roll < w_cow:
            wave = _random_wave(rng, seq, evolved)
            # ~30% of CoW merges use UPDATE SET * semantics (r06):
            # carried columns replace outright, NULLs included
            rep = rng.random() < 0.3
            merge_into_partitioned_snapshot(
                spark, table, _wave_df(spark, wave, evolved), "k", "seq",
                delete_when="op = 'D'", marker_cols=("op",),
                update_set_all=rep,
            )
            model.apply(wave, replace=rep)
        elif roll < w_mor:
            wave = _random_wave(rng, seq, evolved)
            merge_mor_into_partitioned_snapshot(
                spark, table, _wave_df(spark, wave, evolved), "k", "seq",
                delete_when="op = 'D'", marker_cols=("op",),
            )
            model.apply(wave)
        elif roll < w_cmor:
            compact_mor_partitions(spark, table)
        elif roll < w_comp:
            compact_partitioned_snapshot(spark, table, target_files=1)
        elif roll < w_clus:
            cluster_partitioned_snapshot(spark, table, ["k"])
        elif roll < w_rep:
            repartition_snapshot(
                spark, table, rng.choice([2, 4, 8])
            )
        elif roll < w_rest and len(snapshots) >= 2:
            # RESTORE to a random earlier version (may cross evolutions,
            # pending MoR logs, repartitions); the model rolls back too
            fired.add("restore")
            target = rng.choice(sorted(snapshots)[:-1])
            versioned.restore_snapshot(table, target)
            model.rows = copy.deepcopy(snapshots[target])
        elif roll < w_clone and clones < 2:
            # shallow CLONE, then SWITCH the walk to the clone: every
            # later op runs against a table whose untouched partitions
            # are foreign relative refs into the old table dir
            fired.add("clone")
            clones += 1
            dst = str(tmp_path / f"t{seed}c{clones}")
            versioned.clone_snapshot(table, dst)
            table = dst
            prev_version = versioned.latest_version(table)
            snapshots = {prev_version: copy.deepcopy(model.rows)}
        else:
            evolved = True  # next waves carry the widened/evolved schema
        got = _table_state(spark, table)
        exp = model.expected()
        assert got == exp, (
            f"seed {seed} step {step} divergence: "
            f"only-table={set(got) - set(exp)} only-model={set(exp) - set(got)} "
            f"diff={[k for k in set(got) & set(exp) if got[k] != exp[k]][:5]}"
        )
        # CDF transition invariant: prev state + change feed == new
        # state, across EVERY op kind (exercises the append-only fast
        # path, the generic diff, and fold/rewrite no-change cases)
        cur_version = versioned.latest_version(table)
        if cur_version > prev_version:
            replayed = dict(prev_state)
            for r in read_snapshot_changes(
                spark, table, prev_version, cur_version
            ).collect():
                d = r.asDict()
                if d["_change_type"] == "delete":
                    replayed.pop(d["k"], None)
                elif d["_change_type"] in ("insert", "update_postimage"):
                    replayed[d["k"]] = (
                        d.get("val"), d.get("tag"), d.get("extra")
                    )
            assert replayed == got, (
                f"seed {seed} step {step} CDF transition "
                f"{prev_version}->{cur_version} diverged: "
                f"{[k for k in set(replayed) | set(got) if replayed.get(k) != got.get(k)][:5]}"
            )
        prev_version, prev_state = cur_version, got
        snapshots[cur_version] = copy.deepcopy(model.rows)
    # final invariants: metadata count (fold first) and history sanity
    compact_mor_partitions(spark, table)
    assert versioned.snapshot_row_count(table) == len(model.rows)
    hist = versioned.table_history(table)
    assert hist and hist[-1]["version"] == versioned.latest_version(table)
    return fired


def test_lakehouse_random_walk_seed1(spark, tmp_path):
    _run_walk(spark, tmp_path, seed=1, n_ops=14)


def test_lakehouse_random_walk_seed2(spark, tmp_path):
    _run_walk(spark, tmp_path, seed=2, n_ops=14)


def test_lakehouse_random_walk_seed3(spark, tmp_path):
    _run_walk(spark, tmp_path, seed=3, n_ops=14)


def test_lakehouse_random_walk_rollback_heavy(spark, tmp_path):
    """The restore/clone-weighted mix, with coverage asserted so the walk
    can't silently stop exercising the rollback ops."""
    fired = _run_walk(
        spark, tmp_path, seed=8, n_ops=14, weights=ROLLBACK_WEIGHTS
    )
    assert fired >= {"restore", "clone"}, f"walk only fired {fired}"
