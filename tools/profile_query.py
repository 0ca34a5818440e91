#!/usr/bin/env python
"""Phase profiler for a headline query (guide §1: measure first).

Wraps the lakehouse primitives (merge, manifest commit, footer stats,
CDF read, view folds) with wall-clock timers, runs ONE registry query
end-to-end with the bench's noop sink, and prints a per-primitive cost
table. Diagnostic only — never writes BENCH artifacts.

Usage:
    python tools/profile_query.py <query> [sf_dir] [--trials N]
"""

from __future__ import annotations

import os
import sys
import threading
import time
from collections import defaultdict

_COUNTS: dict[str, int] = defaultdict(int)
_TOTALS: dict[str, float] = defaultdict(float)
_LOCK = threading.Lock()


def _timed(tag, fn):
    def wrap(*a, **kw):
        t0 = time.perf_counter()
        try:
            return fn(*a, **kw)
        finally:
            dt = time.perf_counter() - t0
            with _LOCK:
                _COUNTS[tag] += 1
                _TOTALS[tag] += dt

    return wrap


def _install_action_timers() -> None:
    """Time every Spark action (collect / writer.parquet / writer.save /
    localCheckpoint / first / count) attributed to the nearest repo
    call-site, so the per-primitive totals can be split into the actual
    Spark jobs they launch."""
    import traceback

    from pyspark.sql import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter

    def _site() -> str:
        for fr in reversed(traceback.extract_stack()[:-2]):
            fn = fr.filename
            if "customer_segmentation_pyspark_spark" in fn:
                short = fn.split("customer_segmentation_pyspark_spark/")[-1]
                return f"{short}:{fr.lineno}"
        return "<driver>"

    plan_dump = os.environ.get("PROFILE_PLAN_DUMP")  # dir for write plans

    def timed_method(cls, meth):
        orig = getattr(cls, meth)

        def wrap(self, *a, **kw):
            t0 = time.perf_counter()
            try:
                return orig(self, *a, **kw)
            finally:
                dt = time.perf_counter() - t0
                tag = f"job:{meth}@{_site()}"
                with _LOCK:
                    _COUNTS[tag] += 1
                    _TOTALS[tag] += dt
                    if plan_dump and meth in ("parquet", "save"):
                        df = getattr(self, "_df", None)
                        if df is not None:
                            os.makedirs(plan_dump, exist_ok=True)
                            n = sum(
                                v
                                for t, v in _COUNTS.items()
                                if t.startswith("job:")
                            )
                            fn = os.path.join(
                                plan_dump,
                                f"{n:03d}_{meth}_"
                                f"{_site().replace('/', '_').replace(':', '_')}"
                                f"_{dt:.2f}s.txt",
                            )
                            try:
                                with open(fn, "w") as fh:
                                    fh.write(
                                        df._jdf.queryExecution()
                                        .explainString(
                                            df._sc._jvm.org.apache.spark.sql
                                            .execution.ExplainMode.fromString(
                                                "formatted"
                                            )
                                        )
                                    )
                            except Exception as e:  # diagnostic only
                                with open(fn, "w") as fh:
                                    fh.write(f"<explain failed: {e}>")

        setattr(cls, meth, wrap)

    # Spark 4 split: instances are pyspark.sql.classic.dataframe
    # .DataFrame, which OVERRIDES the action methods — patching the
    # base class alone intercepts nothing (r11: the r10 profiles were
    # silently missing every collect/count/localCheckpoint). Patch the
    # class that actually defines each method, never both (double
    # wrapping would double-count).
    classes = [DataFrame]
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _CDF

        classes.insert(0, _CDF)
    except ImportError:
        pass
    for m in ("collect", "count", "first", "localCheckpoint"):
        target = next((c for c in classes if m in c.__dict__), DataFrame)
        timed_method(target, m)
    for m in ("parquet", "save"):
        timed_method(DataFrameWriter, m)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    trials = 1
    for a in sys.argv[1:]:
        if a.startswith("--trials"):
            trials = int(a.split("=", 1)[1])

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from customer_segmentation_pyspark_spark import get_spark
    from customer_segmentation_pyspark_spark.sources import versioned
    from customer_segmentation_pyspark_spark.streaming import merge as M

    if os.environ.get("PROFILE_ACTIONS"):
        _install_action_timers()

    # --- instrument the primitives (module-level indirection only) ---
    versioned.commit_manifest = _timed(
        "commit_manifest", versioned.commit_manifest
    )
    versioned.collect_dir_stats = _timed(
        "collect_dir_stats", versioned.collect_dir_stats
    )
    versioned.collect_dir_rowcount = _timed(
        "collect_dir_rowcount", versioned.collect_dir_rowcount
    )
    versioned.gc_unreferenced_parts = _timed(
        "gc_unreferenced_parts", versioned.gc_unreferenced_parts
    )
    M.merge_into_partitioned_snapshot = _timed(
        "merge_cow", M.merge_into_partitioned_snapshot
    )
    M.merge_mor_into_partitioned_snapshot = _timed(
        "merge_mor", M.merge_mor_into_partitioned_snapshot
    )
    M.read_snapshot_changes = _timed("cdf_read", M.read_snapshot_changes)
    M.read_partitioned_snapshot = _timed(
        "snap_read", M.read_partitioned_snapshot
    )

    from customer_segmentation_pyspark_spark.streaming import (
        colindex,
        neardup,
        retrieval,
        scd,
        views,
    )

    for mod, fns in (
        (views, [
            "sync_view_to_snapshot", "sync_join_view_to_snapshots",
            "sync_agg_merge_view", "_fold_agg_delta", "_seed_agg_view_rows",
            "seed_count_sum_view", "update_count_sum_view",
        ]),
        (retrieval, ["sync_bm25_stack", "sync_postings_index"]),
        (neardup, ["sync_lsh_index", "neardup_probe_maintained"]),
        (colindex, ["sync_column_index", "read_by_column_value"]),
        (scd, [n for n in dir(scd) if n.startswith("sync_")]),
    ):
        for fn in fns:
            if hasattr(mod, fn):
                setattr(mod, fn, _timed(f"{mod.__name__.split('.')[-1]}.{fn}", getattr(mod, fn)))

    # queries.py imports these by module reference, so the wrappers take
    # effect as long as queries.py resolves them at call time; re-import
    # AFTER patching to be safe for from-imports
    from customer_segmentation_pyspark_spark.queries import REGISTRY
    from customer_segmentation_pyspark_spark.sources import load_table
    from customer_segmentation_pyspark_spark.sources.tables import TABLE_NAMES

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    spark.createDataFrame([(0, 1.0)], "k int, v double").groupBy(
        "k"
    ).applyInPandas(lambda pdf: pdf, "k int, v double").count()

    fn = REGISTRY[name].fn
    best = float("inf")
    for i in range(trials):
        with _LOCK:
            _COUNTS.clear()
            _TOTALS.clear()
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"profile:{name}")
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        best = min(best, wall)
        print(f"--- trial {i + 1}: wall {wall:.3f}s ---")
        acc = 0.0
        for tag in sorted(_TOTALS, key=lambda t: -_TOTALS[t]):
            print(
                f"  {tag:42s} n={_COUNTS[tag]:3d}  total={_TOTALS[tag]:7.3f}s"
            )
            acc += _TOTALS[tag]
    print(f"best wall: {best:.3f}s")


if __name__ == "__main__":
    main()
