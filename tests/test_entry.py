"""Smoke-check the driver contract surface itself."""

from __future__ import annotations

import importlib.util
import sys

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py"
)
entry_mod = importlib.util.module_from_spec(spec)
sys.modules["__spark_entry__"] = entry_mod
spec.loader.exec_module(entry_mod)


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {"cluster", "n_points", "mean_hour", "mean_dow"} <= set(df.columns)
    assert sum(r["n_points"] for r in rows) > 0


def test_queries_and_oracles_consistent():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 35
    assert set(oracles) <= set(qs)
    # every oracle is non-empty SQL
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())
