"""Local mirror of the driver's correctness gate: run every REGISTRY query
through Spark AND its DuckDB oracle at sf0.01, compare row count, column
names, and order-insensitive values (floats to 1e-9 after the queries' own
rounding)."""

from __future__ import annotations

import math

import pytest

from customer_segmentation_pyspark_spark.queries import REGISTRY
from tests.conftest import SF_ORACLE

ORACLE_QUERIES = [n for n, s in REGISTRY.items() if s.oracle is not None]
ROWS_ONLY_QUERIES = [n for n, s in REGISTRY.items() if s.oracle is None]


def _norm_cell(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_ORACLE)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(spec.oracle)
    dcols = rel.columns
    drows = [tuple(r) for r in rel.fetchall()]

    assert sorted(scols) == sorted(dcols), (
        f"{name}: column names differ spark={scols} duck={dcols}"
    )
    assert len(srows) == len(drows), (
        f"{name}: row count differs spark={len(srows)} duck={len(drows)}"
    )
    s_norm = _normalize(srows, scols)
    d_norm = _normalize(drows, dcols)
    mismatches = [
        (a, b) for a, b in zip(s_norm, d_norm) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
    )


def test_k_core_oracle_converged(duck):
    """The k_core oracle peels a FIXED 8 rounds (_sql_k_core); it is
    exact only while the true fixpoint at the oracle SF is reached
    within 8. Assert convergence (last two edge frames equal) so a
    fixture/SF change can never silently desynchronize the oracle from
    Spark's data-dependent loop (ADVICE r02)."""
    from customer_segmentation_pyspark_spark.queries import (
        _sql_k_core_fixpoint,
    )

    n_prev, n_last = duck.sql(_sql_k_core_fixpoint(k=2, unroll=8)).fetchone()
    assert n_prev == n_last, (
        f"k-core oracle not converged at unroll=8: |e7|={n_prev} "
        f"|e8|={n_last}; raise unroll in _sql_k_core"
    )


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_ORACLE)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0


def test_oracle_output_types_portable(duck):
    """r08 (VERDICT r07 #1): the driver's value-hash is TYPE-sensitive
    and Spark has no 128-bit integer — an oracle output column DuckDB
    types as HUGEINT (e.g. an uncast ``sum(CASE ...)``) or DECIMAL
    hash-mismatches even when every value is identical on both sides
    (the r07 ``null_funcs`` red row). DESCRIBE every oracle (plans
    only, no execution) and reject the whole class so it can never
    ship again."""
    bad = []
    for name in ORACLE_QUERIES:
        rel = duck.sql(f"DESCRIBE {REGISTRY[name].oracle}")
        for cname, ctype in [(r[0], r[1]) for r in rel.fetchall()]:
            t = str(ctype).upper()
            if "HUGEINT" in t or t.startswith("DECIMAL"):
                bad.append((name, cname, t))
    assert not bad, (
        f"oracle output types DuckDB-only (wrap in CAST(... AS BIGINT/"
        f"DOUBLE)): {bad[:10]}"
    )
