"""Bench artifact robustness (r05): compare_bench must recover a
report from every truncation shape the driver has actually produced —
including a tail that lost the ``"queries": {`` prefix itself — and
bench.py must not overwrite an idle BENCH.json record with a contended
run. No Spark needed."""

from __future__ import annotations

import json
import sys

import pytest

sys.path.insert(0, "tools")
from compare_bench import load_bench  # noqa: E402

FULL = {
    "metric": "headline_queries_total_wall",
    "value": 3.0,
    "unit": "sec",
    "queries": {"q_alpha": 1.0, "q_beta": 2.0},
    "sf": 0.1,
    "r01_subset_total": 1.0,
    "contention": {"spin_sec_before": 0.33, "spin_sec_after": 0.34},
}


def _write(tmp_path, name, payload):
    p = tmp_path / name
    p.write_text(
        payload if isinstance(payload, str) else json.dumps(payload)
    )
    return str(p)


def test_load_raw_line_and_wrapper(tmp_path):
    raw = _write(tmp_path, "raw.json", FULL)
    assert load_bench(raw)["queries"]["q_beta"] == 2.0
    wrapped = _write(
        tmp_path, "wrap.json", {"n": 1, "tail": "noise\n" + json.dumps(FULL)}
    )
    assert load_bench(wrapped)["value"] == 3.0


def test_load_mid_queries_truncation(tmp_path):
    # BENCH_r03 shape: prefix survives up to "queries": { ... }
    line = json.dumps(FULL)
    cut = line[line.index('"queries"') :]
    p = _write(tmp_path, "mid.json", {"n": 1, "tail": cut})
    d = load_bench(p)
    assert d["_partial"] and d["queries"] == FULL["queries"]
    assert d["value"] == 3.0 and d["sf"] == 0.1


def test_load_headless_truncation(tmp_path):
    # BENCH_r04 shape: the tail starts MID-queries-dict — even the
    # "queries": { prefix is gone, first pair's name is mangled
    line = json.dumps(FULL)
    cut = line[line.index("alpha") :]  # '"q_' of the first pair lost
    p = _write(tmp_path, "headless.json", {"n": 1, "tail": cut})
    d = load_bench(p)
    assert d["_headless"]
    # the mangled first name is either dropped or harmless; the intact
    # pair and the trailing scalars must be recovered
    assert d["queries"]["q_beta"] == 2.0
    assert d["r01_subset_total"] == 1.0
    assert d["contention"]["spin_sec_before"] == 0.33


def test_bench_contended_refuses_to_overwrite_idle(tmp_path):
    """bench._bench_out_path: a contended run routes to
    BENCH.contended.json iff an idle record exists to protect."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location("bench_mod", "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    here = str(tmp_path)
    bench_json = os.path.join(here, "BENCH.json")
    # no record yet: even a contended run writes BENCH.json
    assert mod._bench_out_path(here, 0.95) == bench_json
    with open(bench_json, "w") as f:
        json.dump(FULL, f)  # idle record (spin 0.33/0.34)
    # idle run overwrites freely; contended run is routed aside
    assert mod._bench_out_path(here, 0.33) == bench_json
    assert mod._bench_out_path(here, 0.95) == os.path.join(
        here, "BENCH.contended.json"
    )
    # a previously CONTENDED record holds nothing worth protecting
    busy = dict(FULL)
    busy["contention"] = {"spin_sec_before": 0.9, "spin_sec_after": 0.8}
    with open(bench_json, "w") as f:
        json.dump(busy, f)
    assert mod._bench_out_path(here, 0.95) == bench_json


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))


R06_SUMMARY = {
    "metric": "headline_queries_total_wall",
    "value": 3.5,
    "unit": "sec",
    "sf": 0.1,
    "n_queries": 2,
    "r01_subset_total": 1.5,
    "contention": {"spin_sec_before": 0.31, "spin_sec_after": 0.35},
}
R06_FULL = {
    **FULL,
    "value": 3.5,
    "r01_subset_total": 1.5,
    "contention": R06_SUMMARY["contention"],
    "summary": R06_SUMMARY,
}


def test_summary_tail_recovers_exact_totals(tmp_path):
    """r06 format (VERDICT #6): the trailing summary object survives a
    4 KB tail capture and is parsed back EXACTLY — no regex, no
    sum-of-recovered underestimate."""
    line = json.dumps(R06_FULL)
    tail = line[-4096:] if len(line) > 4096 else line[10:]  # head lost
    p = _write(tmp_path, "r06tail.json", {"n": 1, "tail": tail})
    d = load_bench(p)
    assert d["_summary"] and not d.get("_headless")
    assert d["value"] == 3.5  # exact, not sum(recovered)
    assert d["r01_subset_total"] == 1.5
    assert d["contention"]["spin_sec_after"] == 0.35
    assert d["sf"] == 0.1


def test_summary_tail_without_any_queries(tmp_path):
    """Even a capture so short only the summary survives reports
    totals + contention."""
    line = json.dumps(R06_FULL)
    cut = line[line.rindex('"summary"') - 2 :]
    p = _write(tmp_path, "sumonly.json", {"n": 1, "tail": cut})
    d = load_bench(p)
    assert d["value"] == 3.5
    assert d["contention"]["spin_sec_before"] == 0.31
    assert d["queries"] == {} or "q_beta" in d["queries"]


def test_bench_non_default_sf_never_clobbers_main_record(tmp_path):
    """r06: a profiling run at sf0.001 (or a scale run at sf1) must land
    in BENCH.sf{sf}.json, never overwrite the authoritative sf0.1
    record — idle or not."""
    sys.path.insert(0, ".")
    from bench import _bench_out_path

    here = str(tmp_path)
    assert _bench_out_path(here, 0.3, sf=0.001).endswith("BENCH.sf0.001.json")
    assert _bench_out_path(here, 0.9, sf=1.0).endswith("BENCH.sf1.0.json")
    assert _bench_out_path(here, 0.3, sf=0.1).endswith("/BENCH.json")


def test_history_builder_and_trace(tmp_path, capsys):
    """gen_bench_history consolidates driver artifacts + idle records
    into one pivot; compare_bench --history traces queries across
    rounds from it (r09, VERDICT #5)."""
    from compare_bench import _history_mode
    from gen_bench_history import build_history

    _write(tmp_path, "BENCH_r01.json", {"n": 1, "tail": json.dumps(FULL)})
    r2 = dict(FULL, value=4.0, queries={"q_alpha": 1.5, "q_beta": 2.5})
    _write(tmp_path, "BENCH_r02.json", {"n": 1, "tail": json.dumps(r2)})
    idle = dict(FULL, value=3.5, queries={"q_alpha": 1.2, "q_beta": 2.3})
    _write(tmp_path, "BENCH.json", idle)
    hist = build_history(str(tmp_path))
    assert set(hist["rounds"]) == {"r01", "r02", "r03_idle"}
    assert hist["queries"]["q_alpha"] == {
        "r01": 1.0, "r02": 1.5, "r03_idle": 1.2,
    }
    assert hist["rounds"]["r03_idle"]["contended"] is False
    hp = _write(tmp_path, "BENCH_history.json", hist)
    _history_mode(hp, ["q_beta"], worst_n=5)
    out = capsys.readouterr().out
    assert "q_beta: r01=2.00  r02=2.50  r03_idle=2.30" in out
    _history_mode(hp, [], worst_n=5)
    out = capsys.readouterr().out
    assert "worst 5 ratios r02 -> r03_idle" in out
