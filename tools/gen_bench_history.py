#!/usr/bin/env python
"""Consolidate every recoverable bench record into BENCH_history.json
so round-over-round regressions are one file-read instead of tail
archaeology over head-truncated driver artifacts (r09, VERDICT #5).

Sources, in round order:
  * BENCH_r{N}.json — the driver's per-round artifact. r01/r02/r08
    carry a full parsed line; r03-r07 are head-truncated and recovered
    by tools/compare_bench.py's tail parsers (queries brace-matched
    out, totals from the exact trailing summary when present, else
    sum-of-recovered flagged as partial).
  * labeled idle records the builder committed (BENCH.idle-early-r06)
    and the current working-tree BENCH.json (the idle min-of-3 record
    bench.py maintains; git-ignored, so it exists only as the LATEST
    round's snapshot — labeled by the round that produced it).

Output shape:
  {"rounds": {label: {"total": s, "sf": x, "r01_subset_total": s|null,
                      "contended": bool|null, "partial": bool,
                      "source": file, "n_queries": n}},
   "queries": {qname: {label: seconds}}}

Usage: python tools/gen_bench_history.py [--out BENCH_history.json]
Re-run after each round (idempotent; labels are stable).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from compare_bench import load_bench  # noqa: E402


def _contended(d: dict) -> bool | None:
    c = d.get("contention")
    if not c:
        return None
    return max(c["spin_sec_before"], c["spin_sec_after"]) >= 0.40


#: builder-committed idle records that complement the driver artifacts
_EXTRA = [
    ("r06_idle", "BENCH.idle-early-r06.json"),
    ("r08_idle", "BENCH.idle-r08.json"),
    # the working-tree BENCH.json is the CURRENT round's idle record —
    # the label is patched to the latest driver round + 1 below
    ("latest_idle", "BENCH.json"),
]


def build_history(repo: str) -> dict:
    rounds: dict = {}
    queries: dict = {}

    def add(label: str, path: str) -> None:
        d = load_bench(path)
        rounds[label] = {
            "total": d.get("value"),
            "sf": d.get("sf"),
            "r01_subset_total": d.get("r01_subset_total"),
            "contended": _contended(d),
            "partial": bool(d.get("_partial")),
            "source": os.path.basename(path),
            "n_queries": len(d.get("queries", {})),
        }
        for q, s in d.get("queries", {}).items():
            queries.setdefault(q, {})[label] = s

    last_n = 0
    for path in sorted(glob.glob(os.path.join(repo, "BENCH_r*.json"))):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(path))
        if not m:
            continue
        last_n = max(last_n, int(m.group(1)))
        add(f"r{m.group(1)}", path)
    for label, name in _EXTRA:
        path = os.path.join(repo, name)
        if not os.path.exists(path):
            continue
        if label == "latest_idle":
            # BENCH.json belongs to round last_n+1 only if it was
            # produced AFTER the newest driver artifact; an untouched
            # working tree (same-round record) would otherwise show a
            # phantom extra round (r09, ADVICE) — mtime is the witness
            newest = os.path.join(repo, f"BENCH_r{last_n:02d}.json")
            same_round = os.path.exists(newest) and os.path.getmtime(
                path
            ) <= os.path.getmtime(newest)
            label = f"r{last_n if same_round else last_n + 1:02d}_idle"
        add(label, path)
    return {"rounds": rounds, "queries": queries}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="BENCH_history.json")
    ap.add_argument("--repo", default=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    ns = ap.parse_args()
    hist = build_history(ns.repo)
    with open(os.path.join(ns.repo, ns.out), "w") as f:
        json.dump(hist, f, indent=1, sort_keys=True)
        f.write("\n")
    r = hist["rounds"]
    print(
        f"{ns.out}: {len(r)} rounds, {len(hist['queries'])} queries; "
        + ", ".join(
            f"{k}={v['total']}s" + ("*" if v["partial"] else "")
            for k, v in sorted(r.items())
        )
    )


if __name__ == "__main__":
    main()
