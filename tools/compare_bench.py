#!/usr/bin/env python
"""Compare two bench JSON lines (or BENCH_r{N}.json driver artifacts)
with contention awareness: per-query ratios, median ratio, the r01
cross-round subset, and a contention verdict from the spin calibration.

Usage:
    python tools/compare_bench.py OLD.json NEW.json [--worst N]

Accepts either the raw one-line JSON bench.py prints or a driver
BENCH_r{N}.json wrapper (the bench line is extracted from its `tail`).
"""

from __future__ import annotations

import json
import re
import statistics
import sys


def load_bench(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    # driver wrapper: extract the JSON line from the captured tail
    m = re.search(r'\{"metric".*', d.get("tail", ""))
    if not m:
        sys.exit(f"{path}: no bench JSON found (keys: {sorted(d)})")
    return json.loads(m.group(0).split("\r")[0].split("\n")[0])


def contention_note(d: dict) -> str:
    c = d.get("contention")
    if not c:
        return "no contention data (pre-r03 artifact)"
    spin = max(c["spin_sec_before"], c["spin_sec_after"])
    verdict = "idle" if spin < 0.40 else "CONTENDED — timings inflated"
    return (
        f"spin {c['spin_sec_before']:.2f}/{c['spin_sec_after']:.2f} s "
        f"({verdict})"
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    worst_n = 10
    for a in sys.argv[1:]:
        if a.startswith("--worst"):
            worst_n = int(a.split("=", 1)[1]) if "=" in a else worst_n
    if len(args) != 2:
        sys.exit(__doc__)
    old, new = load_bench(args[0]), load_bench(args[1])
    print(f"old: total {old['value']} s  ({contention_note(old)})")
    print(f"new: total {new['value']} s  ({contention_note(new)})")
    for k in ("r01_subset_total",):
        if k in old or k in new:
            print(f"{k}: {old.get(k, '—')} -> {new.get(k, '—')}")

    shared = sorted(set(old["queries"]) & set(new["queries"]))
    ratios = [
        (new["queries"][q] / old["queries"][q], q) for q in shared
        if old["queries"][q] > 0
    ]
    if not ratios:
        sys.exit("no shared queries")
    med = statistics.median(r for r, _ in ratios)
    print(f"\nshared queries: {len(shared)}   median ratio: {med:.3f}")
    only_old = sorted(set(old["queries"]) - set(new["queries"]))
    only_new = sorted(set(new["queries"]) - set(old["queries"]))
    if only_old:
        print(f"dropped: {only_old}")
    if only_new:
        print(f"added:   {only_new}")

    print(f"\nworst {worst_n} ratios (check standalone warm before "
          "believing — graph one-shots swing ±10-15% idle):")
    for r, q in sorted(ratios, reverse=True)[:worst_n]:
        print(f"  {q:28s} {old['queries'][q]:7.2f} -> "
              f"{new['queries'][q]:7.2f}   {r:5.2f}x")
    flagged = [q for r, q in ratios if r > 2.0]
    print(f"\nqueries over the 2x bar: {flagged or 'none'}")


if __name__ == "__main__":
    main()
