#!/usr/bin/env python
"""Compare two bench JSON lines (or BENCH_r{N}.json driver artifacts)
with contention awareness: per-query ratios, median ratio, the r01
cross-round subset, and a contention verdict from the spin calibration.

Usage:
    python tools/compare_bench.py OLD.json NEW.json [--worst N]

Accepts, in order of preference per file:
  1. the raw one-line JSON bench.py prints (also what bench.py now
     writes to BENCH.json directly),
  2. a driver BENCH_r{N}.json wrapper whose `tail` contains the full
     bench line,
  3. a TRUNCATED driver wrapper where only the per-query dict survived
     in the tail (BENCH_r03.json) — the `"queries": {...}` object is
     brace-matched out and the total reconstructed as sum(queries).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import statistics
import sys


def _extract_object(text: str, start: int) -> str | None:
    """Return the balanced {...} substring starting at text[start]=='{'.

    Bench values are plain floats/ints (no braces or quotes inside the
    queries dict), but walk strings correctly anyway for the contention
    block.
    """
    depth = 0
    in_str = False
    esc = False
    for i in range(start, len(text)):
        ch = text[i]
        if in_str:
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
            continue
        if ch == '"':
            in_str = True
        elif ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                return text[start : i + 1]
    return None


def _parse_headless_tail(path: str, tail: str, required: bool = True) -> dict:
    """Last-resort recovery for a tail truncated so early that even the
    ``"queries": {`` prefix is gone (BENCH_r04.json): the capture
    starts mid-queries-dict, so every ``"name": float`` pair up to the
    dict's closing brace is a per-query timing. The first pair is kept
    only if its opening quote survived (a quoteless or mid-name
    fragment yields either no match or a nonsense name that simply
    falls out of the shared-query intersection). The total is the sum
    of RECOVERED queries — an underestimate, flagged as such."""
    end = tail.find("}")
    if end < 0 or not (
        pairs := re.findall(r'"([A-Za-z_]\w*)":\s*([-+0-9.eE]+)', tail[:end])
    ):
        if required:
            sys.exit(f"{path}: no bench JSON found in tail")
        return {"queries": {}, "value": 0.0, "_partial": True}
    queries = {k: float(v) for k, v in pairs}
    d: dict = {
        "queries": queries,
        "value": round(sum(queries.values()), 3),
        "_partial": True,
        "_headless": True,
    }
    rest = tail[end:]
    for key in ("sf", "r01_subset_total"):
        km = re.search(rf'"{key}":\s*([-+0-9.eE]+)', rest)
        if km:
            d[key] = float(km.group(1))
    cm = re.search(r'"contention":\s*\{', rest)
    if cm:
        cobj = _extract_object(rest, cm.end() - 1)
        if cobj is not None:
            d["contention"] = json.loads(cobj)
    return d


def _parse_summary_tail(tail: str) -> dict | None:
    """Exact recovery from the r06+ line format: the compact
    ``"summary": {...}`` object is the LAST key of the bench line, so
    any tail capture that kept the line's end carries the full totals +
    contention verbatim — one json.loads of the slice, no regex."""
    idx = tail.rfind('"summary"')
    if idx < 0:
        return None
    # the slice is the whole line minus its opening brace: summary is
    # the LAST key, so '{' + slice is the balanced {"summary": {...}}
    try:
        return json.loads("{" + tail[idx:].rstrip())["summary"]
    except (json.JSONDecodeError, KeyError, TypeError):
        return None


def _parse_partial_tail(path: str, tail: str) -> dict:
    """Recover what we can from a tail that lost the line's prefix."""
    summary = _parse_summary_tail(tail)
    if summary is not None:
        # per-query pairs live strictly BEFORE the summary key — don't
        # let the headless scraper mistake summary scalars for queries
        tail = tail[: tail.rfind('"summary"')]
    m = re.search(r'"queries":\s*\{', tail)
    if not m:
        d = _parse_headless_tail(path, tail, required=summary is None)
    else:
        obj = _extract_object(tail, m.end() - 1)
        if obj is None and summary is None:
            sys.exit(f"{path}: queries dict itself is truncated")
        queries = json.loads(obj) if obj is not None else {}
        d = {
            "queries": queries,
            "value": round(sum(queries.values()), 3),
            "_partial": True,
        }
        for key in ("sf", "r01_subset_total"):
            km = re.search(rf'"{key}":\s*([-+0-9.eE]+)', tail[m.end() :])
            if km:
                d[key] = float(km.group(1))
        cm = re.search(r'"contention":\s*\{', tail)
        if cm:
            cobj = _extract_object(tail, cm.end() - 1)
            if cobj is not None:
                d["contention"] = json.loads(cobj)
    if summary is not None:
        # the summary's totals are EXACT (written by bench.py itself),
        # so they override any sum-of-recovered reconstruction
        for key in ("value", "sf", "r01_subset_total", "contention"):
            if key in summary:
                d[key] = summary[key]
        d["_summary"] = True
        d.pop("_headless", None)
    return d


def load_bench(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return d["parsed"]
    # driver wrapper: extract the JSON line from the captured tail
    tail = d.get("tail", "")
    m = re.search(r'\{"metric".*', tail)
    if m:
        line = m.group(0).split("\r")[0].split("\n")[0]
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            pass  # line itself truncated mid-JSON — fall through
    return _parse_partial_tail(path, tail)


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


def _history_mode(path: str, names: list[str], worst_n: int) -> None:
    """Read BENCH_history.json (tools/gen_bench_history.py): with query
    names, print each query's per-round series; without, print the
    round table plus the worst ratios between the last two rounds."""
    with open(path) as f:
        hist = json.load(f)
    rounds = hist["rounds"]
    order = sorted(rounds)
    print(f"{'round':10s} {'total_s':>9s} {'n':>4s}  flags  source")
    for lb in order:
        r = rounds[lb]
        flags = "".join(
            [
                "C" if r.get("contended") else ".",
                "p" if r.get("partial") else ".",
            ]
        )
        print(
            f"{lb:10s} {r['total'] or 0:9.2f} {r['n_queries']:4d}  "
            f"{flags:5s}  {r['source']}"
        )
    q = hist["queries"]
    if names:
        for name in names:
            if name not in q:
                print(f"\n{name}: not in any round")
                continue
            series = "  ".join(
                f"{lb}={q[name][lb]:.2f}" for lb in order if lb in q[name]
            )
            print(f"\n{name}: {series}")
        return
    last2 = [lb for lb in order if rounds[lb].get("n_queries")][-2:]
    if len(last2) < 2:
        return
    a, b = last2
    shared = [n for n in q if a in q[n] and b in q[n] and q[n][a] > 0]
    ratios = sorted(
        ((q[n][b] / q[n][a], n) for n in shared), reverse=True
    )
    print(f"\nworst {worst_n} ratios {a} -> {b} "
          f"({len(shared)} shared queries):")
    for r, n in ratios[:worst_n]:
        print(f"  {n:28s} {q[n][a]:7.2f} -> {q[n][b]:7.2f}   {r:5.2f}x")


def main() -> None:
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    ap.add_argument("old", nargs="?")
    ap.add_argument("new", nargs="?")
    ap.add_argument("--worst", type=int, default=10, metavar="N")
    ap.add_argument(
        "--history",
        nargs="?",
        const="BENCH_history.json",
        metavar="FILE",
        help="read the consolidated history instead of two records; "
        "positionals become query names to trace across rounds",
    )
    ns = ap.parse_args()
    worst_n = ns.worst
    if ns.history:
        names = [a for a in (ns.old, ns.new) if a]
        # an easy operator slip: `compare_bench.py old.json new.json
        # --history` silently reinterprets the two RECORD paths as
        # query names — refuse instead of tracing nonsense (r09, ADVICE)
        paths = [a for a in names if a.endswith(".json") or os.path.exists(a)]
        if paths:
            ap.error(
                f"positional(s) {paths} look like bench record files, "
                "but --history treats positionals as QUERY NAMES; drop "
                "--history to compare two records"
            )
        _history_mode(ns.history, names, worst_n)
        return
    if not ns.old or not ns.new:
        ap.error("OLD and NEW bench files are required without --history")
    old, new = load_bench(ns.old), load_bench(ns.new)
    for label, d in (("old", old), ("new", new)):
        partial = ""
        if d.get("_headless"):
            partial = (
                " [headless tail: total = sum of the "
                f"{len(d['queries'])} recovered queries only]"
            )
        elif d.get("_partial"):
            partial = " [reconstructed from partial tail]"
        trials = d.get("trials") or d.get("summary", {}).get("trials")
        tnote = (
            f", min of {trials} trials/query"
            if trials and trials > 1
            else ", single-shot"
        )
        print(
            f"{label}: total {d['value']} s  "
            f"({contention_note(d)}{tnote}){partial}"
        )
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
