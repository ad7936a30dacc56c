#!/usr/bin/env python
"""Diff two bench JSON outputs and flag per-query regressions.

Usage:
    python tools/bench_diff.py BENCH_r01.json BENCH_r02.json [--factor 2.0]

Reads the one-line JSON the bench harness emits ({"queries": {...}}),
prints per-query old/new/ratio sorted by ratio, and exits non-zero if
any query regressed by more than --factor (default 2x) — suitable as
a round-over-round bench gate. Queries present on only one side are
listed as added/removed, never counted as regressions.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--factor", type=float, default=2.0)
    args = ap.parse_args()

    def load(path):
        with open(path) as f:
            d = json.load(f)
        # the driver's BENCH_r{N}.json wraps the bench line in "parsed"
        return d.get("parsed", d)

    old, new = load(args.old), load(args.new)
    oq, nq = old.get("queries", {}), new.get("queries", {})

    both = sorted(set(oq) & set(nq))
    rows = []
    for name in both:
        o, n = oq[name], nq[name]
        if o <= 0 or n <= 0:  # failed runs are not comparable
            continue
        rows.append((n / o, name, o, n))
    rows.sort(reverse=True)

    regressed = [r for r in rows if r[0] > args.factor]
    print(f"{'query':34s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    for ratio, name, o, n in rows:
        mark = "  <-- REGRESSED" if ratio > args.factor else ""
        print(f"{name:34s} {o:8.3f} {n:8.3f} {ratio:6.2f}x{mark}")
    for name in sorted(set(nq) - set(oq)):
        print(f"{name:34s} {'-':>8s} {nq[name]:8.3f}   added")
    for name in sorted(set(oq) - set(nq)):
        print(f"{name:34s} {oq[name]:8.3f} {'-':>8s}   removed")

    tot_o = sum(v for v in oq.values() if v > 0)
    tot_n = sum(v for v in nq.values() if v > 0)
    print(f"\ntotal: {tot_o:.2f}s -> {tot_n:.2f}s "
          f"({old.get('sf')} -> {new.get('sf')} sf)")
    if regressed:
        print(f"{len(regressed)} quer{'y' if len(regressed) == 1 else 'ies'} "
              f"regressed >{args.factor}x", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
