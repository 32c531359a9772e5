#!/usr/bin/env python3
"""Decade-ratio triage: compare two BENCH_full_latest_*.json boards.

Usage: python3 tools/board_ratios.py BENCH_full_latest_sf0.1.json \
           BENCH_full_latest_sf1.json [threshold]
Prints per-query ratios (slow board / fast board) sorted descending,
flagging rows above the threshold (default 12 — the >12x/decade
outlier bar used in SCALE.md triage).
"""
import json, sys

lo, hi = json.load(open(sys.argv[1])), json.load(open(sys.argv[2]))
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0
ql, qh = lo["queries"], hi["queries"]
common = sorted(set(ql) & set(qh), key=lambda k: -(qh[k] / ql[k] if ql[k] else 0))
print(f"total {lo.get('value', 0):.1f} -> {hi.get('value', 0):.1f} s "
      f"({hi.get('value', 1) / max(lo.get('value', 1), 1e-9):.2f}x), "
      f"{len(common)} common queries")
for k in common:
    if ql[k] <= 0:
        continue
    r = qh[k] / ql[k]
    flag = "  <-- >%.0fx" % thr if r > thr else ""
    print(f"{k:42s} {ql[k]:8.2f} -> {qh[k]:8.2f}  {r:6.1f}x{flag}")
