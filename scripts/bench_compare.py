#!/usr/bin/env python3
"""Compare two Bench JSON artifacts per-query (steady medians).

Usage: python3 scripts/bench_compare.py OLD.json NEW.json [threshold]
Prints queries whose steady median moved by more than `threshold`
(default 1.3x in either direction, minimum 0.3 s absolute so micro
queries don't spam), plus totals. Driver-side tooling only.
"""
import json, sys

old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3

qo, qn = old["queries_steady"], new["queries_steady"]
shared = sorted(set(qo) & set(qn))
print(f"old: steady={old['steady_value']:.1f}s n={len(qo)} "
      f"load={old.get('load_start')}->{old.get('load_end')}")
print(f"new: steady={new['steady_value']:.1f}s n={len(qn)} "
      f"load={new.get('load_start')}->{new.get('load_end')}")
only_old = set(qo) - set(qn)
only_new = set(qn) - set(qo)
if only_old: print("only in old:", sorted(only_old))
if only_new: print("only in new:", sorted(only_new))
print(f"shared-query steady: old={sum(qo[q] for q in shared):.1f}s "
      f"new={sum(qn[q] for q in shared):.1f}s")
moved = []
for q in shared:
    a, b = qo[q], qn[q]
    if a <= 0 or b <= 0:
        print(f"FAILED sentinel: {q} old={a} new={b}")
        continue
    if abs(b - a) >= 0.3 and (b / a >= thr or a / b >= thr):
        moved.append((b / a, q, a, b))
for r, q, a, b in sorted(moved):
    print(f"{'FASTER' if r < 1 else 'SLOWER'} {r:5.2f}x  {q:38s} "
          f"{a:7.2f}s -> {b:7.2f}s")
if not moved:
    print(f"no shared query moved beyond {thr}x (+0.3s floor)")
