#!/usr/bin/env python3
"""Compare two BENCH_FULL-style JSONs: common-query sums, top regressions
and improvements, new/removed queries. Usage: bench_diff.py OLD NEW"""
import json
import sys

old = json.load(open(sys.argv[1]))["queries"]
new = json.load(open(sys.argv[2]))["queries"]
common = sorted(set(old) & set(new))
so = sum(old[q] for q in common)
sn = sum(new[q] for q in common)
print(f"common {len(common)}: {so:.1f}s -> {sn:.1f}s "
      f"({(sn - so) / so * 100:+.1f}%)")
deltas = sorted(((new[q] - old[q], q) for q in common))
print("top improvements:")
for d, q in deltas[:8]:
    print(f"  {q:28s} {old[q]:6.2f} -> {new[q]:6.2f}  ({d:+.2f})")
print("top regressions:")
for d, q in deltas[-8:]:
    print(f"  {q:28s} {old[q]:6.2f} -> {new[q]:6.2f}  ({d:+.2f})")
material = [(q, old[q], new[q]) for d, q in deltas
            if d > 0.4 and new[q] > old[q] * 1.25]
print(f"material regressions (+0.4s AND +25%): {len(material)}")
for q, o, n in material:
    print(f"  {q:28s} {o:6.2f} -> {n:6.2f}")
added = sorted(set(new) - set(old))
print(f"new queries ({len(added)}): "
      f"{sum(new[q] for q in added):.1f}s total")
for q in added:
    print(f"  {q:28s} {new[q]:6.2f}")
