#!/usr/bin/env python3
"""Compare two BENCH_FULL.json snapshots and flag real regressions.

Usage: python3 dev/bench_diff.py OLD.json NEW.json [ratio]

A query is flagged only when NEW/OLD exceeds `ratio` (default 1.3), the
move clears the per-query noise floor recorded in the snapshots'
`variance` maps ((max-min)/min across the bench's three timed passes),
AND the absolute delta is at least 0.5 s — cross-run whole-JVM drift
dominates sub-second queries, so small absolute moves are never signal.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d.get("queries", {}), d.get("variance", {})


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old_q, old_v = load(sys.argv[1])
    new_q, new_v = load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    common = sorted(set(old_q) & set(new_q))
    flagged = []
    for k in common:
        o, n = old_q[k], new_q[k]
        if o <= 0 or n <= 0:
            continue  # failures are correctness business, not perf
        r = n / o
        noise = max(old_v.get(k) or 0, new_v.get(k) or 0)
        if r > ratio and (r - 1) > noise and n - o >= 0.5:
            flagged.append((r, k, o, n, noise))
    tot_o = sum(v for v in old_q.values() if v > 0)
    tot_n = sum(v for v in new_q.values() if v > 0)
    print(f"total {tot_o:.1f}s -> {tot_n:.1f}s ({tot_n / tot_o:.2f}x); "
          f"{len(common)} comparable, {len(set(new_q) - set(old_q))} new, "
          f"{len(set(old_q) - set(new_q))} removed")
    for r, k, o, n, noise in sorted(flagged, reverse=True):
        print(f"REGRESSION {k}: {o:.2f}s -> {n:.2f}s ({r:.2f}x, "
              f"noise floor {noise:.2f})")
    if not flagged:
        print("no regressions above the noise floor")


if __name__ == "__main__":
    main()
