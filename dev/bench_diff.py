#!/usr/bin/env python3
"""Compare two BENCH_FULL-style JSONs: common-query sums, top regressions
and improvements, new/removed queries. Usage: bench_diff.py OLD NEW

When BOTH snapshots carry a 'phases' map ({setup, op, assert} per
query), the comparison runs on OP time — the operator signal — instead
of the whole-gate total, so proof-heavy gates (equality exceptAlls,
brute-force recall baselines) stop polluting the regression picture.
Totals are still reported for context. Snapshots without phases fall
back to totals (and say so).

Material-regression gating uses the snapshots' per-query 'variance' map
(max-min spread across the bench's repeat passes) as a NOISE FLOOR: a
delta only counts as material when it clears +0.4s AND +25% AND the
larger of the two runs' recorded spreads for that query — sub-second
queries jittering inside their own cross-run spread are drift, not
regressions. Snapshots without a variance map fall back to the raw
thresholds (and say so)."""
import json
import sys

oldj = json.load(open(sys.argv[1]))
newj = json.load(open(sys.argv[2]))

# queries that FAILED on one side must be reported, never silently
# dropped from the comparison (a gate breaking outright is the worst
# regression there is)
newly_failed = sorted(q for q, v in oldj["queries"].items()
                      if v >= 0 and newj["queries"].get(q, 0) < 0)
newly_fixed = sorted(q for q, v in newj["queries"].items()
                     if v >= 0 and oldj["queries"].get(q, 0) < 0)
if newly_failed:
    print(f"!!! NEWLY FAILED in NEW ({len(newly_failed)}): "
          f"{', '.join(newly_failed)}")
if newly_fixed:
    print(f"previously failed, now passing ({len(newly_fixed)}): "
          f"{', '.join(newly_fixed)}")

pold = oldj.get("phases") or {}
pnew = newj.get("phases") or {}
use_op = bool(pold) and bool(pnew)
if use_op:
    print("comparing OP time (both snapshots carry phase splits); "
          "totals shown for context")
    old = {q: p["op"] for q, p in pold.items()
           if oldj["queries"].get(q, -1) >= 0}
    new = {q: p["op"] for q, p in pnew.items()
           if newj["queries"].get(q, -1) >= 0}
    tot_old = sum(v for v in oldj["queries"].values() if v >= 0)
    tot_new = sum(v for v in newj["queries"].values() if v >= 0)
    print(f"whole-gate totals: {tot_old:.1f}s -> {tot_new:.1f}s")
else:
    print("note: phases missing in one snapshot — comparing totals")
    old = {q: v for q, v in oldj["queries"].items() if v >= 0}
    new = {q: v for q, v in newj["queries"].items() if v >= 0}
vold = oldj.get("variance") or {}
vnew = newj.get("variance") or {}
if not (vold or vnew):
    print("note: no variance map in either snapshot — raw thresholds only")


pvold = oldj.get("phase_variance") or {}
pvnew = newj.get("phase_variance") or {}


def floor(q):
    """Noise floor for q in SECONDS. Preferred source in op-compare
    mode: the snapshots' per-PHASE 'phase_variance' map — the OP
    phase's own measured cross-pass spread, scaled by the OP time
    (negative sentinel = not computable, fall through). Fallback: the
    whole-gate relative spread scaled by OP share — a proof-heavy gate
    (large setup/assert) would otherwise carry a floor that dwarfs any
    plausible operator regression and silently suppress it."""
    if use_op:
        ov = pvold.get(q, {}).get("op", -1.0)
        nv = pvnew.get(q, {}).get("op", -1.0)
        if ov >= 0 and nv >= 0:
            return max(ov * pold.get(q, {}).get("op", 0.0),
                       nv * pnew.get(q, {}).get("op", 0.0))
        return max(vold.get(q, 0.0) * pold.get(q, {}).get("op", 0.0),
                   vnew.get(q, 0.0) * pnew.get(q, {}).get("op", 0.0))
    return max(vold.get(q, 0.0) * oldj["queries"].get(q, 0.0),
               vnew.get(q, 0.0) * newj["queries"].get(q, 0.0))


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
    noisy = " [inside noise floor]" if d <= floor(q) else ""
    print(f"  {q:28s} {old[q]:6.2f} -> {new[q]:6.2f}  ({d:+.2f}){noisy}")
material = [(q, old[q], new[q]) for d, q in deltas
            if d > 0.4 and new[q] > old[q] * 1.25 and d > floor(q)]
print(f"material regressions (+0.4s AND +25% AND > noise floor): "
      f"{len(material)}")
for q, o, n in material:
    print(f"  {q:28s} {o:6.2f} -> {n:6.2f}  (floor {floor(q):.2f})")
suppressed = [(q, old[q], new[q]) for d, q in deltas
              if d > 0.4 and new[q] > old[q] * 1.25 and d <= floor(q)]
if suppressed:
    print(f"suppressed by noise floor ({len(suppressed)}):")
    for q, o, n in suppressed:
        print(f"  {q:28s} {o:6.2f} -> {n:6.2f}  (floor {floor(q):.2f})")
added = sorted(set(new) - set(old) - set(newly_fixed))
print(f"new queries ({len(added)}): "
      f"{sum(new[q] for q in added):.1f}s total")
for q in added:
    print(f"  {q:28s} {new[q]:6.2f}")
