#!/usr/bin/env python3
"""Round-over-round bench triage (VERDICT r8 item 5).

Diffs two full bench artifacts (BENCH_full_rN.json — the target/bench.json
snapshot with per-query wall AND executor-CPU maps), flags every query whose
wall moved more than THRESHOLD in either direction, and attributes each
mover: a wall move backed by a comparable executor-CPU move is REAL (the
plan or the data changed); a wall move with flat CPU is scheduler/load noise
on a shared box (the x23 r8 analysis, scripted — an 8-job sub-second
operator "regresses" every round the scheduler sneezes).

A "REAL" flag is a triage queue, not a verdict: JIT/codegen warm-up CPU is
attributed to whichever queries run early in a changed 280-query order, so
recheck every flagged mover in a fresh JVM (tools.TimeQuery, two passes —
pass 2 is the warm number) before treating it as a regression.

Usage: python3 tools/bench_compare.py OLD.json NEW.json [threshold=1.5]
Prints a markdown table; exits 1 if any REAL regression is flagged.
"""
import json
import sys

old_p, new_p = sys.argv[1], sys.argv[2]
th = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

old, new = json.load(open(old_p)), json.load(open(new_p))
ow, nw = old["queries"], new["queries"]
oc, nc = old.get("cpu_secs", {}), new.get("cpu_secs", {})

shared = sorted(set(ow) & set(nw))
added = sorted(set(nw) - set(ow))
removed = sorted(set(ow) - set(nw))

print(f"# bench compare: {old_p} -> {new_p}")
print(f"shared queries: {len(shared)}; added: {len(added)}; removed: {len(removed)}")
if added:
    print(f"  added: {', '.join(added)}")
if removed:
    print(f"  removed: {', '.join(removed)}")
tot_o = sum(ow[q] for q in shared)
tot_n = sum(nw[q] for q in shared)
print(f"aggregate wall over shared: {tot_o:.1f}s -> {tot_n:.1f}s "
      f"({tot_n / tot_o:.2f}x)")
print()

movers = []
for q in shared:
    w0, w1 = ow[q], nw[q]
    if w0 <= 0 or w1 <= 0:
        continue
    r = w1 / w0
    if r > th or r < 1 / th:
        c0, c1 = oc.get(q), nc.get(q)
        cr = (c1 / c0) if (c0 and c1 and c0 > 0) else None
        # attribution: CPU moved at least halfway (in log space) toward the
        # wall move -> the work itself changed; otherwise the box did
        if cr is None:
            verdict = "no-cpu-data"
        elif (r > 1) == (cr > 1) and abs(cr - 1) >= abs(r - 1) / 2:
            verdict = "REAL " + ("regression" if r > 1 else "improvement")
        elif max(w0, w1) < 1.0:
            verdict = "sub-second jitter"
        else:
            verdict = "scheduler/load noise (cpu flat)"
        movers.append((r, q, w0, w1, cr, verdict))

movers.sort(reverse=True)
if not movers:
    print(f"no movers beyond {th}x")
else:
    print("| query | wall old | wall new | ratio | cpu ratio | verdict |")
    print("|---|---|---|---|---|---|")
    for r, q, w0, w1, cr, verdict in movers:
        crs = f"{cr:.2f}x" if cr is not None else "n/a"
        print(f"| {q} | {w0:.2f}s | {w1:.2f}s | {r:.2f}x | {crs} | {verdict} |")

real_reg = [m for m in movers if m[5] == "REAL regression"]
sys.exit(1 if real_reg else 0)
