#!/usr/bin/env python3
"""Round-over-round bench triage (VERDICT r8 item 5; jobs column r10).

Diffs two full bench artifacts (BENCH_full_rN.json — the target/bench.json
snapshot with per-query wall, executor-CPU, and job-count maps), flags every
query whose wall moved more than THRESHOLD in either direction, and
attributes each mover:

- wall + CPU moved, JOB COUNT moved too -> "shared-work migration or plan
  change": JIT/codegen warm-up does not change how many jobs a query runs,
  so a job-count delta means either first-trigger/CacheSlot work migrated
  between queries that share machinery when the run order changed (the r9
  t11 case: jobs 20->54 while llm1s joined the run and t6 dropped 25->9),
  or the plan genuinely changed. Either way the fresh-JVM recheck decides;
  the flag is never "warm-up".
- wall + CPU moved, jobs stable -> REAL (the work itself changed).
- wall moved, CPU flat -> scheduler/load noise on a shared box (the x23 r8
  analysis, scripted).

A "REAL" flag is a triage queue, not a verdict: recheck every flagged mover
in a fresh JVM (tools.TimeQuery, two passes — pass 2 is the warm number)
before treating it as a regression.

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
oj, nj = old.get("jobs", {}), new.get("jobs", {})

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
if tot_o > 0:
    print(f"aggregate wall over shared: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({tot_n / tot_o:.2f}x)")
else:
    # disjoint or zero-wall artifacts (e.g. diffing unrelated query lists)
    print("aggregate wall over shared: n/a (no shared wall time)")
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
        j0, j1 = oj.get(q), nj.get(q)
        jobs_moved = j0 is not None and j1 is not None and j0 != j1
        # attribution: CPU moved at least halfway (in log space) toward the
        # wall move -> the work changed; a simultaneous job-count move means
        # that work is migrated/replanned, never JIT warm-up
        if cr is None:
            verdict = "no-cpu-data"
        elif (r > 1) == (cr > 1) and abs(cr - 1) >= abs(r - 1) / 2:
            if jobs_moved:
                verdict = (f"shared-work migration or plan change "
                           f"(jobs {j0}->{j1}) — fresh-JVM recheck")
            else:
                verdict = "REAL " + ("regression" if r > 1 else "improvement")
        elif max(w0, w1) < 1.0:
            verdict = "sub-second jitter"
        else:
            verdict = "scheduler/load noise (cpu flat)"
        movers.append((r, q, w0, w1, cr, (j0, j1), verdict))

movers.sort(reverse=True)
if not movers:
    print(f"no movers beyond {th}x")
else:
    print("| query | wall old | wall new | ratio | cpu ratio | jobs | verdict |")
    print("|---|---|---|---|---|---|---|")
    for r, q, w0, w1, cr, (j0, j1), verdict in movers:
        crs = f"{cr:.2f}x" if cr is not None else "n/a"
        js = f"{j0}->{j1}" if j0 is not None and j1 is not None else "n/a"
        print(f"| {q} | {w0:.2f}s | {w1:.2f}s | {r:.2f}x | {crs} | {js} | {verdict} |")

real_reg = [m for m in movers if m[6] == "REAL regression"]
sys.exit(1 if real_reg else 0)
