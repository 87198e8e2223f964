#!/usr/bin/env python3
"""Compare the round-14 single-invocation sf100 run against the r13
family rungs (which ran piecemeal via allowlists). Emits the SCALING.md
table body: query, r13 rung seconds (and which artifact), r14 full-run
seconds, delta.

Usage: python3 tools/sf100_compare.py [bench/BENCH_sf100_full_r14.json]
"""
import json, glob, sys

full_path = sys.argv[1] if len(sys.argv) > 1 else "bench/BENCH_sf100_full_r14.json"
full = json.load(open(full_path))

r13 = {}
for f in sorted(glob.glob("bench/BENCH_sf100*_r13.json")):
    d = json.load(open(f))
    for q, t in d["queries"].items():
        # prefer the SERVED number when a query appears in both build and
        # served artifacts (the full run serves committed artifacts too)
        if q not in r13 or "served" in f or "kernel" in f:
            r13[q] = (t, f.split("/")[-1])

rows = sorted(full["queries"].items(), key=lambda kv: -kv[1])
print(f"full run: total={full['value']:.1f}s n={len(full['queries'])} "
      f"errors={full['n_query_errors']} codegen={full['codegen_errors']} "
      f"cache={full.get('cache')} pretouch={full.get('pretouch_sec')}s "
      f"shuffle_partitions={full.get('shuffle_partitions')} loadavg={full.get('loadavg_1m')}")
print()
print("| query | r13 rung | r14 full run | note |")
print("|---|---|---|---|")
for q, t in rows[:40]:
    if q in r13:
        t13, src = r13[q]
        print(f"| {q} | {t13:.1f} ({src.replace('BENCH_sf100_','').replace('_r13.json','')}) | {t:.1f} | |")
    else:
        print(f"| {q} | — (first sf100 measurement) | {t:.1f} | |")
print()
covered = sum(1 for q in full["queries"] if q in r13)
print(f"{covered}/{len(full['queries'])} queries had an r13 sf100 number; "
      f"{len(full['queries']) - covered} measured at sf100 for the first time")
regress = [(q, r13[q][0], t) for q, t in full["queries"].items()
           if q in r13 and t > max(2 * r13[q][0], r13[q][0] + 30)]
print(f"regressions beyond 2x-or-30s: {len(regress)}")
for q, a, b in sorted(regress, key=lambda x: -(x[2] - x[1])):
    print(f"  {q}: {a:.1f} -> {b:.1f}")
