#!/usr/bin/env python3
"""Merge per-query floors from N clean full-bench runs (BENCH_DETAIL.json
copies) into a markdown floor table: floor = min steady / min cold per
query across runs, plus the per-run samples for transparency.

Usage: python3 tools/merge_floors.py /tmp/bench_detail_1.json [more...]
Prints the markdown table and a JSON floors blob to stdout.
"""
import json, sys

runs = [json.load(open(p)) for p in sys.argv[1:]]
# union of query sets across runs: a query missing from some run (added or
# removed between rounds) floors from the runs that have it, loudly —
# first-run-only keys would silently drop late additions or KeyError.
names = sorted(set().union(*(r["queries"] for r in runs)))
for q in names:
    missing = sum(1 for r in runs if q not in r["queries"])
    if missing:
        print(f"WARN: {q} present in only {len(runs)-missing}/{len(runs)} runs",
              file=sys.stderr)
floors = {}
for q in names:
    have = [r for r in runs if q in r["queries"]]
    floors[q] = {
        "steady": round(min(r["queries"][q] for r in have), 3),
        "cold": round(min(r["cold"][q] for r in have), 3),
        "samples": [r["samples"][q] for r in have],
    }
total = round(sum(v["steady"] for v in floors.values()), 1)
cold_total = round(sum(v["cold"] for v in floors.values()), 1)
print(f"total steady {total} / cold {cold_total} over {len(names)} queries\n")
print("| query | steady s | cold s |")
print("|---|---|---|")
for q in names:
    print(f"| {q} | {floors[q]['steady']:.2f} | {floors[q]['cold']:.2f} |")
print()
print(json.dumps({"total_steady": total, "total_cold": cold_total,
                  "floors": {q: {"steady": floors[q]["steady"],
                                 "cold": floors[q]["cold"]} for q in names}}))
