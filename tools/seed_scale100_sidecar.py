#!/usr/bin/env python3
"""Seed /tmp/graft_scale100_progress.tsv from the committed
BENCH_SCALE100.json so a fresh box re-runs ONLY the queries whose code
changed (pass their names as args to exclude them from the seed).

Sidecar row format (ScaleBench100): name\tsmall\tbig\tfactor\tcap
  completed: big/factor measured, cap=0.0
  timeboxed: big=factor=-2.0, cap=timeboxed_at_s
  disk-capped: big=factor=-3.0, cap=disk_full_at_s
"""
import json, os, sys

exclude = set(sys.argv[1:])
art = json.load(open(os.path.join(os.path.dirname(__file__), "..", "BENCH_SCALE100.json")))
sidecar = os.environ.get("SPARK_GRAFT_SCALE100_PROGRESS", "/tmp/graft_scale100_progress.tsv")

existing = set()
if os.path.exists(sidecar):
    with open(sidecar) as f:
        existing = {line.split("\t")[0] for line in f if "\t" in line}

rows = []
for name, q in art["queries"].items():
    if name in exclude or name in existing:
        continue
    s = q["small_s"]
    if q.get("disk_full_at_s") is not None:
        rows.append((name, s, -3.0, -3.0, q["disk_full_at_s"]))
    elif q.get("timeboxed_at_s") is not None:
        rows.append((name, s, -2.0, -2.0, q["timeboxed_at_s"]))
    elif q.get("scale_x") is not None and q.get("big_s") is not None:
        rows.append((name, s, q["big_s"], q["scale_x"], 0.0))

with open(sidecar, "a") as f:
    for r in rows:
        f.write("\t".join(str(x) for x in r) + "\n")
print(f"seeded {len(rows)} rows into {sidecar} (excluded: {sorted(exclude)}; already present: {len(existing)})")
