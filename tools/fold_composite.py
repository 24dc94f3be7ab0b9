#!/usr/bin/env python3
"""Fold N bench_out_run*.json files into the round's composite: per-query
min over passes whose probe was clean, runs with contended flags noted.
Usage: fold_composite.py <dir> [out.json]"""
import glob
import json
import sys

d = sys.argv[1]
files = sorted(glob.glob(f"{d}/bench_out_run*.json"))
runs = []
comp = {}
for f in files:
    j = json.load(open(f))
    contended_qs = set(j.get("contended_queries", {}))
    runs.append({
        "total": round(j["value"], 3),
        "contended": j["contended"],
        "probe_ref": round(j["probe_ref"], 3),
        "contended_queries": sorted(contended_qs),
    })
    for q, v in j["queries"].items():
        if q in contended_qs:
            continue  # that query had no clean pass in this run
        v = float(v)
        if q not in comp or v < comp[q]:
            comp[q] = v
out = {
    "metric": "total",
    "unit": "sec",
    "sf": "/root/testdata/sf0.1",
    "stat": f"best_clean_composite_of_{len(files)}_runs",
    "value": round(sum(comp.values()), 3),
    "n_queries": len(comp),
    "runs": runs,
    "queries_min": {k: round(v, 3) for k, v in sorted(comp.items())},
}
dst = sys.argv[2] if len(sys.argv) > 2 else f"{d}/composite.json"
json.dump(out, open(dst, "w"), indent=1)
print(f"composite {out['value']} s over {len(comp)} queries -> {dst}")
for r in runs:
    print(f"  run total={r['total']} contended={r['contended']} "
          f"probe_ref={r['probe_ref']} flagged={r['contended_queries']}")
