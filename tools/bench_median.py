#!/usr/bin/env python3
"""Merge N full bench runs into BENCH_REF.json: per-query MEDIAN of the
runs (the round-6 lesson: ambient swing makes single-run caps flappy).
Usage: bench_median.py OUT.json RUN1.json RUN2.json [RUN3.json ...]
"""
import json
import statistics
import sys


def main() -> None:
    out, runs = sys.argv[1], sys.argv[2:]
    datas = [json.load(open(p)) for p in runs]
    names = set()
    for d in datas:
        names.update(d["queries"].keys())
    med = {}
    for q in sorted(names):
        vals = [d["queries"][q] for d in datas if q in d["queries"]]
        med[q] = statistics.median(vals)
    total = sum(med.values())
    rec = {
        "metric": "total",
        "value": total,
        "unit": "sec",
        "queries": med,
        "sf": datas[0].get("sf", ""),
        "note": f"per-query median of {len(runs)} full runs",
    }
    with open(out, "w") as f:
        json.dump(rec, f)
        f.write("\n")
    run_totals = ", ".join("%.1fs" % sum(d["queries"].values()) for d in datas)
    print(f"{out}: {len(med)} queries, median total {total:.1f}s (runs: {run_totals})")


if __name__ == "__main__":
    main()
