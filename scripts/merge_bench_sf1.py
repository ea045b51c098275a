#!/usr/bin/env python3
"""Merge the scale-drill bench JSONs into BENCH_SF1.json.

Inputs: per-query cold/warm seconds for the 10 heaviest operators at
sf0.1 and at the 10x /tmp/sf1 fixture (scripts/make_sf1.py). Emits one
artifact with cold/warm scale ratios per query; ratio ~<= 10 means
at-most-linear scaling at 10x data on fixed (32-thread) resources.

Usage: python3 scripts/merge_bench_sf1.py sf01.json [sf01_extra.json ...]
         --sf1 sf1.json --out BENCH_SF1.json
"""
import json
import sys


def main(argv):
    sf01_files, sf1_file, out = [], None, "BENCH_SF1.json"
    it = iter(argv)
    for a in it:
        if a == "--sf1":
            sf1_file = next(it)
        elif a == "--out":
            out = next(it)
        else:
            sf01_files.append(a)
    base_cold, base_warm = {}, {}
    for f in sf01_files:
        d = json.load(open(f))
        base_cold.update(d["queries"])
        base_warm.update(d["queries_warm"])
    d1 = json.load(open(sf1_file))
    rows = {}
    for q in sorted(d1["queries"]):
        c1, w1 = d1["queries"][q], d1["queries_warm"][q]
        c0, w0 = base_cold.get(q), base_warm.get(q)
        rows[q] = {
            "sf0.1_cold_s": c0, "sf0.1_warm_s": w0,
            "sf1_cold_s": c1, "sf1_warm_s": w1,
            "cold_ratio": round(c1 / c0, 2) if c0 and c0 > 0 else None,
            "warm_ratio": round(w1 / w0, 2) if w0 and w0 > 0 else None,
        }
    art = {
        "drill": "10x scale stress: 10 heaviest operators, local[32], "
                 "sf1 = scripts/make_sf1.py 10x key-consistent replication "
                 "of sf0.1",
        "linear_bar": "ratio <= ~10 (data grew 10x on fixed resources); "
                      "sublinear = fixed overheads amortized",
        "queries": rows,
        "warm_total_sf0.1_s": round(sum(v["sf0.1_warm_s"] for v in rows.values()
                                        if v["sf0.1_warm_s"]), 2),
        "warm_total_sf1_s": round(sum(v["sf1_warm_s"] for v in rows.values()), 2),
    }
    with open(out, "w") as fh:
        json.dump(art, fh, indent=1, sort_keys=True)
    print(json.dumps(art["queries"], indent=1, sort_keys=True))


if __name__ == "__main__":
    main(sys.argv[1:])
