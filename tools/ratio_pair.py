#!/usr/bin/env python3
"""Cross-engine ratio over the common set, stated BOTH ways (r15,
VERDICT r14 item 6): warm-median-based (memoized builds amortized)
and first-rep-based (cold-session bound), from a graft.Bench JSON and
a duck_bench JSON of the same sitting.

Usage: ratio_pair.py <bench.json> <duck.json>
"""
import json
import sys


def main():
    b = json.load(open(sys.argv[1]))
    d = json.load(open(sys.argv[2]))
    common = sorted(set(b["queries"]) & set(d["queries"]))
    sm = sum(b["queries"][q] for q in common)
    sf = sum(b["first_rep"][q] for q in common)
    dm = sum(d["queries"][q] for q in common)
    print(json.dumps({
        "n_common": len(common),
        "spark_median_total": round(sm, 1),
        "spark_first_rep_total": round(sf, 1),
        "duck_median_total": round(dm, 1),
        "ratio_median": round(sm / dm, 3),
        "ratio_first_rep": round(sf / dm, 3),
        "duck_dnf": d.get("dnf", []),
    }, indent=1))


if __name__ == "__main__":
    main()
