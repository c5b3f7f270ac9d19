#!/usr/bin/env python3
"""Two-query census refit (r15 item 3): least-squares t = c + m*sf on
warm medians from three TpchGap logs plus three duck_bench JSONs, for
the queries whose plans changed in r14 (q_tpch10/q_tpch15).

Usage: refit_two.py <spark_sf0.1.log> <spark_sf1.log> <spark_sf3.log>
                    <duck_sf0.1.json> <duck_sf1.json> <duck_sf3.json>
"""
import json
import re
import sys

SFS = [0.1, 1.0, 3.0]


def spark_warm(path):
    # TpchGap prints a multi-line JSON block with per-query rows:
    #   "q_tpch15": {"t_plan": ..., "t_first": ..., "t_warm": ...}
    out = {}
    for line in open(path):
        m = re.search(r'"(q_tpch\d+)":\s*\{[^}]*"t_warm":\s*([0-9.]+)',
                      line)
        if m:
            out[m.group(1)] = float(m.group(2))
    return out


def fit(ys):
    xs = SFS
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    m = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    c = (sy - m * sx) / n
    return c, m


def main():
    sp = [spark_warm(p) for p in sys.argv[1:4]]
    du = [json.load(open(p))["queries"] for p in sys.argv[4:7]]
    res = {}
    for q in sorted(sp[0]):
        sw = [s[q] for s in sp]
        dw = [d[q] for d in du]
        sc, sm = fit(sw)
        dc, dm = fit(dw)
        res[q] = {
            "spark_warm": sw, "const": round(sc, 3), "slope": round(sm, 4),
            "duck_warm": dw, "duck_const": round(dc, 3),
            "duck_slope": round(dm, 4),
            "slope_ratio": round(sm / dm, 2) if dm > 0 else None,
        }
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
