#!/usr/bin/env python3
"""Build SCALE.md content from three Bench JSON lines (sf0.1, sf1, sf1skew).

Usage: python3 tools/scale_report.py bench_sf01.json bench_sf1.json bench_sf1skew.json

Flags queries whose sf1/sf0.1 wall-clock ratio exceeds the data growth
(10x) by more than 1.5x as super-linear, and skew/uniform ratios > 2x as
skew-sensitive. Fixed per-query overhead (JIT, planning, job launch)
makes small ratios meaningless - the interesting tail is the top.
"""
import json
import sys


def load(p):
    with open(p) as f:
        for line in f:
            line = line.strip()
            if line.startswith('{"metric"'):
                return json.loads(line)
    raise SystemExit(f"no metric line in {p}")


def main():
    b01, b1, b1s = (load(p) for p in sys.argv[1:4])
    q01, q1, q1s = b01["queries"], b1["queries"], b1s["queries"]
    rows = []
    for name in q01:
        t01, t1, t1s = q01.get(name, -1), q1.get(name, -1), q1s.get(name, -1)
        if min(t01, t1) <= 0:
            rows.append((name, t01, t1, t1s, float("inf"), float("inf")))
            continue
        ratio = t1 / t01
        skew = (t1s / t1) if t1 > 0 and t1s > 0 else float("inf")
        rows.append((name, t01, t1, t1s, ratio, skew))
    rows.sort(key=lambda r: -r[4])
    print(f"| query | sf0.1 s | sf1 s | sf1skew s | sf1/sf0.1 | skew/uniform |")
    print("|---|---|---|---|---|---|")
    for name, t01, t1, t1s, ratio, skew in rows:
        flag = " **super-linear**" if ratio > 15 else ""
        sflag = " **skew-sensitive**" if skew > 2 else ""
        print(f"| {name}{flag}{sflag} | {t01:.3f} | {t1:.3f} | {t1s:.3f} | "
              f"{ratio:.1f}x | {skew:.2f}x |")
    print()
    print(f"totals: sf0.1 {b01['value']:.1f} s, sf1 {b1['value']:.1f} s "
          f"({b1['value']/b01['value']:.1f}x), sf1skew {b1s['value']:.1f} s")


if __name__ == "__main__":
    main()
