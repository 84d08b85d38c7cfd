#!/usr/bin/env python3
"""Empirical scaling audit: compare two full-bench JSONs taken at scale
factors a 10x data ratio apart (sf0.01 vs sf0.1) and report each
query's time ratio. On fixed hardware, linear-work queries must grow at
most ~linearly with data (ratio <~ data ratio, usually far below it
while fixed job-startup overhead dominates); a ratio well ABOVE the
data ratio is the empirical signature of superlinear work (all-pairs
blowup, O(drops) re-reads, driver-side accumulation) — exactly the
class of defect that is invisible at one scale factor and fatal at
100 TB.

Usage: scalecurve.py BENCH_small.json BENCH_big.json [data_ratio=10]
Exit 1 if any query exceeds 2x the data ratio (slack for log factors
and shuffle constants); prints a markdown table sorted by ratio.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return {k: v for k, v in (d.get("queries") or {}).items()
            if isinstance(v, (int, float)) and v >= 0}


def main():
    if len(sys.argv) not in (3, 4):
        sys.exit(__doc__)
    small, big = load(sys.argv[1]), load(sys.argv[2])
    data_ratio = float(sys.argv[3]) if len(sys.argv) == 4 else 10.0
    common = sorted(set(small) & set(big))
    if not common:
        sys.exit("no common queries between the two runs")
    rows = sorted(((big[k] / max(small[k], 1e-9), small[k], big[k], k)
                   for k in common), reverse=True)
    # sub-half-second-at-small-SF queries are mostly fixed overhead —
    # their ratios measure JVM noise, not work growth; audit them
    # against an absolute bar at the big SF instead: treat t(small) as
    # if it were the 0.5 s floor, so 0.4 s -> 60 s (a 150x blowup)
    # still trips, while 0.1 s -> 2 s (startup noise) doesn't
    bad = [k for r, s, b, k in rows
           if b > 2 * data_ratio * max(s, 0.5)]
    print(f"| query | t(small) s | t(big) s | ratio (data {data_ratio:g}x) |")
    print("|---|---|---|---|")
    for r, s, b, k in rows[:15]:
        flag = " **SUPERLINEAR**" if k in bad else ""
        print(f"| {k} | {s:.2f} | {b:.2f} | {r:.1f}x{flag} |")
    n_sub = sum(1 for r, s, b, k in rows if r <= data_ratio)
    print(f"\n{len(common)} common queries; {n_sub} grow slower than the "
          f"data ({data_ratio:g}x), max ratio {rows[0][0]:.1f}x "
          f"({rows[0][3]}).")
    if bad:
        print(f"SUPERLINEAR (t(big) > {2*data_ratio:g}x * max(t(small), 0.5 s)): "
              + ", ".join(bad))
        sys.exit(1)
    print("No query grows superlinearly in data size.")


if __name__ == "__main__":
    main()
