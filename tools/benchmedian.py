#!/usr/bin/env python3
"""Merge N full Bench runs into one per-query-MEDIAN artifact.

Usage: python3 tools/benchmedian.py out.json run1.json run2.json [run3.json ...]

Why: this host's wall-clock drifts up to ~1.3-2.4x on unchanged code
(README drift log) — one round-10 outlier run flagged ELEVEN untouched
queries that all re-measured clean. A single full run is therefore not
a trustworthy round artifact. The round protocol is: take N>=3 full
runs (all committed as BENCH_r{N}_run{i}.json), merge with this tool
into BENCH_r{N}_full.json, and run benchdiff on the MEDIAN artifacts
only. Per-query median, not per-run pick: queries spike independently,
so no single run is clean everywhere.

Rules:
- a query's time = median of the runs where it succeeded (>= 0);
- a query is `failed` only if it failed in EVERY run it appeared in —
  a flaky pass is still a pass for timing, but flagged in `flaky`;
- envelope `value` = sum of medians; `sf` must agree across runs.
"""
import json
import statistics
import sys


def main():
    if len(sys.argv) < 4:
        sys.exit(__doc__)
    out_path, run_paths = sys.argv[1], sys.argv[2:]
    runs = [json.load(open(p)) for p in run_paths]
    sfs = {r.get("sf") for r in runs}
    if len(sfs) != 1:
        sys.exit(f"refusing to merge runs at different scale factors: {sfs}")

    times = {}    # name -> [succeeded times]
    appeared = {} # name -> run count
    failed_in = {} # name -> failed run count
    for r in runs:
        fl = set(r.get("failed") or [])
        for k, v in (r.get("queries") or {}).items():
            appeared[k] = appeared.get(k, 0) + 1
            if float(v) >= 0 and k not in fl:
                times.setdefault(k, []).append(float(v))
            else:
                failed_in[k] = failed_in.get(k, 0) + 1
        for k in fl - set(r.get("queries") or {}):
            appeared[k] = appeared.get(k, 0) + 1
            failed_in[k] = failed_in.get(k, 0) + 1

    med = {k: round(statistics.median(v), 3) for k, v in sorted(times.items())}
    failed = sorted(k for k in appeared
                    if failed_in.get(k, 0) == appeared[k])
    flaky = sorted(k for k in failed_in if k not in failed)
    artifact = {
        "metric": "total",
        "value": round(sum(med.values()), 3),
        "unit": "sec",
        "queries": med,
        "failed": failed,
        "sf": sfs.pop(),
        "median_of": len(runs),
        "sources": run_paths,
    }
    if flaky:
        artifact["flaky"] = flaky
    json.dump(artifact, open(out_path, "w"), indent=1)
    print(f"wrote {out_path}: {len(med)} queries, total {artifact['value']}s "
          f"(median of {len(runs)} runs)"
          + (f", FLAKY: {', '.join(flaky)}" if flaky else "")
          + (f", failed: {', '.join(failed)}" if failed else ""))


if __name__ == "__main__":
    main()
