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
    # Variance column (the round protocol's worst-case bound): per
    # query, the worse of (a) cross-run max/median over the merged runs
    # and (b) any single run's own in-process spread (Bench's "spread"
    # field — max/min over its 3 timed executions). Recorded at >= 2x,
    # FLAGGED at >= 3x: a driver capture showing a maintenance query at
    # many times the committed median is then adjudicated against this
    # recorded bound, not hand-analysis.
    spread = {}
    for k, v in times.items():
        if len(v) >= 2 and min(v) > 0:
            s = max(v) / statistics.median(v)
            if s >= 2.0:
                spread[k] = round(s, 2)
    for r in runs:
        for k, s in (r.get("spread") or {}).items():
            if float(s) >= 2.0:
                spread[k] = max(spread.get(k, 0.0), round(float(s), 2))
    # startup_s column (streaming-loop decomposition): per-query median
    # of the runs that reported one — kept alongside the time medians so
    # the merged artifact still records how much of each stream-family
    # entry is fixed streaming-query startup vs data work.
    startup_runs = {}
    for r in runs:
        for k, s in (r.get("startup_s") or {}).items():
            if float(s) > 0:
                startup_runs.setdefault(k, []).append(float(s))
    startup = {k: round(statistics.median(v), 3)
               for k, v in sorted(startup_runs.items())}
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
    if spread:
        artifact["spread"] = dict(sorted(spread.items()))
    if startup:
        artifact["startup_s"] = startup
    json.dump(artifact, open(out_path, "w"), indent=1)
    hi_var = sorted((k, s) for k, s in spread.items() if s >= 3.0)
    print(f"wrote {out_path}: {len(med)} queries, total {artifact['value']}s "
          f"(median of {len(runs)} runs)"
          + (f", FLAKY: {', '.join(flaky)}" if flaky else "")
          + (f", failed: {', '.join(failed)}" if failed else ""))
    if hi_var:
        print("VARIANCE >= 3x (worst single run vs median — adjudicate "
              "any driver-capture spike against these): "
              + ", ".join(f"{k} {s:.1f}x" for k, s in hi_var))


if __name__ == "__main__":
    main()
