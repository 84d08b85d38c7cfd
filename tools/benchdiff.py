#!/usr/bin/env python3
"""Compare two bench artifacts round-over-round.

Usage: python3 tools/benchdiff.py <old.json> <new.json>
       python3 tools/benchdiff.py --ground-truth <commit> <committed.json>
           [--sf <dir>] [--runs N]

--ground-truth is the drift adjudicator's hard evidence: it rebuilds
<commit>'s code in a throwaway worktree (target/bench_gt/<commit>),
re-runs the FULL bench N times (default 3) on TODAY's host, merges
per-query medians, and diffs <committed.json> (the artifact that
commit committed, measured on the THEN-host) against the replay.
Identical code on both sides means every ratio in the report IS host
drift, by construction — no anchor extrapolation. Replay artifacts
land next to the worktree as BENCH_gt_run{i}.json + BENCH_gt.json;
commit BENCH_gt.json as BENCH_r{old}_replay_on_r{new}_host.json.

Each side may also be a comma-separated list of run files, in which
case per-query MEDIANS across the runs are compared (the same merge
rule as tools/benchmedian.py — the round protocol is N>=3 full runs
per side, compared on medians, because this host drifts up to ~2.4x
on unchanged code and single-run flags are mostly noise).

Accepts either this repo's full Bench JSON ({"queries": {...}}) or the
driver's capture format ({"tail": "..."} — per-query times regexed out
of the possibly-truncated tail). Prints common-suite totals, the
regression list (>1.5x AND >+0.3s — the round gate), and the biggest
movers both ways.

Host-drift adjudication: this host drifts up to ~2.4x on unchanged
code (reboots, cache state), and rounds 10/11 both burned effort
hand-A/B-ing flags that were host state, not code. The diff now
computes a DRIFT FACTOR — the median new/old ratio over designated
ANCHOR queries (operators untouched for many rounds, moderate
runtimes, historically ~1.0x round-over-round) — and reports
drift-normalized ratios alongside raw. A regression flag that
disappears under normalization is auto-annotated "host state" with
the anchor evidence; one that survives is real and needs a code
explanation.
"""
import json
import re
import statistics
import sys

# Untouched-for-rounds, moderate-runtime queries whose only reason to
# move is the host, grouped by what BOUNDS them — host drift is not
# uniform (I/O-bound and CPU-bound paths drift differently across
# reboots/cache state), so the factor is computed per family and the
# global factor is the median of family medians. Round-13 rebuild of
# the round-12 five-anchor set, whose 0.70x-0.86x dispersion (±12%)
# came from mixing x14_bloom_lookup (0.70) and l49_split_leakage
# (0.71) with l12/l22 (0.85/0.86); the replacement anchors all tracked
# the r11d->r12c suite median within ~6%, three per family so one
# flapping anchor is outvoted. Revisit a member only if its operator
# is deliberately changed — swap it in the same commit.
ANCHOR_FAMILIES = {
    "scan":       ["q1_agg", "l27_repetition", "x27_partition_pruning"],
    "shuffle":    ["x9_bucketed_join", "l6_dedup_minhash", "a4_distinct"],
    "window":     ["a2_rank", "w3_session_window", "l71_source_len_quartiles"],
    "similarity": ["l52_lsh_recall", "l53_pq_codes", "l62_ann_index_serve"],
    "streaming":  ["w8_tws_fold", "w9_tws_sessions", "stream_graftlog"],
}
ANCHORS = [a for fam in ANCHOR_FAMILIES.values() for a in fam]


def load(path):
    """Returns (times, failed): -1 sentinels are kept OUT of the times
    (negative seconds would deflate the common-suite total) but IN the
    failed set, so a pass->fail transition is reportable instead of the
    query silently vanishing from every section."""
    d = json.load(open(path))
    if isinstance(d.get("queries"), dict):
        times = {}
        failed = set(d.get("failed") or [])
        for k, v in d["queries"].items():
            if float(v) >= 0:
                times[k] = float(v)
            else:
                failed.add(k)
        return times, failed
    tail = d.get("tail") or ""
    raw = tail  # pre-slice copy: the "failed" list sits AFTER queries
    # parse only keys inside the "queries" object: the envelope's own
    # numeric fields ("value":<suite total>, "sf") would otherwise be
    # counted as queries and inflate common-suite totals
    m = re.search(r'"queries"\s*:\s*\{', tail)
    if m:
        tail = tail[m.end():]
        end = tail.find("}")  # a truncated tail may never close the object
        if end >= 0:
            tail = tail[:end]
    envelope = {"value", "sf"}
    out, failed = {}, set()
    for k, v in re.findall(r'"([a-z0-9_]+)"\s*:\s*([0-9.-]+)', tail):
        if k in envelope:
            continue
        try:
            t = float(v)  # a truncated tail can cut a token mid-number
        except ValueError:
            continue
        if t >= 0:
            out[k] = t
        else:
            failed.add(k)
    # the envelope's own failed list survives truncation anywhere: if the
    # closing ']' was cut off, every fully-quoted name after the marker
    # still counts (a half-quoted final name is unrecoverable either way)
    mf = re.search(r'"failed"\s*:\s*\[([^\]]*)(\]|$)', raw, re.S)
    if mf:
        failed |= set(re.findall(r'"([a-z0-9_]+)"', mf.group(1)))
    return out, failed


def load_side(arg):
    """One artifact, or a comma-separated run list -> per-query medians.
    Multi-run failed = failed in every run where the query appeared."""
    import statistics
    paths = [p for p in arg.split(",") if p]
    if len(paths) == 1:
        return load(paths[0])
    loaded = [load(p) for p in paths]
    times, seen, failcnt = {}, {}, {}
    for t, f in loaded:
        for k, v in t.items():
            times.setdefault(k, []).append(v)
            seen[k] = seen.get(k, 0) + 1
        for k in f:
            seen[k] = seen.get(k, 0) + 1
            failcnt[k] = failcnt.get(k, 0) + 1
    med = {k: statistics.median(v) for k, v in times.items()}
    failed = {k for k in seen if failcnt.get(k, 0) == seen[k]}
    return med, failed


def ground_truth(argv):
    """Rebuild <commit> in a worktree, re-bench it on today's host,
    and diff the committed artifact against the replay. Returns the
    (old_arg, new_arg) pair for the normal diff path."""
    import os
    import subprocess
    commit, committed = argv[0], argv[1]
    sf, runs = "/root/testdata/sf0.1", 3
    rest = argv[2:]
    while rest:
        if rest[0] == "--sf":
            sf, rest = rest[1], rest[2:]
        elif rest[0] == "--runs":
            runs, rest = int(rest[1]), rest[2:]
        else:
            sys.exit(f"unknown arg {rest[0]}\n\n{__doc__}")
    wt = os.path.abspath(f"target/bench_gt/{commit}")
    if os.path.isdir(wt):
        # an interrupted previous run can leave a half-created worktree:
        # only reuse it if it is actually checked out at <commit>
        head = subprocess.run(["git", "-C", wt, "rev-parse", "HEAD"],
                              capture_output=True, text=True)
        want = subprocess.run(["git", "rev-parse", commit],
                              capture_output=True, text=True)
        if (head.returncode != 0 or want.returncode != 0
                or head.stdout.strip() != want.stdout.strip()):
            print(f"[ground-truth] stale/invalid worktree at {wt} "
                  f"(HEAD {head.stdout.strip() or '?'}) — recreating",
                  flush=True)
            rm = subprocess.run(["git", "worktree", "remove", "--force", wt],
                                capture_output=True)
            if rm.returncode != 0 or os.path.isdir(wt):
                # not a registered worktree (pruned .git/worktrees, or a
                # plain leftover dir): `remove` can't help and `add` into
                # a non-empty dir would die — clear it by hand and drop
                # any stale registration before re-adding
                import shutil
                shutil.rmtree(wt, ignore_errors=True)
                subprocess.run(["git", "worktree", "prune"],
                               capture_output=True)
            subprocess.run(["git", "worktree", "add", wt, commit], check=True)
    else:
        subprocess.run(["git", "worktree", "add", wt, commit], check=True)
    print(f"[ground-truth] building {commit} in {wt}", flush=True)
    build_log = f"{wt}/sbt_build.log"
    with open(build_log, "w") as lf:
        rb = subprocess.run(["sbt", "-batch", "compile"], cwd=wt,
                            stdout=lf, stderr=subprocess.STDOUT)
    if rb.returncode != 0:
        sys.exit(f"[ground-truth] build of {commit} failed "
                 f"(rc={rb.returncode}) — see {build_log}")
    outs = []
    for i in range(1, runs + 1):
        out = f"{wt}/BENCH_gt_run{i}.json"
        print(f"[ground-truth] bench run {i}/{runs} at {sf}", flush=True)
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf,
                   SPARK_GRAFT_BENCH_OUT=out)
        with open(f"{wt}/sbt_bench_run{i}.log", "w") as lf:
            r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                               cwd=wt, env=env, stdout=lf,
                               stderr=subprocess.STDOUT)
        if r.returncode != 0:
            print(f"[ground-truth] run {i} exited rc={r.returncode} "
                  "(a query failed — its runs are excluded by the merge rule)")
        outs.append(out)
    subprocess.run([sys.executable, "tools/benchmedian.py",
                    f"{wt}/BENCH_gt.json"] + outs, check=True)
    print(f"[ground-truth] merged replay: {wt}/BENCH_gt.json")
    print(f"[ground-truth] diff: committed({committed}) -> replay "
          "(same code both sides; every ratio below is HOST DRIFT)")
    return committed, f"{wt}/BENCH_gt.json"


def main():
    if len(sys.argv) >= 2 and sys.argv[1] == "--ground-truth":
        a, b = ground_truth(sys.argv[2:])
    elif len(sys.argv) == 3:
        a, b = sys.argv[1], sys.argv[2]
    else:
        sys.exit(__doc__)
    (old, old_failed), (new, new_failed) = load_side(a), load_side(b)
    # a query that TIMED before and FAILS now is the worst regression a
    # bench can show — lead with it, never let it vanish from the report
    broke = sorted((set(old) & new_failed) - set(new))
    if broke:
        print(f"NEWLY FAILED ({len(broke)}): " + ", ".join(
            f"{k} (was {old[k]:.2f}s)" for k in broke))
    fixed = sorted((old_failed & set(new)) - set(old))
    if fixed:
        print(f"newly passing ({len(fixed)}): " + ", ".join(
            f"{k} {new[k]:.2f}s" for k in fixed))
    common = sorted(set(old) & set(new))
    t_old, t_new = sum(old[k] for k in common), sum(new[k] for k in common)
    ratio = f"{t_new / t_old:.2f}x" if t_old > 0 else "n/a"
    print(f"common queries: {len(common)}  old {t_old:.1f}s  new {t_new:.1f}s  "
          f"ratio {ratio}" if common else "no common queries")
    # host-drift factor: per-family medians first (each family votes
    # once, so a drift that hits I/O-bound paths harder than CPU-bound
    # ones is visible instead of averaged away), global = median of
    # family medians.
    fam_meds = {}
    fam_detail = {}
    for fam, members in ANCHOR_FAMILIES.items():
        rs = [(a, new[a] / old[a]) for a in members
              if a in old and a in new and old[a] > 0]
        if rs:
            fam_meds[fam] = statistics.median(r for _, r in rs)
            fam_detail[fam] = rs
    drift = statistics.median(fam_meds.values()) if fam_meds else 1.0
    if fam_meds:
        n_anchors = sum(len(v) for v in fam_detail.values())
        print(f"host-drift factor (median of {len(fam_meds)} family "
              f"medians over {n_anchors} anchors): {drift:.2f}x")
        for fam in sorted(fam_meds):
            detail = ", ".join(f"{a} {r:.2f}x" for a, r in fam_detail[fam])
            print(f"  {fam:10s} {fam_meds[fam]:.2f}x  [{detail}]")
        if t_old > 0:
            print(f"drift-normalized ratio: {t_new / drift / t_old:.2f}x "
                  f"(raw {ratio} / drift {drift:.2f}x)")
        # The families never agree perfectly; their spread IS the error
        # bar on the normalized ratio. Family-median spread (not raw
        # per-anchor spread) is the honest instrument noise: one
        # flapping anchor is outvoted inside its family.
        fs = list(fam_meds.values())
        spread = max(fs) / min(fs) if min(fs) > 0 else float("inf")
        half = (spread - 1.0) / 2.0
        print(f"family-median dispersion: {min(fs):.2f}x..{max(fs):.2f}x "
              f"(spread {spread:.2f}x) -> normalized ratio is "
              f"trustworthy to ~±{half:.0%}; deltas inside that band "
              f"are noise, not verdicts")
    else:
        print("host-drift factor: n/a (no anchors on both sides)")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"new-only ({len(only_new)}): "
              + ", ".join(f"{k} {new[k]:.2f}s" for k in only_new))
    reg = [(k, old[k], new[k]) for k in common
           if new[k] > 1.5 * old[k] and new[k] - old[k] > 0.3]
    print(f"regressions (>1.5x and >+0.3s, raw): {len(reg)}")
    for k, a, b in sorted(reg, key=lambda x: -(x[2] - x[1])):
        bn = b / drift
        if not (bn > 1.5 * a and bn - a > 0.3):
            # the flag vanishes once the anchors' shared movement is
            # divided out: the host moved, not this query's code
            print(f"  {k:30s} {a:6.2f} -> {b:6.2f}  "
                  f"HOST STATE (normalized {bn:.2f}s clears the gate at "
                  f"drift {drift:.2f}x)")
        else:
            print(f"  {k:30s} {a:6.2f} -> {b:6.2f}  "
                  f"REAL (survives normalization: {bn:.2f}s at drift {drift:.2f}x)")
    movers = sorted(((k, old[k], new[k]) for k in common),
                    key=lambda x: -abs(x[2] - x[1]))[:8]
    print("biggest movers:")
    for k, a, b in movers:
        print(f"  {k:30s} {a:6.2f} -> {b:6.2f}  ({b - a:+.2f}s)")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # piped through head — not an error
        pass
