#!/usr/bin/env python3
"""Paired bench A/B against a baseline commit (driver-side tooling, like
compare.py — not part of the library).

The x10 bench leg is host-day-sensitive at the +/-50% level (proven by
manual worktree A/Bs in r15 and r16: every apparent mover reproduced on
the OLD commit). This tool automates that adjudication so any future
"lane X regressed" claim must carry a paired row measured in the SAME
sweep window:

  1. `git worktree add` the baseline commit (reused across invocations);
  2. run `graft.Bench` INTERLEAVED — A,B,A,B... for `runs` rounds — on
     the same SPARK_GRAFT_SF_DIR data, so ambient host drift hits both
     arms equally;
  3. per lane, take min-of-runs per arm and emit the paired table
     (lane, old, new, new/old) plus totals, as markdown + one JSON line.

Usage:
  python3 tools/bench_ab.py <baseline-commit> [sfDir] [runs]
Defaults: sfDir=/root/testdata/sf0.1, runs=3.
"""
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(workdir, sf_dir):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        cwd=workdir, env=env, capture_output=True, text=True, check=False)
    for line in (out.stdout + out.stderr).splitlines():
        line = line.strip()
        # sbt may prefix the JSON line with [info]
        m = re.search(r'(\{"metric".*\})', line)
        if m:
            return json.loads(m.group(1))
    sys.stderr.write(out.stdout[-4000:] + out.stderr[-4000:])
    raise RuntimeError(f"no bench JSON line from {workdir}")


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    base_commit = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    sha = subprocess.check_output(
        ["git", "rev-parse", "--short", base_commit], cwd=REPO,
        text=True).strip()
    wt = f"/tmp/graft_ab_{sha}"
    if not os.path.isdir(wt):
        subprocess.check_call(
            ["git", "worktree", "add", "--detach", wt, base_commit], cwd=REPO)

    arms = {"old": wt, "new": REPO}
    lanes = {a: {} for a in arms}       # lane -> [secs...]
    totals = {a: [] for a in arms}
    for r in range(runs):
        for arm, d in arms.items():     # interleaved: A,B per round
            res = run_bench(d, sf_dir)
            totals[arm].append(res["value"])
            for q, s in res.get("queries", {}).items():
                lanes[arm].setdefault(q, []).append(s)
            # Bench's internal 10x scale leg (queries_sf1) is the
            # host-day-sensitive one this tool exists to adjudicate —
            # pair it too, as "<lane>:x10" rows
            for q, s in (res.get("queries_sf1") or {}).items():
                if s is not None:
                    lanes[arm].setdefault(f"{q}:x10", []).append(s)
            sys.stderr.write(
                f"[bench-ab] round {r} {arm}: {res['value']:.2f} s\n")

    common = sorted(set(lanes["old"]) & set(lanes["new"]))
    rows = [(q, min(lanes["old"][q]), min(lanes["new"][q])) for q in common]
    print(f"\n| lane | old@{sha} | new@HEAD | new/old |")
    print("|---|---|---|---|")
    for q, o, n in sorted(rows, key=lambda t: -(t[2] - t[1])):
        print(f"| {q} | {o:.2f} | {n:.2f} | {n / o:.2f}x |")
    to, tn = sum(r[1] for r in rows), sum(r[2] for r in rows)
    print(f"| **total (common lanes, min-of-{runs})** | {to:.2f} | "
          f"{tn:.2f} | {tn / to:.2f}x |")
    payload = {
        "probe": "bench_ab", "baseline": sha, "sf_dir": sf_dir, "runs": runs,
        "total_old": round(to, 2), "total_new": round(tn, 2),
        "ratio": round(tn / to, 3),
        "lanes": {q: {"old": round(o, 2), "new": round(n, 2),
                      "ratio": round(n / o, 3)} for q, o, n in rows}}
    print(json.dumps(payload))
    # persist the per-lane record — the r17 round lost its closing paired
    # table because it lived only on stdout; every run now lands in the
    # repo so the round-close can paste/commit it
    outdir = os.path.join(REPO, ".bench_ab")
    os.makedirs(outdir, exist_ok=True)
    head = subprocess.check_output(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO, text=True).strip()
    with open(os.path.join(outdir, f"{sha}_vs_{head}.json"), "w") as f:
        json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
