#!/usr/bin/env python3
"""Full-registry big-replica oracle sweep orchestrator (round-10
verdict item 1): shard the registered oracles across N parallel
check_oracle.py workers, each with its own DuckDB memory ceiling and
spill cap, so the ~390-query replay at the 100x replica finishes in
wall-clock hours instead of a serial day — without letting one
ceiling-class oracle zero the disk for its neighbors.

The ceiling-class queries (named in --skip) are excluded here and
verified by their dedicated sampled/exact verifiers
(tools/check_*_sample.py, check_ivf_numpy.py); every skip must be
listed with its substitute verification in SF1_ORACLE.md or the sweep
claim is unauditable.

Usage: sweep_sf10.py <sfDir> <outDir> [--shards N] [--skip a,b,c]
                     [--mem 20GB] [--timeout 900]
Writes per-shard logs to <outDir>/_sweep_shard<i>.log and a summary
line; exit 0 iff every non-skipped oracle PASSed.
"""
import json
import os
import subprocess
import sys

sfdir, outdir = sys.argv[1], sys.argv[2]
args = sys.argv[3:]


def opt(flag, default):
    return args[args.index(flag) + 1] if flag in args else default


shards = int(opt("--shards", "4"))
skip = set(s for s in opt("--skip", "").split(",") if s)
mem = opt("--mem", "20GB")
timeout = opt("--timeout", "900")
# Total spill budget divided across shards so N concurrent shards
# cannot jointly zero the disk the per-shard cap is meant to protect
# (round-10 advice): e.g. --spill-total 40GB with 4 shards -> 10GB each.
spill_total_gb = float(opt("--spill-total", "40GB").rstrip("GBgb"))
spill_per_shard = f"{max(1, int(spill_total_gb / shards))}GB"

with open(f"{outdir}/oracle_sql.json") as f:
    names = sorted(json.load(f))
run = [n for n in names if n not in skip]
# deterministic round-robin over the sorted names: neighbors in cost
# (alphabetic families) spread across shards
assign = {i: [] for i in range(shards)}
for i, n in enumerate(run):
    assign[i % shards].append(n)

procs = []
tooldir = os.path.dirname(os.path.abspath(__file__))
for i in range(shards):
    spill = f"{outdir}/_spill{i}"
    os.makedirs(spill, exist_ok=True)
    env = dict(os.environ)
    env.update({
        "GRAFT_ORACLE_ONLY": ",".join(assign[i]),
        "GRAFT_DUCKDB_MEMORY": mem,
        "GRAFT_DUCKDB_TEMPDIR": spill,
        "GRAFT_DUCKDB_MAX_TEMP": spill_per_shard,
        "GRAFT_DUCKDB_THREADS": "8",
        "GRAFT_ORACLE_TIMEOUT": timeout,
    })
    log = open(f"{outdir}/_sweep_shard{i}.log", "w")
    procs.append((i, subprocess.Popen(
        [sys.executable, f"{tooldir}/check_oracle.py", sfdir, outdir],
        env=env, stdout=log, stderr=subprocess.STDOUT), log))

codes = {}
for i, p, log in procs:
    codes[i] = p.wait()
    log.close()

# Sets, not lists: multi-line "FAIL name: column ..." detail output
# from check_oracle.py must not inflate the counts (round-10 advice).
passed, failed, timed = set(), set(), set()
for i in range(shards):
    with open(f"{outdir}/_sweep_shard{i}.log") as f:
        for line in f:
            if line.startswith("PASS "):
                passed.add(line.split()[1].rstrip(":"))
            elif line.startswith("FAIL "):
                failed.add(line.split()[1].rstrip(":"))
            elif line.startswith("TIMEOUT "):
                timed.add(line.split()[1].rstrip(":"))
# Coverage accounting (round-10 advice): a shard that dies mid-run
# (OOM-kill, DuckDB native crash) without printing FAIL/TIMEOUT lines
# would otherwise leave its remaining oracles silently unverified.
# Every assigned oracle must be accounted for, and a nonzero shard
# exit with no FAIL/TIMEOUT evidence is itself a sweep failure.
unaccounted = sorted(set(run) - passed - failed - timed)
shard_crashes = []
for i in range(shards):
    if codes.get(i, 0) != 0:
        shard_names = set(assign[i])
        if not (shard_names & (failed | timed)):
            shard_crashes.append(i)
print(f"SWEEP: {len(passed)} PASS, {len(failed)} FAIL, "
      f"{len(timed)} TIMEOUT, {len(skip)} skipped "
      f"(of {len(names)} registered)")
if failed:
    print("failed:", sorted(failed))
if timed:
    print("timed out:", sorted(timed))
if unaccounted:
    print("UNACCOUNTED (shard died without verdicts):", unaccounted)
if shard_crashes:
    print("SHARD CRASH (nonzero exit, no FAIL/TIMEOUT evidence):",
          shard_crashes, "codes:", {i: codes[i] for i in shard_crashes})
summary = {"pass": sorted(passed), "fail": sorted(failed),
           "timeout": sorted(timed), "skip": sorted(skip & set(names)),
           "unaccounted": unaccounted, "shard_exit_codes": codes}
with open(f"{outdir}/_sweep_summary.json", "w") as f:
    json.dump(summary, f, indent=1)
sys.exit(1 if failed or timed or unaccounted or shard_crashes else 0)
