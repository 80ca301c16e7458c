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
        "GRAFT_DUCKDB_MAX_TEMP": "15GB",
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

passed, failed, timed = [], [], []
for i in range(shards):
    with open(f"{outdir}/_sweep_shard{i}.log") as f:
        for line in f:
            if line.startswith("PASS "):
                passed.append(line.split()[1].rstrip(":"))
            elif line.startswith("FAIL "):
                failed.append(line.split()[1].rstrip(":"))
            elif line.startswith("TIMEOUT "):
                timed.append(line.split()[1].rstrip(":"))
print(f"SWEEP: {len(passed)} PASS, {len(failed)} FAIL, "
      f"{len(timed)} TIMEOUT, {len(skip)} skipped "
      f"(of {len(names)} registered)")
if failed:
    print("failed:", sorted(failed))
if timed:
    print("timed out:", sorted(timed))
summary = {"pass": sorted(passed), "fail": sorted(failed),
           "timeout": sorted(timed), "skip": sorted(skip & set(names))}
with open(f"{outdir}/_sweep_summary.json", "w") as f:
    json.dump(summary, f, indent=1)
sys.exit(1 if failed or timed else 0)
