#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL
from <outDir>/oracle_sql.json in DuckDB over the sf parquet tables and
compare (schema-insensitive to column order: columns sorted by name,
rows compared as written) against the Spark parquet dumps in <outDir>.

Usage: check_oracle.py <sfDir> <outDir>
"""
import json
import math
import os
import sys
import threading

import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]

# Optional env knobs for the BIG-replica sweeps (sf1/sf10): the heavy
# window/CTE oracles need an explicit spill dir + memory ceiling, and a
# per-query wall budget keeps one runaway oracle (the knn_ivf
# disk-fill class) from eating the session. All default OFF — the
# driver-shaped invocation is byte-identical without them.
MEMORY = os.environ.get("GRAFT_DUCKDB_MEMORY")
TEMPDIR = os.environ.get("GRAFT_DUCKDB_TEMPDIR")
THREADS = os.environ.get("GRAFT_DUCKDB_THREADS")
# cap the spill dir so one ceiling-class oracle dies with a clean
# out-of-temp error instead of zeroing the whole disk and taking
# concurrently-running replays down with it (observed at the sf10
# sweep: the wedge-join oracle filled 64 GB and starved its neighbors)
MAX_TEMP = os.environ.get("GRAFT_DUCKDB_MAX_TEMP")
TIMEOUT = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "0") or 0)
SKIP = set(
    s for s in os.environ.get("GRAFT_ORACLE_SKIP", "").split(",") if s)
ONLY = set(
    s for s in os.environ.get("GRAFT_ORACLE_ONLY", "").split(",") if s)


def connect():
    # a FRESH connection per query: one shared connection accumulates
    # enough state across ~160 oracle runs that late queries slow to
    # a crawl (observed 70+ min for a suite whose per-query fresh-
    # connection total is ~5 min)
    c = duckdb.connect()
    if MEMORY:
        c.execute(f"SET memory_limit='{MEMORY}'")
    if TEMPDIR:
        c.execute(f"SET temp_directory='{TEMPDIR}'")
    if MAX_TEMP:
        c.execute(f"SET max_temp_directory_size='{MAX_TEMP}'")
    if THREADS:
        c.execute(f"SET threads={int(THREADS)}")
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    return c

with open(f"{outdir}/oracle_sql.json") as f:
    oracles = json.load(f)


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


fails = 0
timeouts = 0
checked = 0
skipped = 0
for name, sql in sorted(oracles.items()):
    if name in SKIP or (ONLY and name not in ONLY):
        skipped += 1
        if name in SKIP:
            print(f"SKIP {name}: named oracle-cost exception")
        continue
    checked += 1
    con = connect()
    timer = None
    if TIMEOUT:
        timer = threading.Timer(TIMEOUT, con.interrupt)
        timer.daemon = True
        timer.start()
    try:
        spark_rel = con.sql(
            f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        spark_cols = sorted(spark_rel.columns)
        spark_rows = con.sql(
            "SELECT " + ", ".join(f'"{c}"' for c in spark_cols) +
            f" FROM '{outdir}/{name}/*.parquet'").fetchall()
    except Exception as e:
        print(f"FAIL {name}: spark output unreadable: {e}")
        fails += 1
        if timer:
            timer.cancel()
        continue
    try:
        duck_rel = con.sql(sql)
        duck_cols = sorted(duck_rel.columns)
        duck_rows = con.sql(
            "SELECT " + ", ".join(f'"{c}"' for c in duck_cols) +
            f" FROM ({sql})").fetchall()
    except duckdb.InterruptException:
        print(f"TIMEOUT {name}: oracle exceeded {TIMEOUT}s wall budget")
        timeouts += 1
        continue
    except Exception as e:
        msg = str(e)
        if timer is not None and "INTERRUPT" in msg.upper():
            print(f"TIMEOUT {name}: oracle exceeded {TIMEOUT}s wall budget")
            timeouts += 1
        else:
            print(f"FAIL {name}: oracle sql failed: {e}")
            fails += 1
        if timer:
            timer.cancel()
        continue
    finally:
        if timer:
            timer.cancel()
    if spark_cols != duck_cols:
        print(f"FAIL {name}: columns spark={spark_cols} duck={duck_cols}")
        fails += 1
        continue
    # The driver's hash is TYPE-sensitive: DuckDB SUM(BIGINT) yields
    # HUGEINT (int128) where Spark emits BIGINT, and the values hash
    # differently even when equal. Compare the DuckDB-visible column
    # types of both sides (in sorted-column order) and fail on any
    # mismatch so this replica predicts the driver.
    spark_types = dict(zip(spark_rel.columns,
                           (str(t) for t in spark_rel.types))
                       )
    duck_types = dict(zip(duck_rel.columns,
                          (str(t) for t in duck_rel.types)))
    type_diffs = [
        (c, spark_types[c], duck_types[c])
        for c in spark_cols if spark_types[c] != duck_types[c]]
    if type_diffs:
        fails += 1
        for c, st, dt in type_diffs:
            print(f"FAIL {name}: column '{c}' type spark={st} duck={dt}")
        continue
    sr = [tuple(canon(v) for v in r) for r in spark_rows]
    dr = [tuple(canon(v) for v in r) for r in duck_rows]
    if sr == dr:
        print(f"PASS {name}: {len(sr)} rows")
    else:
        fails += 1
        print(f"FAIL {name}: spark {len(sr)} rows vs duck {len(dr)} rows")
        only_s = [r for r in sr if r not in set(dr)][:3]
        only_d = [r for r in dr if r not in set(sr)][:3]
        if not only_s and not only_d and sr != dr:
            # same multiset, different order
            for i, (a, b) in enumerate(zip(sr, dr)):
                if a != b:
                    print(f"  first order diff at row {i}: spark={a} duck={b}")
                    break
        for r in only_s:
            print(f"  only-spark: {r}")
        for r in only_d:
            print(f"  only-duck:  {r}")

if timeouts:
    print(f"TIMEOUTS: {timeouts} (wall budget {TIMEOUT}s — rerun "
          "individually with a bigger budget or record a named "
          "oracle-cost exception)")
coverage = f"({checked} checked"
if skipped:
    coverage += f", {skipped} SKIPPED of {len(oracles)} registered"
coverage += ")"
print("RESULT:", "FAIL" if fails else "PASS", coverage)
sys.exit(1 if fails or timeouts else 0)
