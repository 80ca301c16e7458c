#!/usr/bin/env python3
"""EXACT replica-reduction verification for the graph family at
replica scales where the DuckDB oracle is a cost ceiling (the
co-occurrence self-join alone is ~3.6B pair rows at the 1000x
replica).

Soundness: make_sf1.py replicas are DISJOINT identical subgraphs —
every key column offsets by replica*STRIDE consistently across
fact/dim pairs, so no join edge ever crosses replicas and each
replica's derived graph (trade edges, co-occurrence edges, degrees,
triangles, ranks, HITS scores — including the per-half-step global
max, which every replica attains identically) equals the sf0.1 graph
under key translation. Hence the FULL per-node metric relation at a
replica scale is exactly the sf0.1 full relation expanded by
  node' = node + i*STRIDE   (i in 0..reps-1)
with every metric column unchanged, and the query's final
deterministic sort+limit applied to the expanded relation. DuckDB
computes the sf0.1 full relation (cheap — the oracle SQL minus its
final top-k), the expansion and the top-k; the result must equal the
engine's big-replica dump EXACTLY (values compared as canonical
reprs, columns sorted by name — the driver gate's compare).

This is a TRUTH REDUCTION, not a sampled check: if the engine's
big-replica output differs anywhere from the reduced truth — a key
overflow, a cross-replica collision, a tie-break drift, a lost
replica — the compare fails.

degree_assortativity reduces specially: its exact int64 moments
(n, sx, sxx, sxy) each scale by exactly `reps`, and the final double
is recomputed here with the same IEEE-754 expression the engine
evaluates (numpy float64 == JVM double, both correctly rounded), so
the expected row is bit-exact.

Usage: check_replica_local.py <sf01Dir> <bigDumpDir> <replicas>
         [names,comma,separated]
Exit 0 = every checked query matches exactly.
"""
import json
import math
import sys

import duckdb
import numpy as np

sf01, outdir = sys.argv[1], sys.argv[2]
REPS = int(sys.argv[3])
ONLY = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
STRIDE = 10_000_000  # make_sf1.py's key offset

# name -> (key columns to offset by i*STRIDE, final ORDER BY over
# OUTPUT column names, LIMIT, optional per-kind window limit)
SPECS = {
    "pagerank": (["entity"], "rank_ppm DESC, entity, kind", 25, None),
    "triangle_count": (["suppkey"], "n_tri DESC, suppkey", 25, None),
    "clustering_coefficient": (["suppkey"], "cc_ppm DESC, suppkey", 25, None),
    "clustering_coeff": (["suppkey"], "cc_ppm DESC, suppkey", 25, None),
    "node_similarity": (["x", "y"], "jacc_ppm DESC, x, y", 25, None),
    # hits: top 15 PER KIND (hub/authority), then the final panel sort
    "hits": (["entity"], "kind, score_ppm DESC, entity", None,
             ("kind", "score_ppm DESC, entity", 15)),
}


def connect(views_dir):
    c = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{views_dir}/{t}.parquet'")
    return c


def canon(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return repr(v)


with open(f"{outdir}/oracle_sql.json") as f:
    oracles = json.load(f)

fails = 0
checked = 0


def compare(name, expect_cols, expect_rows, got_rel):
    """Driver-gate compare: columns sorted by name, canonical reprs."""
    global fails
    got_cols = sorted(got_rel.columns)
    if got_cols != sorted(expect_cols):
        print(f"FAIL {name}: columns {got_cols} != {sorted(expect_cols)}")
        fails += 1
        return
    order = [expect_cols.index(c) for c in sorted(expect_cols)]
    exp = [tuple(canon(r[i]) for i in order) for r in expect_rows]
    got = [tuple(canon(v) for v in r)
           for r in got_rel.project(
               ", ".join(f'"{c}"' for c in got_cols)).fetchall()]
    if exp != got:
        print(f"FAIL {name}: {len(exp)} expected vs {len(got)} rows; "
              f"first diff: "
              f"{next(((a, b) for a, b in zip(exp, got) if a != b), 'length')}")
        fails += 1
    else:
        print(f"PASS {name} ({len(got)} rows, replica-reduced truth)")


for name in sorted(SPECS):
    if ONLY is not None and name not in ONLY:
        continue
    if name not in oracles:
        print(f"FAIL {name}: not in {outdir}/oracle_sql.json")
        fails += 1
        continue
    checked += 1
    sql = oracles[name]
    keys, order, limit, perkind = SPECS[name]
    con = connect(sf01)
    if name == "hits":
        # the oracle's top-k lives inside the th/ta CTEs — swap the
        # tail for the FULL hub+authority panels
        assert sql.count("th AS") == 1, "hits oracle shape changed"
        body = sql.split("th AS")[0] + (
            "th AS (SELECT 'hub' AS kind, node // 2 AS entity, x FROM h2),\n"
            "ta AS (SELECT 'authority' AS kind, node // 2 AS entity, x "
            "FROM a2)\n"
            "SELECT kind, entity, x AS score_ppm\n"
            "FROM (SELECT * FROM th UNION ALL SELECT * FROM ta) u")
    else:
        assert sql.count("ORDER BY") >= 1
        body, tail = sql.rsplit("ORDER BY", 1)
        assert "LIMIT" in tail, f"{name}: expected a final top-k, got {tail!r}"
    full = con.sql(body)
    cols = full.columns
    sel = ", ".join(
        f"{c} + r.i * {STRIDE} AS {c}" if c in keys else c for c in cols)
    exp_sql = (f"SELECT {sel} FROM full_rel, "
               f"(SELECT unnest(range({REPS})) AS i) r")
    if perkind:
        part, ord_in, k = perkind
        exp_sql = (f"SELECT {', '.join(cols)} FROM (SELECT *, row_number() "
                   f"OVER (PARTITION BY {part} ORDER BY {ord_in}) AS rn "
                   f"FROM ({exp_sql})) WHERE rn <= {k}")
    exp_sql += f" ORDER BY {order}"
    if limit:
        exp_sql += f" LIMIT {limit}"
    con.execute(f"CREATE TEMP TABLE full_rel AS {body}")
    expect = con.sql(exp_sql)
    expect_cols, expect_rows = expect.columns, expect.fetchall()
    compare(name, expect_cols, expect_rows,
            con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'"))

# degree_assortativity: exact moment scaling + the engine's own IEEE
# expression over the scaled moments
if (ONLY is None or "degree_assortativity" in ONLY):
    name = "degree_assortativity"
    checked += 1
    sql = oracles[name]
    anchor = "SELECT n // 2 n_edges"
    assert sql.count(anchor) == 1, "assortativity oracle shape changed"
    body = sql.split(anchor)[0] + "SELECT n, sx, sxx, sxy FROM m"
    con = connect(sf01)
    n, sx, sxx, sxy = con.sql(body).fetchall()[0]
    n, sx, sxx, sxy = (REPS * n, REPS * sx, REPS * sxx, REPS * sxy)
    for v in (n, sx, sxx, sxy):
        assert abs(v) < 2**53, "moment exceeds exact-double range"
    nD, sxD, sxxD, sxyD = (np.float64(v) for v in (n, sx, sxx, sxy))
    den = nD * sxxD - sxD * sxD
    r = None if den == 0 else float((nD * sxyD - sxD * sxD) / den)
    compare(name, ["n_edges", "assortativity"], [(n // 2, r)],
            con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'"))

print(f"REPLICA-LOCAL SUMMARY checked={checked} fails={fails} reps={REPS}")
sys.exit(1 if fails else 0)
