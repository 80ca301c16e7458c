#!/usr/bin/env python3
"""Sampled verification for knn_ivf at replica scales where its full
DuckDB truth is an oracle-cost ceiling (the assignment cross join —
every vector x every %53 centroid — spills past free disk at sf10,
while the engine's codegen argmin kernel streams it).

Instead of skipping, verify a deterministic SAMPLE end to end:
  1. recompute centroid assignment in DuckDB ONLY for (a) the 10 query
     vectors, (b) every neighbor the engine claimed, and (c) a
     deterministic probe sample (vec_id % SAMPLE_MOD == 0) — a few
     thousand vectors instead of all of them;
  2. CELL CONSISTENCY: every claimed neighbor must be assigned to its
     query's cell (IVF candidates are cell-restricted by definition);
  3. SCORE EXACTNESS: each claimed (q, neighbor) cosine must equal the
     DuckDB recomputation bit-for-bit (same expression shape);
  4. NO MISSED CANDIDATE: no sampled vector in a query's cell may beat
     the query's claimed rank-3 under the engine's (cos DESC, vec_id)
     order — a sound necessary condition: any engine top-k bug that
     drops a better candidate lands in the sample with probability
     1 - (1-1/MOD)^misses and is caught exactly when sampled.

Usage: check_knn_sample.py <sfDir> <engineDumpDir> [sample_mod]
Exit 0 = all three properties hold for every query point.
"""
import sys

import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
MOD = int(sys.argv[3]) if len(sys.argv) > 3 else 97

con = duckdb.connect()
con.execute("SET memory_limit='24GB'")
con.execute(f"CREATE VIEW emb AS SELECT * FROM '{sfdir}/embeddings.parquet'")
con.execute(
    f"CREATE VIEW claimed AS SELECT * FROM '{outdir}/knn_ivf/*.parquet'")

# Quantized vectors + norms, the engine's vn convention (vectors() in
# Similarity.scala): v_i = round(1000 * raw_i) as BIGINT.
con.execute("""
CREATE VIEW vn AS
SELECT vec_id, v,
  CAST(list_sum(list_transform(range(1, len(v) + 1),
    i -> v[i] * v[i])) AS BIGINT) nrm
FROM (SELECT vec_id,
  list_transform(embedding,
    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) v
FROM emb)""")

# deterministic probe set: queries + claimed neighbors + the sample
con.execute(f"""
CREATE TABLE probe AS
SELECT * FROM vn
WHERE vec_id % {MOD} = 0
   OR vec_id < 10
   OR vec_id IN (SELECT neighbor FROM claimed)""")

# assignment of the probe set against the FULL centroid table
# ((d2, c_id) lexicographic min = the oracle's ROW_NUMBER tie-break)
con.execute("""
CREATE TABLE assigned AS
SELECT vec_id, v, nrm,
  (min({d2:
    CAST(list_sum(list_transform(range(1, len(v) + 1),
      i -> (v[i] - cv[i]) * (v[i] - cv[i]))) AS BIGINT), c: c_id})).c cell
FROM probe
CROSS JOIN (SELECT vec_id c_id, v cv FROM vn WHERE vec_id % 53 = 0)
GROUP BY vec_id, v, nrm""")

fails = 0

# 2. cell consistency: claimed neighbors share their query's cell
bad_cell = con.sql("""
SELECT c.q_id, c.neighbor, aq.cell q_cell, an.cell n_cell
FROM claimed c
JOIN assigned aq ON aq.vec_id = c.q_id
JOIN assigned an ON an.vec_id = c.neighbor
WHERE aq.cell <> an.cell""").fetchall()
for r in bad_cell:
    print(f"FAIL cell: query {r[0]} (cell {r[2]}) claimed neighbor "
          f"{r[1]} from cell {r[3]}")
    fails += 1

# 3. score exactness: recomputed cosine == claimed cosine, bitwise
bad_cos = con.sql("""
SELECT c.q_id, c.neighbor, c.cos,
  CAST(list_sum(list_transform(range(1, len(q.v) + 1),
    i -> q.v[i] * n.v[i])) AS DOUBLE)
    / sqrt(CAST(q.nrm * n.nrm AS DOUBLE)) truth
FROM claimed c
JOIN assigned q ON q.vec_id = c.q_id
JOIN assigned n ON n.vec_id = c.neighbor
WHERE c.cos <> CAST(list_sum(list_transform(range(1, len(q.v) + 1),
    i -> q.v[i] * n.v[i])) AS DOUBLE)
    / sqrt(CAST(q.nrm * n.nrm AS DOUBLE))""").fetchall()
for r in bad_cos:
    print(f"FAIL cos: query {r[0]} neighbor {r[1]} claimed {r[2]} "
          f"recomputed {r[3]}")
    fails += 1

# 4. no missed candidate: a sampled same-cell vector beating the
# worst claimed rank (under cos DESC, vec_id ASC) is a recall bug
missed = con.sql("""
WITH worst AS (
  -- the engine's last-kept row per query under (cos DESC, id ASC)
  SELECT q_id, cos worst_cos, neighbor worst_id
  FROM (SELECT q_id, cos, neighbor, ROW_NUMBER() OVER (
          PARTITION BY q_id ORDER BY cos ASC, neighbor DESC) rn
        FROM claimed)
  WHERE rn = 1),
cand AS (
  SELECT q.vec_id q_id, s.vec_id cand_id,
    CAST(list_sum(list_transform(range(1, len(q.v) + 1),
      i -> q.v[i] * s.v[i])) AS DOUBLE)
      / sqrt(CAST(q.nrm * s.nrm AS DOUBLE)) cos
  FROM assigned q
  JOIN assigned s ON s.cell = q.cell AND s.vec_id <> q.vec_id
  WHERE q.vec_id < 10)
SELECT c.q_id, c.cand_id, c.cos, w.worst_cos
FROM cand c JOIN worst w ON w.q_id = c.q_id
WHERE c.cand_id NOT IN
    (SELECT neighbor FROM claimed WHERE q_id = c.q_id)
  AND (c.cos > w.worst_cos
    OR (c.cos = w.worst_cos AND c.cand_id < w.worst_id))""").fetchall()
for r in missed:
    print(f"FAIL missed candidate: query {r[0]} sampled vector {r[1]} "
          f"(cos {r[2]}) beats claimed worst ({r[3]})")
    fails += 1

n_claimed = con.sql("SELECT count(*) FROM claimed").fetchall()[0][0]
n_probe = con.sql("SELECT count(*) FROM probe").fetchall()[0][0]
print(f"checked {n_claimed} claimed rows against a {n_probe}-vector "
      f"deterministic sample (mod {MOD})")
print("RESULT:", "FAIL" if fails else "PASS")
sys.exit(1 if fails else 0)
