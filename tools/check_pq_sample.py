#!/usr/bin/env python3
"""Sampled verification for knn_ivf_pq at replica scales where its
full DuckDB truth is an oracle-cost ceiling: the oracle assigns EVERY
vector to its nearest %53 centroid (N x N/53 cross join — 4.7B rows at
sf10) and then codes every residual against EVERY %97 seed codeword
(4N x N/97 — 10.6B rows). The engine streams both through broadcast
argmin kernels; DuckDB spills past free disk.

The per-VECTOR work is bounded, so the check_knn_sample.py pattern
extends through the PQ layer:

  probe set = the 10 query vectors + every claimed neighbor + a
  deterministic sample (vec_id % MOD == 0) + ALL %97 seeds (the
  codebook is built from seed residuals, and seeds need their own cell
  assignment first) — a few thousand assignments instead of N.

  1. CELL CONSISTENCY: every claimed neighbor's recomputed cell must
     equal its query's recomputed cell (IVF-PQ candidates are
     cell-restricted by construction);
  2. ADC EXACTNESS: each claimed (q, neighbor, ad2) must equal the
     bit-for-bit recomputation — cell centroid, residual, per-subspace
     nearest codeword (d2 then c_id tie-break), reconstruction,
     integer squared distance — the oracle's exact integer pipeline;
  3. NO MISSED CANDIDATE: no sampled vector recomputed into a query's
     cell may beat the query's claimed rank-3 under (ad2, vec_id) —
     sound and necessary: an engine bug that drops a better candidate
     is caught exactly when the dropped vector is sampled
     (probability 1-(1-1/MOD)^misses).

Usage: check_pq_sample.py <sfDir> <engineDumpDir> [sample_mod]
Exit 0 = all three properties hold for every claimed row.
"""
import sys

import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
MOD = int(sys.argv[3]) if len(sys.argv) > 3 else 97

con = duckdb.connect()
con.execute("SET memory_limit='24GB'")
con.execute("SET temp_directory='/tmp/duck_spill_pq'")
con.execute("SET max_temp_directory_size='40GB'")
con.execute(
    f"CREATE VIEW emb AS SELECT * FROM '{sfdir}/embeddings.parquet'")
con.execute(
    f"CREATE VIEW claimed AS SELECT * FROM '{outdir}/knn_ivf_pq/*.parquet'")

# quantized vectors, the oracle's convention
con.execute("""
CREATE TEMP TABLE vn AS
SELECT vec_id,
  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000)
                                      AS BIGINT)) v
FROM emb""")
con.execute(
    "CREATE TEMP TABLE cents AS SELECT vec_id c_id, v cv FROM vn "
    "WHERE vec_id % 53 = 0")

# probe = queries + claimed neighbors + deterministic sample + seeds
con.execute(f"""
CREATE TEMP TABLE probe AS
SELECT vec_id, v FROM vn
WHERE vec_id < 10
   OR vec_id % {MOD} = 0
   OR vec_id % 97 = 0
   OR vec_id IN (SELECT neighbor FROM claimed)""")
n_probe = con.sql("SELECT count(*) FROM probe").fetchone()[0]
n_cents = con.sql("SELECT count(*) FROM cents").fetchone()[0]
print(f"assigning {n_probe} probe vectors against {n_cents} centroids")

# nearest-centroid assignment for the probe set only (the oracle's
# exact argmin: d2 then c_id)
con.execute("""
CREATE TEMP TABLE assigned AS
SELECT vec_id, v, cell FROM (
  SELECT p.vec_id, p.v, c.c_id cell,
    ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
      CAST(list_sum(list_transform(range(1, len(p.v) + 1),
        i -> (p.v[i] - c.cv[i]) * (p.v[i] - c.cv[i]))) AS BIGINT),
      c.c_id) arn
  FROM probe p CROSS JOIN cents c) WHERE arn = 1""")
con.execute("""
CREATE TEMP TABLE resid AS
SELECT a.vec_id, a.cell,
  list_transform(range(1, len(a.v) + 1), i -> a.v[i] - c.cv[i]) r
FROM assigned a JOIN cents c ON a.cell = c.c_id""")

# codebook from seed residuals (seeds are all in the probe set)
con.execute("""
CREATE TEMP TABLE cb AS
SELECT vec_id c_id, j, list_slice(r, j*16+1, (j+1)*16) cv
FROM resid, unnest([0, 1, 2, 3]) t(j)
WHERE vec_id % 97 = 0""")
n_cb = con.sql("SELECT count(DISTINCT c_id) FROM cb").fetchone()[0]
print(f"codebook: {n_cb} codewords x 4 subspaces")

# per-subspace nearest codeword for every probe residual
con.execute("""
CREATE TEMP TABLE codes AS
SELECT vec_id, j, c_id FROM (
  SELECT sv.vec_id, sv.j, cb.c_id,
    ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.j ORDER BY
      list_sum(list_transform(range(1, 17),
        i -> (sub[i] - cv[i]) * (sub[i] - cv[i]))), cb.c_id) rn
  FROM (SELECT vec_id, list_slice(r, j*16+1, (j+1)*16) sub, j
        FROM resid, unnest([0, 1, 2, 3]) t(j)) sv
  JOIN cb ON sv.j = cb.j) WHERE rn = 1""")
con.execute("""
CREATE TEMP TABLE recon AS
SELECT codes.vec_id, flatten(list(cv ORDER BY codes.j)) rr
FROM codes JOIN cb ON codes.j = cb.j AND codes.c_id = cb.c_id
GROUP BY codes.vec_id""")

# exact ADC distance of every probe vector to every query, in-cell
rows = con.sql("""
WITH q AS (SELECT vec_id q_id, cell q_cell, r qr FROM resid
           WHERE vec_id < 10)
SELECT q.q_id, a.vec_id, a.cell, q.q_cell,
  CAST(list_sum(list_transform(range(1, 65),
    i -> (qr[i] - rr[i]) * (qr[i] - rr[i]))) AS BIGINT) ad2
FROM recon rc
JOIN assigned a ON rc.vec_id = a.vec_id
CROSS JOIN q
WHERE a.vec_id <> q.q_id""").fetchall()
score = {}
cell_of = {}
for q_id, vec_id, cell, q_cell, ad2 in rows:
    cell_of[vec_id] = cell
    cell_of[q_id] = q_cell
    if cell == q_cell:
        score[(q_id, vec_id)] = ad2

claims = con.sql(
    "SELECT q_id, rnk, neighbor, ad2 FROM claimed ORDER BY q_id, rnk"
).fetchall()
worst = {}  # q_id -> (ad2, neighbor) of the claimed worst rank
bad = 0
for q_id, rnk, neighbor, ad2 in claims:
    got = score.get((q_id, neighbor))
    if got is None:
        print(f"CELL MISMATCH q{q_id} neighbor {neighbor}: recomputed "
              f"cell {cell_of.get(neighbor)} != query cell "
              f"{cell_of.get(q_id)}")
        bad += 1
        continue
    if got != ad2:
        print(f"ADC MISMATCH q{q_id} neighbor {neighbor}: claimed {ad2}, "
              f"recomputed {got}")
        bad += 1
    w = worst.get(q_id)
    if w is None or (ad2, neighbor) > w:
        worst[q_id] = (ad2, neighbor)

claimed_set = set((q, n) for q, _, n, _ in claims)
missed = 0
for (q_id, vec_id), ad2 in score.items():
    if (q_id, vec_id) in claimed_set or q_id not in worst:
        continue
    if (ad2, vec_id) < worst[q_id]:
        print(f"MISSED CANDIDATE q{q_id}: sampled vector {vec_id} "
              f"(ad2 {ad2}) beats claimed rank-3 {worst[q_id]}")
        missed += 1
bad += missed

in_cell = sum(1 for (q, v) in score if (q, v) not in claimed_set)
print(f"checked {len(claims)} claimed rows; {in_cell} sampled "
      f"in-cell candidates across {len(worst)} queries (mod {MOD})")
if bad:
    print(f"RESULT: FAIL ({bad} mismatches)")
    sys.exit(1)
print("RESULT: PASS")
