#!/usr/bin/env python3
"""Sampled verification for knn_pq (flat product quantization, no IVF)
at replica scales where its full DuckDB truth is an oracle-cost
ceiling: the oracle codes EVERY vector against EVERY %97 seed codeword
(4N x N/97 rows — 10.6B at sf10) before scanning all reconstructions
per query. The engine streams the coding through a broadcast argmin
kernel; DuckDB spills past free disk.

check_pq_sample.py's pattern, minus the IVF cell layer (flat PQ scans
every vector, so there is no cell-consistency property):

  probe set = the 10 query vectors + every claimed neighbor + a
  deterministic sample (vec_id % MOD == 0; MOD defaults to 101,
  deliberately coprime with the %97 seed selection so the sample is
  not the codebook) + ALL %97 seeds (they ARE the codebook).

  1. ADC EXACTNESS: each claimed (q, neighbor, ad2) must equal the
     bit-for-bit recomputation — per-subspace nearest codeword
     (d2 then c_id tie-break), reconstruction, integer squared
     distance to the RAW query vector (flat PQ scores against qv,
     not a residual);
  2. NO MISSED CANDIDATE: no sampled vector may beat a query's
     claimed rank-3 under (ad2, vec_id) — flat PQ candidates are ALL
     vectors, so every sampled vector is a candidate; an engine bug
     that drops a better one is caught exactly when it is sampled
     (probability 1-(1-1/MOD)^misses).

Usage: check_flatpq_sample.py <sfDir> <engineDumpDir> [sample_mod]
Exit 0 = both properties hold for every claimed row.
"""
import sys

import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
MOD = int(sys.argv[3]) if len(sys.argv) > 3 else 101

con = duckdb.connect()
con.execute("SET memory_limit='24GB'")
con.execute("SET temp_directory='/tmp/duck_spill_fpq'")
con.execute("SET max_temp_directory_size='40GB'")
con.execute(
    f"CREATE VIEW emb AS SELECT * FROM '{sfdir}/embeddings.parquet'")
con.execute(
    f"CREATE VIEW claimed AS SELECT * FROM '{outdir}/knn_pq/*.parquet'")

con.execute("""
CREATE TEMP TABLE vn AS
SELECT vec_id,
  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000)
                                      AS BIGINT)) v
FROM emb""")
con.execute("""
CREATE TEMP TABLE cb AS
SELECT vec_id c_id, j, list_slice(v, j*16+1, (j+1)*16) cv
FROM vn, unnest([0, 1, 2, 3]) t(j)
WHERE vec_id % 97 = 0""")

con.execute(f"""
CREATE TEMP TABLE probe AS
SELECT vec_id, v FROM vn
WHERE vec_id < 10
   OR vec_id % {MOD} = 0
   OR vec_id IN (SELECT neighbor FROM claimed)""")
n_probe = con.sql("SELECT count(*) FROM probe").fetchone()[0]
n_cb = con.sql("SELECT count(DISTINCT c_id) FROM cb").fetchone()[0]
print(f"coding {n_probe} probe vectors against {n_cb} codewords")

con.execute("""
CREATE TEMP TABLE codes AS
SELECT vec_id, j, c_id FROM (
  SELECT sv.vec_id, sv.j, cb.c_id,
    ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.j ORDER BY
      list_sum(list_transform(range(1, 17),
        i -> (sub[i] - cv[i]) * (sub[i] - cv[i]))), cb.c_id) rn
  FROM (SELECT vec_id, list_slice(v, j*16+1, (j+1)*16) sub, j
        FROM probe, unnest([0, 1, 2, 3]) t(j)) sv
  JOIN cb ON sv.j = cb.j) WHERE rn = 1""")
rows = con.sql("""
WITH recon AS (
  SELECT codes.vec_id, flatten(list(cv ORDER BY codes.j)) rv
  FROM codes JOIN cb ON codes.j = cb.j AND codes.c_id = cb.c_id
  GROUP BY codes.vec_id),
q AS (SELECT vec_id q_id, v qv FROM vn WHERE vec_id < 10)
SELECT q.q_id, recon.vec_id,
  CAST(list_sum(list_transform(range(1, 65),
    i -> (qv[i] - rv[i]) * (qv[i] - rv[i]))) AS BIGINT) ad2
FROM recon CROSS JOIN q WHERE recon.vec_id <> q.q_id""").fetchall()
score = {(q, v): a for q, v, a in rows}

claims = con.sql(
    "SELECT q_id, rnk, neighbor, ad2 FROM claimed ORDER BY q_id, rnk"
).fetchall()
worst = {}
bad = 0
for q_id, rnk, neighbor, ad2 in claims:
    got = score.get((q_id, neighbor))
    if got != ad2:
        print(f"ADC MISMATCH q{q_id} neighbor {neighbor}: claimed {ad2}, "
              f"recomputed {got}")
        bad += 1
    w = worst.get(q_id)
    if w is None or (ad2, neighbor) > w:
        worst[q_id] = (ad2, neighbor)

claimed_set = set((q, n) for q, _, n, _ in claims)
for (q_id, vec_id), ad2 in score.items():
    if (q_id, vec_id) in claimed_set or q_id not in worst:
        continue
    if (ad2, vec_id) < worst[q_id]:
        print(f"MISSED CANDIDATE q{q_id}: sampled vector {vec_id} "
              f"(ad2 {ad2}) beats claimed rank-3 {worst[q_id]}")
        bad += 1

n_cand = sum(1 for k in score if k not in claimed_set)
print(f"checked {len(claims)} claimed rows; {n_cand} sampled "
      f"candidate scores across {len(worst)} queries (mod {MOD})")
if bad:
    print(f"RESULT: FAIL ({bad} mismatches)")
    sys.exit(1)
print("RESULT: PASS")
