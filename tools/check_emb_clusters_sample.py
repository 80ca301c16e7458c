#!/usr/bin/env python3
"""Layered sampled verification for dedup_embedding_lsh +
embedding_clusters at replica scales where the full DuckDB replay is
an oracle-cost ceiling (the signature CTE evaluates NumBands*bits
hyperplanes x 64 dims for EVERY vector — fine at sf1, past the
45-CPU-minute budget at the 100x replica).

Instead of skipping, verify the pipeline in two sound layers:

Layer 1 — the PAIR relation, sampled bitwise (check_knn_sample.py's
pattern):
  probe set = deterministic sample (vec_id % MOD == 0) + every
  endpoint of an engine-claimed pair; recompute quantized vectors,
  norms and LSH band keys in DuckDB ONLY for the probe set, then:
  A. SCORE EXACTNESS: every claimed (a, b, cos) must equal the DuckDB
     recomputation bit-for-bit and clear the 0.35 threshold;
  B. BUCKET CONSISTENCY: every claimed pair must share >= 1
     (band, bkey) bucket — LSH candidates are bucket-restricted by
     construction;
  C. NO MISSED PAIR: any sampled-x-sampled bucket collision with
     cos >= 0.35 must appear in the claimed pairs — a sound necessary
     condition: a candidate-generation bug that drops pairs lands in
     the sample with probability 1-(1-1/MOD)^2 per dropped pair.

Layer 2 — the CLUSTERS, exact:
  connected components over the (layer-1-verified) claimed pair
  relation are recomputed here with a plain union-find and compared
  EXACTLY against embedding_clusters' (cluster_id = min member,
  n_members, max_member) rows. This is complete, not sampled: any CC
  propagation bug (wrong root, lost member, split/merged component)
  fails the compare regardless of scale.

Usage: check_emb_clusters_sample.py <sfDir> <engineDumpDir> [mod]
Exit 0 = all checks hold.
"""
import sys

import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
MOD = int(sys.argv[3]) if len(sys.argv) > 3 else 97

LSH_NUM_BANDS = 2
LSH_TARGET_OCC = 4
LSH_MIN_BITS = 8
LSH_MAX_BITS = 30

con = duckdb.connect()
con.execute("SET memory_limit='24GB'")
con.execute("SET temp_directory='/tmp/duck_emb_sample'")
con.execute(f"CREATE VIEW emb AS SELECT * FROM '{sfdir}/embeddings.parquet'")
con.execute(
    "CREATE VIEW claimed AS "
    f"SELECT * FROM '{outdir}/dedup_embedding_lsh/*.parquet'")
con.execute(
    "CREATE VIEW clusters AS "
    f"SELECT * FROM '{outdir}/embedding_clusters/*.parquet'")

n = con.sql("SELECT count(*) FROM emb").fetchone()[0]
bits = LSH_MIN_BITS
while bits < LSH_MAX_BITS and (1 << bits) * LSH_TARGET_OCC < n:
    bits += 1

# quantized vectors + exact norms, the engine's vn convention
con.execute("""
CREATE VIEW vn AS
SELECT vec_id, v,
  CAST(list_sum(list_transform(range(1, len(v) + 1),
    i -> v[i] * v[i])) AS BIGINT) nrm
FROM (SELECT vec_id,
  list_transform(embedding,
    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) v
FROM emb)""")

# probe set: the deterministic sample + all claimed-pair endpoints
con.execute(f"""
CREATE TABLE probe AS
SELECT * FROM vn
WHERE vec_id % {MOD} = 0
   OR vec_id IN (SELECT a FROM claimed)
   OR vec_id IN (SELECT b FROM claimed)""")

# LSH band keys for the probe set only (the expensive step, bounded
# by |probe| instead of |vn|) — byte-identical hyperplane convention
con.execute(f"""
CREATE TABLE pbands AS
WITH planes AS (SELECT unnest(range(0, {LSH_NUM_BANDS * bits})) h),
sgn AS (
  SELECT vec_id, h,
    CASE WHEN list_sum(list_transform(range(1, len(v) + 1),
      d -> v[d] * (CASE WHEN ascii(substr(md5(CAST(h AS VARCHAR) || '|' ||
        CAST(d - 1 AS VARCHAR)), 1, 1)) % 2 = 0 THEN 1 ELSE -1 END)))
      > 0 THEN '1' ELSE '0' END sbit
  FROM probe CROSS JOIN planes)
SELECT vec_id, h // {bits} AS band,
  string_agg(sbit, '' ORDER BY h) bkey
FROM sgn GROUP BY vec_id, h // {bits}""")

fails = 0

# A. score exactness for every claimed pair
bad_cos = con.sql("""
SELECT c.a, c.b, c.cos,
  CAST(list_sum(list_transform(range(1, len(x.v) + 1),
    i -> x.v[i] * y.v[i])) AS DOUBLE)
    / sqrt(CAST(x.nrm * y.nrm AS DOUBLE)) want
FROM claimed c JOIN probe x ON c.a = x.vec_id
JOIN probe y ON c.b = y.vec_id
WHERE c.cos <> CAST(list_sum(list_transform(range(1, len(x.v) + 1),
    i -> x.v[i] * y.v[i])) AS DOUBLE)
    / sqrt(CAST(x.nrm * y.nrm AS DOUBLE))
   OR c.cos < 0.35""").fetchall()
for r in bad_cos[:5]:
    print(f"FAIL cos: pair ({r[0]},{r[1]}) claimed {r[2]} recomputed {r[3]}")
fails += len(bad_cos)
print(f"checked cos: {con.sql('SELECT count(*) FROM claimed').fetchone()[0]} "
      f"claimed pairs, {len(bad_cos)} mismatches")

# B. bucket consistency: every claimed pair shares a band bucket
no_bucket = con.sql("""
SELECT c.a, c.b FROM claimed c
WHERE NOT EXISTS (
  SELECT 1 FROM pbands x JOIN pbands y
    ON x.band = y.band AND x.bkey = y.bkey
  WHERE x.vec_id = c.a AND y.vec_id = c.b)""").fetchall()
for r in no_bucket[:5]:
    print(f"FAIL bucket: claimed pair ({r[0]},{r[1]}) shares no band bucket")
fails += len(no_bucket)

# C. no missed pair among the sampled x sampled bucket collisions
missed = con.sql(f"""
WITH scoll AS (
  SELECT DISTINCT x.vec_id a, y.vec_id b
  FROM pbands x JOIN pbands y ON x.band = y.band AND x.bkey = y.bkey
  WHERE x.vec_id < y.vec_id
    AND x.vec_id % {MOD} = 0 AND y.vec_id % {MOD} = 0),
scored AS (
  SELECT s.a, s.b,
    CAST(list_sum(list_transform(range(1, len(x.v) + 1),
      i -> x.v[i] * y.v[i])) AS DOUBLE)
      / sqrt(CAST(x.nrm * y.nrm AS DOUBLE)) cos
  FROM scoll s JOIN probe x ON s.a = x.vec_id JOIN probe y ON s.b = y.vec_id)
SELECT a, b, cos FROM scored
WHERE cos >= 0.35
  AND NOT EXISTS (SELECT 1 FROM claimed c WHERE c.a = scored.a AND c.b = scored.b)
""").fetchall()
for r in missed[:5]:
    print(f"FAIL missed: sampled pair ({r[0]},{r[1]}) cos={r[2]} not claimed")
fails += len(missed)
n_sample = con.sql(
    f"SELECT count(*) FROM probe WHERE vec_id % {MOD} = 0").fetchone()[0]
print(f"checked missed-pair: {n_sample} sampled vectors, "
      f"{len(missed)} missed")

# Layer 2: exact connected components over the claimed pairs
pairs = con.sql("SELECT a, b FROM claimed").fetchall()
parent = {}


def find(x):
    r = x
    while parent.get(r, r) != r:
        r = parent[r]
    while parent.get(x, x) != x:
        parent[x], x = r, parent[x]
    return r


for a, b in pairs:
    ra, rb = find(a), find(b)
    if ra != rb:
        # min-label convention: the smaller id becomes the root
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        parent[hi] = lo

members = {}
for a, b in pairs:
    for v in (a, b):
        members.setdefault(find(v), set()).add(v)

want = sorted(
    (root, len(ms), max(ms)) for root, ms in members.items())
got = sorted(con.sql(
    "SELECT cluster_id, n_members, max_member FROM clusters").fetchall())
if want != got:
    fails += 1
    onlyw = [r for r in want if r not in set(got)][:5]
    onlyg = [r for r in got if r not in set(want)][:5]
    print(f"FAIL clusters: union-find {len(want)} vs engine {len(got)}")
    for r in onlyw:
        print(f"  only-unionfind: {r}")
    for r in onlyg:
        print(f"  only-engine:    {r}")
else:
    print(f"checked clusters: {len(want)} components match exactly "
          "(root=min, n_members, max_member)")

print("RESULT:", "FAIL" if fails else "PASS",
      f"(bits={bits}, probe includes {n_sample} sampled vectors)")
sys.exit(1 if fails else 0)
