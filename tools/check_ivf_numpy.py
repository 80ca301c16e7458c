#!/usr/bin/env python3
"""EXACT full-truth verification for ivf_balance at replica scales
where the DuckDB oracle is a cost ceiling: the oracle materializes the
N x N/53 assignment cross join (4.7B rows at sf10) because SQL has no
argmin kernel; per-cell counts then need EVERY vector's assignment, so
the sampled-probe pattern cannot bound the work — but dense linear
algebra can.

This is NOT a sampled check: it recomputes the complete assignment,
exactly, via blocked GEMM:

    d2(x, c) = |x|^2 + |c|^2 - 2 x.c

over the oracle's quantized integer vectors. Every term is an integer
below 2^53, so float64 arithmetic is EXACT (no rounding anywhere),
and the argmin per row with columns ordered by c_id reproduces the
oracle's (d2, c_id) tie-break bit-for-bit. ~300 Gflop at sf10 — a
minute of BLAS instead of 4.7B spilled rows.

Quantization matches DuckDB's round() (half away from zero), not
numpy's round() (half to even).

Checks:
  1. per-cell counts and share_ppm equal the engine's ivf_balance rows
     EXACTLY (full truth, every vector assigned);
  2. total vectors accounted (sum of counts == N);
  3. as a bonus the knn_ivf dump's implied cells are re-validated:
     every claimed neighbor must land in its query's cell.

Usage: check_ivf_numpy.py <sfDir> <engineDumpDir> [blockRows]
Exit 0 = exact match.
"""
import sys

import duckdb
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
BLOCK = int(sys.argv[3]) if len(sys.argv) > 3 else 20000

con = duckdb.connect()
emb = con.sql(
    f"SELECT vec_id, embedding FROM '{sfdir}/embeddings.parquet' "
    "ORDER BY vec_id").fetchnumpy()
vec_ids = emb["vec_id"].astype(np.int64)
raw = np.array([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
n, dim = raw.shape
print(f"{n} vectors x {dim} dims")

# DuckDB round(): half away from zero; numpy rounds half to even
v = np.sign(raw) * np.floor(np.abs(raw) * 1000.0 + 0.5)

cent_mask = (vec_ids % 53) == 0
c_ids = vec_ids[cent_mask]            # ascending (ORDER BY vec_id)
C = v[cent_mask]
print(f"{len(c_ids)} centroids")

c_nrm = (C * C).sum(axis=1)           # exact: integers < 2^53
assign = np.empty(n, dtype=np.int64)
for s in range(0, n, BLOCK):
    X = v[s:s + BLOCK]
    d2 = (X * X).sum(axis=1)[:, None] + c_nrm[None, :] - 2.0 * (X @ C.T)
    # argmin returns the FIRST minimal column; columns are in c_id
    # order, reproducing the oracle's (d2, c_id) tie-break
    assign[s:s + BLOCK] = c_ids[np.argmin(d2, axis=1)]

cells, counts = np.unique(assign, return_counts=True)
tot = int(counts.sum())
assert tot == n
truth = {int(c): int(k) for c, k in zip(cells, counts)}

claimed = con.sql(
    f"SELECT cell, n_vecs, share_ppm FROM '{outdir}/ivf_balance/*.parquet' "
    "ORDER BY cell").fetchall()
bad = 0
seen = set()
for cell, n_vecs, share_ppm in claimed:
    seen.add(cell)
    want = truth.get(cell)
    if want != n_vecs or share_ppm != (n_vecs * 1000000) // tot:
        print(f"MISMATCH cell {cell}: claimed n_vecs {n_vecs} "
              f"share {share_ppm}, recomputed {want} "
              f"{(want or 0) * 1000000 // tot}")
        bad += 1
for cell, k in truth.items():
    if cell not in seen:
        print(f"MISSING cell {cell} ({k} vectors) absent from the "
              "engine result")
        bad += 1

# bonus: knn_ivf claimed neighbors must share their query's cell
cell_of = dict(zip(vec_ids.tolist(), assign.tolist()))
knn = con.sql(
    f"SELECT * FROM '{outdir}/knn_ivf/*.parquet'").fetchall()
knn_cols = [d[0] for d in con.sql(
    f"SELECT * FROM '{outdir}/knn_ivf/*.parquet' LIMIT 0").description]
qi, ni = knn_cols.index("q_id"), knn_cols.index("neighbor")
for r in knn:
    if cell_of[r[qi]] != cell_of[r[ni]]:
        print(f"KNN CELL MISMATCH q{r[qi]} neighbor {r[ni]}: "
              f"{cell_of[r[qi]]} vs {cell_of[r[ni]]}")
        bad += 1

print(f"verified {len(claimed)} cells over {tot} exact assignments "
      f"+ {len(knn)} knn_ivf cell rows")
if bad:
    print(f"RESULT: FAIL ({bad} mismatches)")
    sys.exit(1)
print("RESULT: PASS")
