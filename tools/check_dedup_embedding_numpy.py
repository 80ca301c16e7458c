#!/usr/bin/env python3
"""EXACT full-truth verification for dedup_embedding at replica scales
where the DuckDB oracle is a wall-clock ceiling: the label-blocked
all-pairs cosine runs ~2B interpreted list_transform dot products at
sf10 (>30 min), while dense BLAS does the same arithmetic in seconds.

NOT sampled: recomputes EVERY within-label pair with one GEMM per
label block. All quantized terms are integers below 2^53 (dots and
norm products included), so float64 arithmetic is bit-exact, and the
cosine (exact-int dot as double) / sqrt(exact-int norm product as
double) is the same two IEEE operations both engines evaluate —
pairs straddling the 0.35 threshold cannot diverge.

Checks:
  1. every claimed (label, a, b, cos) row matches the recomputed pair
     set bit-for-bit (cos included);
  2. no recomputed pair with cos >= 0.35 is missing from the claim
     (full-truth completeness, not rank dominance).

Usage: check_dedup_embedding_numpy.py <sfDir> <engineDumpDir>
Exit 0 = exact match both directions.
"""
import sys

import duckdb
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
emb = con.sql(
    f"SELECT vec_id, label, embedding FROM '{sfdir}/embeddings.parquet' "
    "ORDER BY vec_id").fetchnumpy()
vec_ids = emb["vec_id"].astype(np.int64)
labels = emb["label"]
raw = np.array([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
n, dim = raw.shape
print(f"{n} vectors x {dim} dims")

# DuckDB round(): half away from zero. Known edge (round-10 advice):
# floor(|x|*1000+0.5) is not strictly identical to decimal-string
# HALF_UP at binary-representability boundaries where IEEE addition
# rounds |x|*1000+0.5 up (e.g. 0.49999999999999994+0.5 == 1.0). The
# divergence direction is a spurious MISMATCH (false FAIL), never a
# false PASS — if a mismatch ever reports a cos differing only at the
# last quantized digit, recompute the quantization in DuckDB before
# blaming the engine.
v = np.sign(raw) * np.floor(np.abs(raw) * 1000.0 + 0.5)
nrm = (v.astype(np.int64) ** 2).sum(axis=1)

truth = {}
BLOCK = 8192
for lab in np.unique(labels):
    idx = np.nonzero(labels == lab)[0]
    ids = vec_ids[idx]
    X = v[idx]
    nn = nrm[idx]
    m = len(idx)
    for s in range(0, m, BLOCK):
        dots = X[s:s + BLOCK] @ X.T                 # exact: < 2^53
        denom = np.sqrt((nn[s:s + BLOCK, None] * nn[None, :])
                        .astype(np.float64))
        cos = dots / denom
        ii, jj = np.nonzero(cos >= 0.35)
        for i, j in zip(ii.tolist(), jj.tolist()):
            a, b = int(ids[s + i]), int(ids[j])
            if a < b:
                truth[(a, b)] = (str(lab), float(cos[i, j]))
print(f"{len(truth)} recomputed pairs >= 0.35")

claimed = con.sql(
    f"SELECT label, a, b, cos FROM '{outdir}/dedup_embedding/*.parquet' "
    "ORDER BY a, b").fetchall()
bad = 0
seen = set()
for lab, a, b, cos in claimed:
    # Duplicate claimed rows are a FAIL: the full-oracle row-list
    # comparison this substitutes for would reject them (e.g. leftover
    # retried part-files matched by the *.parquet glob).
    if (a, b) in seen:
        print(f"MISMATCH: duplicate claimed pair ({a},{b})")
        bad += 1
        continue
    seen.add((a, b))
    want = truth.get((a, b))
    if want is None:
        print(f"MISMATCH: claimed pair ({a},{b}) not in recomputed truth")
        bad += 1
    elif want != (str(lab), cos):
        print(f"MISMATCH: pair ({a},{b}) claimed ({lab},{cos}) "
              f"recomputed {want}")
        bad += 1
for (a, b), (lab, cos) in truth.items():
    if (a, b) not in seen:
        print(f"MISSING: recomputed pair ({a},{b},{cos}) absent from claim")
        bad += 1

print(f"checked {len(claimed)} claimed rows vs {len(truth)} exact pairs")
if bad:
    print(f"RESULT: FAIL ({bad} mismatches)")
    sys.exit(1)
print("RESULT: PASS")
