#!/usr/bin/env python3
"""EXACT full-truth verification for knn_ivf_kmeans, knn_ivf_probe2
and knn_recall at replica scales where their DuckDB oracles are a cost
ceiling (each inlines the N x N/53 assignment cross join — twice for
the k-means variant — and spills past free disk at sf10, while the
engine's codegen argmin kernel streams it).

The sampled-probe pattern (check_knn_sample.py) cannot cover the
k-means variant: the M-step means depend on EVERY vector's seed-cell
assignment, so a sampled assignment cannot reproduce the refined
centroids. Like check_ivf_numpy.py, recompute the COMPLETE truth with
blocked float64 GEMM instead:

    d2(x, c) = |x|^2 + |c|^2 - 2 x.c

All quantized terms are integers below 2^53, so the arithmetic is
bit-exact, and argmin over columns ordered by c_id reproduces the
oracle's (d2, c_id) tie-break. The M-step mean floor(sum/cnt + 0.5)
is one IEEE double division of exact integers — identical in Spark,
DuckDB and numpy (the engine's documented rounding convention).

Checks:
  1. knn_ivf_kmeans: full a0 assignment -> per-cell integer means ->
     full a1 assignment -> exact cell-restricted cosine top-3 per
     query; every dumped row (q_id, rnk, neighbor, cos) must match
     bit-for-bit, including the float64 cosine.
  2. knn_ivf_probe2: per-query top-2 seed cells from the full d2
     relation; candidates = full a0 assignment restricted to those two
     cells; exact cosine top-3; dumped rows bit-exact.
  3. knn_recall: recompute every method's recall@3 from the engine's
     OWN dumped per-method results (each independently verified at
     this scale: knn_lsh by the full oracle, knn_ivf by
     check_knn_sample + check_ivf_numpy, the PQ pair by the sampled PQ
     checkers, kmeans/probe2 by checks 1-2) joined against the dumped
     knn_brute truth (full-oracle-verified); hits, n_truth and the
     float64 recall must match the claimed rows exactly.

Usage: check_ivf_variants_numpy.py <sfDir> <engineDumpDir> [blockRows]
Exit 0 = all three dumps match the recomputed truth exactly.
"""
import sys

import duckdb
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
BLOCK = int(sys.argv[3]) if len(sys.argv) > 3 else 8192

con = duckdb.connect()
emb = con.sql(
    f"SELECT vec_id, embedding FROM '{sfdir}/embeddings.parquet' "
    "ORDER BY vec_id").fetchnumpy()
vec_ids = emb["vec_id"].astype(np.int64)
raw = np.array([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
n, dim = raw.shape
print(f"{n} vectors x {dim} dims")

# DuckDB round(): half away from zero (numpy rounds half to even).
# Known edge (round-10 advice): floor(|x|*1000+0.5) is not strictly
# identical to decimal-string HALF_UP where IEEE addition rounds
# |x|*1000+0.5 up at a binary-representability boundary (e.g.
# 0.49999999999999994+0.5 == 1.0). Divergence direction is a spurious
# MISMATCH (false FAIL), never a false PASS — if a mismatch is a
# single off-by-one quantized component, recompute the quantization
# in DuckDB before blaming the engine.
v = np.sign(raw) * np.floor(np.abs(raw) * 1000.0 + 0.5)
nrm_i = (v.astype(np.int64) ** 2).sum(axis=1)      # exact int64
nrm = nrm_i.astype(np.float64)
id_pos = {int(i): p for p, i in enumerate(vec_ids.tolist())}


def assign_full(C, c_ids, want_top2_for=None):
    """argmin_(d2, c_id) per vector; optionally also (c1, c2) for the
    given row positions (the oracle's arn <= 2)."""
    c_nrm = (C * C).sum(axis=1)
    out = np.empty(n, dtype=np.int64)
    top2 = {}
    want = set(want_top2_for or [])
    for s in range(0, n, BLOCK):
        X = v[s:s + BLOCK]
        d2 = (X * X).sum(axis=1)[:, None] + c_nrm[None, :] - 2.0 * (X @ C.T)
        out[s:s + BLOCK] = c_ids[np.argmin(d2, axis=1)]
        for p in want:
            if s <= p < s + BLOCK:
                row = d2[p - s]
                # lexicographic (d2, c_id): stable argsort over c_id-
                # ordered columns keeps the smaller c_id first on ties
                order = np.argsort(row, kind="stable")
                top2[p] = (int(c_ids[order[0]]), int(c_ids[order[1]]))
    return out, top2


def cell_topk(assign_vec, q_cells, k=3):
    """Exact cosine top-k per query over cell-restricted candidates.
    q_cells: {q_pos: iterable of cells}. Returns rows like the dump:
    (q_id, rnk, neighbor, cos)."""
    rows = []
    for qp, cells in sorted(q_cells.items()):
        q_id = int(vec_ids[qp])
        mask = np.isin(assign_vec, np.fromiter(cells, dtype=np.int64))
        mask[qp] = False
        cand = np.nonzero(mask)[0]
        dots = v[cand] @ v[qp]                     # exact: < 2^53
        denom = np.sqrt((nrm_i[cand] * nrm_i[qp]).astype(np.float64))
        cos = dots / denom
        order = np.lexsort((vec_ids[cand], -cos))[:k]
        for r, j in enumerate(order, start=1):
            rows.append((q_id, r, int(vec_ids[cand[j]]), float(cos[j])))
    return rows


def compare(name, got):
    claimed = con.sql(
        f"SELECT q_id, rnk, neighbor, cos FROM '{outdir}/{name}/*.parquet' "
        "ORDER BY q_id, rnk").fetchall()
    want = sorted(got)
    bad = 0
    if len(claimed) != len(want):
        print(f"MISMATCH {name}: {len(claimed)} claimed rows vs "
              f"{len(want)} recomputed")
        bad += 1
    for c, w in zip(claimed, want):
        if (c[0], c[1], c[2]) != (w[0], w[1], w[2]) or c[3] != w[3]:
            print(f"MISMATCH {name}: claimed {c} recomputed {w}")
            bad += 1
    print(f"checked {name}: {len(claimed)} rows, {bad} mismatches")
    return bad


fails = 0
q_pos = [id_pos[q] for q in range(10)]

# --- seed assignment (a0) + per-query top-2 seed cells ---------------
seed_mask = (vec_ids % 53) == 0
seed_ids = vec_ids[seed_mask]
a0, q_top2 = assign_full(v[seed_mask], seed_ids, want_top2_for=q_pos)
print(f"a0 assigned against {len(seed_ids)} seed centroids")

# --- knn_ivf_probe2: candidates from the query's 2 nearest seeds ----
fails += compare(
    "knn_ivf_probe2", cell_topk(a0, {p: q_top2[p] for p in q_pos}))

# --- k-means M-step: floor(sum/cnt + 0.5) per cell and dim ----------
order = np.argsort(a0, kind="stable")
sorted_cells, starts = np.unique(a0[order], return_index=True)
sums = np.add.reduceat(v[order], starts, axis=0)
cnts = np.diff(np.append(starts, n)).astype(np.float64)
refined = np.floor(sums / cnts[:, None] + 0.5)
a1, _ = assign_full(refined, sorted_cells)
print(f"a1 assigned against {len(sorted_cells)} refined centroids")

# --- knn_ivf_kmeans: queries search their refined cell --------------
fails += compare(
    "knn_ivf_kmeans", cell_topk(a1, {p: [a1[p]] for p in q_pos}))

# --- knn_recall: arithmetic over the verified per-method dumps ------
truth = set(con.sql(
    f"SELECT q_id, neighbor FROM '{outdir}/knn_brute/*.parquet' "
    "WHERE rnk <= 3").fetchall())
n_truth = len(truth)
claimed = con.sql(
    f"SELECT method, hits, n_truth, recall_at_3 "
    f"FROM '{outdir}/knn_recall/*.parquet' ORDER BY method").fetchall()
methods = sorted(["knn_ivf", "knn_ivf_kmeans", "knn_ivf_probe2",
                  "knn_ivf_pq", "knn_lsh", "knn_pq"])
if [c[0] for c in claimed] != methods:
    print(f"MISMATCH knn_recall methods: {[c[0] for c in claimed]}")
    fails += 1
for method, hits, nt, recall in claimed:
    got = set(con.sql(
        f"SELECT q_id, neighbor FROM '{outdir}/{method}/*.parquet'"
    ).fetchall())
    want_hits = len(got & truth)
    want_recall = float(np.float64(want_hits) / np.float64(n_truth))
    if hits != want_hits or nt != n_truth or recall != want_recall:
        print(f"MISMATCH knn_recall {method}: claimed "
              f"({hits}, {nt}, {recall}) recomputed "
              f"({want_hits}, {n_truth}, {want_recall})")
        fails += 1
print(f"checked knn_recall: {len(claimed)} methods vs {n_truth} truth rows")

if fails:
    print(f"RESULT: FAIL ({fails} mismatches)")
    sys.exit(1)
print("RESULT: PASS")
