#!/usr/bin/env python3
"""Reproducible validation battery for the substitute verifiers
(round-10 verdict item 6): one command re-proves that every
oracle-cost-ceiling verifier (a) PASSes on a pristine engine dump and
(b) CATCHES each named mutation class — swapped neighbor, ulp-scale
drift, dropped row, duplicated row, inflated count.

The substitute verifiers stand in for the DuckDB full oracle at
replica scales where the oracle's truth query exceeds disk/wall
(SF1_ORACLE.md round-10 section). Their authority rests on two legs:
agreement with the green full oracle at small SF (leg a), and
mutation sensitivity (leg b). This battery executes both legs from
scratch so the validation no longer lives only in commit messages.

Usage: test_verifiers.py <sfDir> <dumpDir> [--gen]
  <sfDir>   small-SF testdata (sf0.001 or sf0.01) — the same parquet
            the dump was produced from
  <dumpDir> a graft.Verify dump containing the 15 substitute-family
            queries; --gen (or a missing dump) regenerates it via
            sbt "runMain graft.Verify" with SPARK_GRAFT_ONLY set
Exit 0 iff every pristine run PASSes AND every mutation is caught.
"""
import os
import shutil
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO, "tools")

QUERIES = [
    "triangle_count", "clustering_coefficient", "clustering_coeff",
    "node_similarity", "knn_brute", "knn_ivf", "knn_lsh", "ivf_balance",
    "knn_ivf_kmeans", "knn_ivf_probe2", "knn_ivf_pq", "knn_pq",
    "knn_recall", "dedup_embedding", "dedup_embedding_lsh",
    "embedding_clusters",
    # replica-reduction family (check_replica_local.py)
    "pagerank", "hits", "degree_assortativity",
]

# check_replica_local.py takes a replica count after the dump dir; at
# reps=1 the reduction is the identity, so the small-SF battery dump
# exercises the whole compare path (the reps>1 expansion itself is
# validated by the committed 2-replica run in SF1_ORACLE.md and by the
# same mutations at any reps — the expansion only ADDS rows).
VERIFIERS = [
    "check_triangles_sample.py",
    "check_knn_sample.py",
    "check_ivf_numpy.py",
    "check_ivf_variants_numpy.py",
    "check_pq_sample.py",
    "check_flatpq_sample.py",
    "check_emb_clusters_sample.py",
    "check_dedup_embedding_numpy.py",
    "check_replica_local.py",
]

EXTRA_ARGS = {"check_replica_local.py": ["1"]}

# (mutation label, verifier, mutated query dir, duckdb SELECT over `t`)
# Perturbations apply to ALL rows so sampled verifiers (mod-97 probe
# sets) are guaranteed to see a mutated row; drops/dups use row 0 of
# relations whose verifiers check completeness over the FULL claim.
MUTATIONS = [
    ("inflated triangle count", "check_triangles_sample.py",
     "triangle_count",
     "SELECT suppkey, CAST(n_tri + 1 AS BIGINT) AS n_tri FROM t"),
    ("perturbed jaccard ppm", "check_triangles_sample.py",
     "node_similarity",
     "SELECT x, y, cn, dx, dy, CAST(jacc_ppm + 1 AS BIGINT) AS jacc_ppm "
     "FROM t"),
    ("swapped neighbor (rnk1<->rnk2)", "check_knn_sample.py",
     "knn_ivf",
     "SELECT q_id, rnk, CAST(CASE WHEN rnk = 1 THEN lead(neighbor) OVER w "
     "WHEN rnk = 2 THEN lag(neighbor) OVER w ELSE neighbor END AS BIGINT) "
     "AS neighbor, cos FROM t WINDOW w AS "
     "(PARTITION BY q_id ORDER BY rnk) ORDER BY q_id, rnk"),
    ("ulp-scale cos drift", "check_knn_sample.py",
     "knn_ivf",
     "SELECT q_id, rnk, neighbor, cos * (1 + 2.3e-16) AS cos FROM t"),
    ("inflated cell count", "check_ivf_numpy.py",
     "ivf_balance",
     "SELECT cell, CAST(n_vecs + 1 AS BIGINT) AS n_vecs, share_ppm FROM t"),
    ("swapped neighbor (kmeans)", "check_ivf_variants_numpy.py",
     "knn_ivf_kmeans",
     "SELECT q_id, rnk, CAST(CASE WHEN rnk = 1 THEN lead(neighbor) OVER w "
     "WHEN rnk = 2 THEN lag(neighbor) OVER w ELSE neighbor END AS BIGINT) "
     "AS neighbor, cos FROM t WINDOW w AS "
     "(PARTITION BY q_id ORDER BY rnk) ORDER BY q_id, rnk"),
    ("inflated recall hits", "check_ivf_variants_numpy.py",
     "knn_recall",
     "SELECT method, CAST(hits + 1 AS BIGINT) AS hits, n_truth, "
     "recall_at_3 FROM t"),
    ("perturbed PQ distance", "check_pq_sample.py",
     "knn_ivf_pq",
     "SELECT q_id, rnk, neighbor, CAST(ad2 + 1 AS BIGINT) AS ad2 FROM t"),
    ("perturbed flat-PQ distance", "check_flatpq_sample.py",
     "knn_pq",
     "SELECT q_id, rnk, neighbor, CAST(ad2 + 1 AS BIGINT) AS ad2 FROM t"),
    ("ulp-scale pair-cos drift", "check_emb_clusters_sample.py",
     "dedup_embedding_lsh",
     "SELECT a, b, cos * (1 + 2.3e-16) AS cos FROM t"),
    ("inflated cluster size", "check_emb_clusters_sample.py",
     "embedding_clusters",
     "SELECT cluster_id, CAST(n_members + 1 AS BIGINT) AS n_members, "
     "max_member FROM t"),
    ("dropped pair row", "check_dedup_embedding_numpy.py",
     "dedup_embedding",
     "SELECT * FROM t QUALIFY row_number() OVER (ORDER BY a, b) > 1"),
    ("duplicated pair row", "check_dedup_embedding_numpy.py",
     "dedup_embedding",
     "SELECT * FROM t UNION ALL "
     "SELECT * FROM (SELECT * FROM t ORDER BY a, b LIMIT 1)"),
    ("perturbed pagerank ppm", "check_replica_local.py",
     "pagerank",
     "SELECT kind, entity, CAST(rank_ppm + 1 AS BIGINT) AS rank_ppm FROM t"),
    ("dropped pagerank row", "check_replica_local.py",
     "pagerank",
     "SELECT * FROM t QUALIFY row_number() OVER (ORDER BY entity) > 1"),
    ("hits entity key drift", "check_replica_local.py",
     "hits",
     "SELECT kind, entity + 1 AS entity, score_ppm FROM t"),
    ("assortativity edge-count drift", "check_replica_local.py",
     "degree_assortativity",
     "SELECT n_edges + 1 AS n_edges, assortativity FROM t"),
]


def gen_dump(sfdir, dumpdir):
    env = dict(os.environ)
    env["SPARK_GRAFT_ONLY"] = ",".join(QUERIES)
    env.setdefault("SPARK_GRAFT_CPUS", "8")
    print(f"[gen] dumping {len(QUERIES)} queries from {sfdir} -> {dumpdir}")
    subprocess.run(
        ["sbt", "--error", f'runMain graft.Verify {sfdir} {dumpdir}'],
        cwd=REPO, env=env, check=True)


def run_verifier(script, sfdir, dumpdir):
    p = subprocess.run(
        [sys.executable, os.path.join(TOOLS, script), sfdir, dumpdir]
        + EXTRA_ARGS.get(script, []),
        capture_output=True, text=True)
    return p.returncode, p.stdout + p.stderr


def make_mutant(dumpdir, workdir, query, sql):
    if os.path.exists(workdir):
        shutil.rmtree(workdir)
    os.makedirs(workdir)
    for name in os.listdir(dumpdir):
        src = os.path.join(dumpdir, name)
        # plain files too: check_replica_local.py reads oracle_sql.json
        if name != query and name != "_mutants":
            os.symlink(src, os.path.join(workdir, name))
    qdir = os.path.join(workdir, query)
    os.makedirs(qdir)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{dumpdir}/{query}/*.parquet'")
    con.sql(f"COPY ({sql}) TO '{qdir}/part-00000.parquet' (FORMAT PARQUET)")
    con.close()


def main():
    sfdir, dumpdir = sys.argv[1], sys.argv[2]
    missing = [q for q in QUERIES
               if not os.path.isdir(os.path.join(dumpdir, q))]
    if "--gen" in sys.argv[3:] or missing:
        gen_dump(sfdir, dumpdir)
        missing = [q for q in QUERIES
                   if not os.path.isdir(os.path.join(dumpdir, q))]
        if missing:
            print(f"FATAL: dump still missing {missing}")
            sys.exit(2)

    bad = 0
    print("== leg (a): pristine dump must PASS every verifier ==")
    for script in VERIFIERS:
        code, out = run_verifier(script, sfdir, dumpdir)
        tag = "ok" if code == 0 else "FAIL"
        print(f"[pristine] {script}: exit={code} {tag}")
        if code != 0:
            print(out[-2000:])
            bad += 1

    print("== leg (b): every mutation must be CAUGHT (nonzero exit) ==")
    workbase = os.path.join(dumpdir, "_mutants")
    for label, script, query, sql in MUTATIONS:
        workdir = os.path.join(workbase, label.replace(" ", "_"))
        make_mutant(dumpdir, workdir, query, sql)
        code, out = run_verifier(script, sfdir, workdir)
        caught = code != 0
        print(f"[mutation] {label} ({script} / {query}): "
              f"exit={code} {'CAUGHT' if caught else 'NOT CAUGHT'}")
        if not caught:
            print(out[-2000:])
            bad += 1
    shutil.rmtree(workbase, ignore_errors=True)

    if bad:
        print(f"RESULT: FAIL ({bad} of {len(VERIFIERS)} pristine + "
              f"{len(MUTATIONS)} mutations misbehaved)")
        sys.exit(1)
    print(f"RESULT: PASS ({len(VERIFIERS)} pristine PASS, "
          f"{len(MUTATIONS)} mutations caught)")


if __name__ == "__main__":
    main()
