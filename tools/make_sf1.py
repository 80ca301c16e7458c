#!/usr/bin/env python3
"""Build a 10x replica of the sf0.1 tables (a synthetic "sf1") for the
scale-cliff measurement in SCALE.md. NOT an oracle input — correctness
runs only ever use the driver-generated /root/testdata sets.

Scaling rules keep per-replica data properties identical so a query's
cost should scale ~linearly in replicas unless its algorithm doesn't:
  - dims region/nation stay fixed (TPC-H semantics);
  - every key column offsets by replica * STRIDE, consistently across
    fact/dim pairs, so join selectivities per key are preserved and
    cross-replica joins never match;
  - document text is salted per replica (every token prefixed) so
    cross-replica shingle/minhash similarity is ~0 and the near-dup
    pair graph scales linearly, like a real 10x corpus would;
  - timestamps are left as-is: event density per time window scales
    10x, which is what a bigger scale factor means.

Usage: make_sf1.py <srcDir> <dstDir> [replicas]
"""
import sys

import duckdb

src, dst = sys.argv[1], sys.argv[2]
n_rep = int(sys.argv[3]) if len(sys.argv) > 3 else 10
# Optional table filter so big replicas (1000x) can build tables in
# PARALLEL worker processes: make_sf1.py src dst 1000 lineitem
only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

STRIDE = 10_000_000

con = duckdb.connect()
# Row order within a parquet file is semantically irrelevant to every
# consumer (Spark scans are parallel and unordered; every query has
# deterministic sorts/aggregates) — not preserving it lets DuckDB
# stream the replica cross-join to disk instead of buffering the whole
# output table in memory (12 GB+ and single-threaded at 1000x).
con.execute("SET preserve_insertion_order=false")

copy_as_is = ["region", "nation"]
keyed = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}

def want(t):
    return only is None or t in only


for t in copy_as_is:
    if not want(t):
        continue
    con.execute(
        f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet'")
    print(t, "copied")

for t, keys in keyed.items():
    if not want(t):
        continue
    cols = [c[0] for c in
            con.sql(f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
    types = {c[0]: c[1] for c in
             con.sql(f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()}
    def render(c, t=t, types=types):
        # The driver's events.ts encoding VARIES by generation:
        # INT64 TIMESTAMP(NANOS) (DuckDB surfaces TIMESTAMP_NS; the
        # engine reads it via nanosAsLong) or TIMESTAMP(MICROS). The
        # replica must MIRROR the source generation — rewriting the
        # representation would shift which Tables.events branch the
        # sf1 run exercises and break the oracles' ts arithmetic.
        if t == "events" and c == "ts" and types[c] == "TIMESTAMP_NS":
            return "epoch_ns(ts) AS ts"
        if c in keys:
            return f"{c} + r.i * {STRIDE} AS {c}"
        return c
    sel = ", ".join(render(c) for c in cols)
    con.execute(
        f"COPY (SELECT {sel} FROM '{src}/{t}.parquet', "
        f"(SELECT unnest(range({n_rep})) AS i) r) TO '{dst}/{t}.parquet'")
    print(t, "x", n_rep)

# embeddings: offset vec_id AND sign-flip dimensions per replica
# (replica 0 keeps the original vectors). A per-(replica, dim) ±1 flip
# preserves norms and every INTRA-replica dot product exactly
# (a_d·f_d · b_d·f_d = a_d·b_d), so per-replica similarity structure is
# identical, while CROSS-replica dots decorrelate to ~0 — the vector
# twin of the documents text salt below. Without it the 10x "corpus" is
# 10 bit-identical copies whose sign bits always collide, and any LSH
# scheme measures as densifying no matter how many buckets it has.
flip = ("(CASE WHEN ascii(substr(md5(CAST(r.i AS VARCHAR) || '#' || "
        "CAST(d - 1 AS VARCHAR)), 1, 1)) % 2 = 0 THEN 1 ELSE -1 END)")
if want("embeddings"):
    con.execute(
    f"""COPY (SELECT vec_id + r.i * {STRIDE} AS vec_id,
      CASE WHEN r.i = 0 THEN embedding
           ELSE CAST(list_transform(range(1, len(embedding) + 1),
                d -> embedding[d] * {flip}) AS REAL[]) END AS embedding,
      label
      FROM '{src}/embeddings.parquet',
      (SELECT unnest(range({n_rep})) AS i) r) TO '{dst}/embeddings.parquet'""")
    print("embeddings x", n_rep, "(sign-flip salted)")

# documents: offset doc_id AND salt the text per replica (replica 0
# keeps the original bytes) so similarity structure is intra-replica
if want("documents"):
    con.execute(
        f"""COPY (SELECT doc_id + r.i * {STRIDE} AS doc_id,
      CASE WHEN r.i = 0 THEN text
           ELSE replace(text, ' ', ' x' || CAST(r.i AS VARCHAR)) END AS text,
      lang, source, n_chars
      FROM '{src}/documents.parquet',
      (SELECT unnest(range({n_rep})) AS i) r) TO '{dst}/documents.parquet'""")
    print("documents x", n_rep, "(salted)")
print("done ->", dst)
