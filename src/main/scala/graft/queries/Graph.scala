package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative link analysis over a graph DERIVED from the fact tables —
  * the second distributed-iterative operator family beside
  * [[Dedup]]'s label-propagation connected components. Where CC
  * propagates a min (idempotent, converges to fixpoint), PageRank
  * propagates weighted MASS through a damping factor — the
  * representative of the "numeric iterate until round budget" class
  * (PageRank, HITS, Katz centrality, belief propagation) every
  * large-scale graph pipeline runs.
  *
  * All rank arithmetic is INTEGER (ppm units, floor division), so
  * partial sums are order-independent and the DuckDB oracle can
  * replay the exact iteration — the same exactness discipline as the
  * suite's quantized money/idf columns.
  */
object Graph {

  /** `pagerank`: 3 damped iterations over the bipartite
    * customer↔supplier trade graph (an edge per (customer, supplier)
    * pair that traded, weighted by lineitem count, both directions so
    * no node dangles). Rank starts at 1,000,000 ppm per node; each
    * round a node keeps 150,000 teleport ppm and receives
    * `(r_src · 85 · w) div (out_weight_src · 100)` along every
    * in-edge. Output: top 25 nodes by rank.
    *
    * Plan shape: the edge build is ONE fact⋈fact join on orderkey +
    * one (cust, supp) aggregate; each iteration is one shuffle(src)
    * join of the rank table (|nodes| rows — tiny next to the edge
    * relation) against the persisted edge relation + one
    * shuffle(dst) aggregate. At 100 TB the edge relation is
    * partitioned by src ONCE and reused every round (persist below;
    * bucketing on a real cluster), so iterations move only rank rows;
    * per-iteration `localCheckpoint(eager=false)` truncates lineage
    * growth exactly like the CC loop. Overflow headroom: r·85·w stays
    * < 2^63 through sf10; past that the same query runs in
    * DECIMAL(38,0) (swap the cast), trading codegen'd long math for
    * decimal ops.
    */
  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.read(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.read(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val eraw = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(
        (col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .agg(count(lit(1)).as("w"))
    val both = eraw.select(col("src"), col("dst"), col("w"))
      .unionByName(
        eraw.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    pagerankOn(both, iterations = 3)
      .select(
        when(col("node") % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("kind"),
        expr("node div 2").as("entity"),
        col("r").as("rank_ppm"))
      .orderBy(col("rank_ppm").desc, col("entity"), col("kind"))
      .limit(25)
      .localCheckpoint() // materialize: pagerankOn unpersisted its caches
  }

  /** The iteration core over ANY weighted directed edge relation
    * (src, dst, w) — also exercised by `GraphPropertySpec` against an
    * in-memory integer model on seeded random graphs. Returns (node,
    * r) for every node with out-edges, MATERIALIZED (localCheckpoint)
    * so callers compose freely after the internal caches are gone.
    */
  def pagerankOn(both: DataFrame, iterations: Int): DataFrame = {
    // node table = outw's key set (one row per src by construction);
    // it and the per-iteration rank table are |nodes|-sized — ALWAYS
    // broadcast against the edge relation, so iterations never
    // shuffle edges, only the contrib aggregate moves. outw is
    // persisted too: rank₀ and the edge build both read it, and
    // without the cache rank₀ silently re-runs the whole upstream
    // build (measured ~1s of the old 5s at sf0.1).
    val outw = both.groupBy(col("src")).agg(sum(col("w")).as("tw"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edges = both.join(broadcast(outw), "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // fill both caches up front so every iteration is a pure
      // cache-scan job; at bench scale the per-iteration cost is then
      // dominated by fixed plan/codegen/broadcast overhead (~0.3s/
      // round), which amortizes to nothing at cluster scale where the
      // edge scan dominates
      edges.count()
      var ranks = outw.select(col("src").as("node"))
        .withColumn("r", lit(1000000L))
      for (_ <- 1 to iterations) {
        ranks = edges
          .join(broadcast(ranks), edges("src") === ranks("node"))
          .withColumn("contrib", expr("(r * 85 * w) div (tw * 100)"))
          .groupBy(col("dst"))
          .agg((sum(col("contrib")) + lit(150000L)).as("r"))
          .select(col("dst").as("node"), col("r"))
          .localCheckpoint(eager = false)
      }
      ranks.localCheckpoint()
    } finally { edges.unpersist(); outw.unpersist() }
  }

  def pagerankOracle: String =
    """WITH eraw AS (
      |  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
      |         CAST(count(*) AS BIGINT) AS w
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2),
      |edges AS (
      |  SELECT src, dst, w FROM eraw
      |  UNION ALL
      |  SELECT dst AS src, src AS dst, w FROM eraw),
      |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS tw
      |         FROM edges GROUP BY src),
      |e AS (SELECT edges.src, edges.dst, edges.w, outw.tw
      |      FROM edges JOIN outw ON edges.src = outw.src),
      |r0 AS (SELECT DISTINCT src AS node, CAST(1000000 AS BIGINT) AS r
      |       FROM e),
      |r1 AS (SELECT e.dst AS node,
      |              CAST(150000 + sum((r0.r * 85 * e.w) // (e.tw * 100))
      |                   AS BIGINT) AS r
      |       FROM e JOIN r0 ON e.src = r0.node GROUP BY e.dst),
      |r2 AS (SELECT e.dst AS node,
      |              CAST(150000 + sum((r1.r * 85 * e.w) // (e.tw * 100))
      |                   AS BIGINT) AS r
      |       FROM e JOIN r1 ON e.src = r1.node GROUP BY e.dst),
      |r3 AS (SELECT e.dst AS node,
      |              CAST(150000 + sum((r2.r * 85 * e.w) // (e.tw * 100))
      |                   AS BIGINT) AS r
      |       FROM e JOIN r2 ON e.src = r2.node GROUP BY e.dst)
      |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
      |         AS kind,
      |       node // 2 AS entity, r AS rank_ppm
      |FROM r3
      |ORDER BY rank_ppm DESC, entity, kind
      |LIMIT 25""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("pagerank", pagerank, Some(pagerankOracle)))
}
