package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Recursive-hierarchy operators (BOM explosion, org charts, category
  * trees) — the workload class SQL serves with `WITH RECURSIVE`.
  * Spark 4 grew a native recursion node (UnionLoop — exercised and
  * oracle-checked by `rcte_levels` in [[SqlSurface]]), but the
  * SCALABLE Spark answer is still PATH DOUBLING: each round
  * self-joins the ancestor relation, so reachable-ancestor distance
  * doubles per round and a depth-d tree closes in ⌈log₂ d⌉ joins —
  * not d level-walk joins (the recursive node runs one pass per
  * LEVEL and materializes the whole closure through its loop; the
  * sf1 replica already trips its 1M-row recursion guard).
  */
object Hierarchy {

  /** `bom_rollup`: transitive closure + subtree aggregation over a
    * synthetic 4-ary part hierarchy (parent(k) = (k-1) div 4, root 0
    * — a deterministic tree both engines derive from the key, the
    * hierarchy analog of the suite's content-hash splits). For every
    * part: its depth and its subtree's count + retail-price cents.
    *
    * Plan shape: the closure is built by ⌈log₂ depth⌉ rounds of
    * self-join + distinct over the (node, ancestor) relation — each
    * round one shuffle over a relation of ≤ n·depth rows, persisted
    * per round; the round count is fixed up front from driver
    * arithmetic on max(key) (2^rounds ≥ depth, REQUIREd), so the
    * loop runs zero per-round actions. The rollup is
    * then one join of closure∪self against the price table + one
    * aggregate. At 100 TB: n·depth pairs is the closure's true size
    * (trees are shallow — depth 9 at 200k nodes), doubling keeps the
    * round count at 4 where a level-walk needs 9, and every round is
    * partial-aggregatable shuffle work, no driver state beyond the
    * loop counter.
    */
  def bomRollup(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.read(spark, dir, "part")
      .select(col("p_partkey"), Quantize.cents(col("p_retailprice")).as("cents"))
    val edges = part
      .where(col("p_partkey") >= 1)
      .select(
        col("p_partkey").as("node"),
        expr("(p_partkey - 1) div 4").as("anc"))
    // the hierarchy is key-derived, so the depth bound is driver
    // arithmetic on max(key) — one scalar action — and the round
    // count is FIXED up front (2^rounds ≥ depth), not discovered by
    // per-round fixpoint counts (a count is a full job per round;
    // the first cut spent 10 of its 11.7s there at sf0.1)
    val maxKey = part.agg(max(col("p_partkey"))).head().getLong(0)
    var depthBound = 0
    var c = maxKey
    while (c >= 1) { c = (c - 1) / 4; depthBound += 1 }
    val rounds =
      math.ceil(math.log(math.max(depthBound, 1)) / math.log(2)).toInt
    require((1L << rounds) >= depthBound, s"round arithmetic: $rounds")
    val (closure, persisted) = closureOf(edges, rounds)
    try {
      val pairs = closure
        .unionByName(part.select(
          col("p_partkey").as("node"), col("p_partkey").as("anc")))
      val sub = pairs
        .join(part.withColumnRenamed("p_partkey", "node"), "node")
        .groupBy(col("anc"))
        .agg(
          count(lit(1)).as("subtree_n"),
          sum(col("cents")).as("subtree_cents"))
      val dep = closure.groupBy(col("node")).agg(count(lit(1)).as("depth"))
        .select(col("node").as("dep_k"), col("depth"))
      part
        .select(col("p_partkey"))
        .join(dep, col("p_partkey") === col("dep_k"), "left")
        .join(sub, col("p_partkey") === col("anc"))
        .select(
          col("p_partkey"),
          coalesce(col("depth"), lit(0L)).as("depth"),
          col("subtree_n"), col("subtree_cents"))
        .orderBy(col("p_partkey"))
        .localCheckpoint() // materialize before the closure unpersist
    } finally persisted.foreach(_.unpersist())
  }

  /** Path-doubling transitive closure over ANY (node, anc) parent
    * relation whose paths are unique (trees/forests) — also exercised
    * by `GraphPropertySpec` against a BFS model on seeded random
    * forests. Pairs hold distances 1..2^i, the frontier EXACTLY 2^i:
    * composed distances 2^i+1..2^{i+1} are disjoint from pairs, so no
    * round ever needs a distinct — one join per relation per round
    * instead of join+dedup-shuffle. Returns the closure plus every
    * persisted intermediate (caller unpersists after materializing).
    */
  def closureOf(
      edges: DataFrame,
      rounds: Int): (DataFrame, Seq[DataFrame]) = {
    var closure = edges
    var frontier = edges
    val persisted = scala.collection.mutable.ListBuffer.empty[DataFrame]
    for (i <- 1 to rounds) {
      val hop = frontier
        .select(col("node").as("mid"), col("anc").as("far"))
      closure = closure
        .unionByName(
          closure.select(col("node"), col("anc").as("mid"))
            .join(hop, "mid")
            .select(col("node"), col("far").as("anc")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      persisted += closure
      if (i < rounds) {
        frontier = frontier
          .select(col("node"), col("anc").as("mid"))
          .join(hop, "mid")
          .select(col("node"), col("far").as("anc"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        persisted += frontier
      }
    }
    (closure, persisted.toSeq)
  }

  def bomRollupOracle: String =
    s"""WITH RECURSIVE edges AS (
       |  SELECT p_partkey AS node, (p_partkey - 1) // 4 AS anc
       |  FROM part WHERE p_partkey >= 1),
       |anc AS (
       |  -- recurse through the EDGE RELATION (ancestor must itself be
       |  -- a part with an out-edge), matching the engine's closure of
       |  -- the edge table: an arithmetic walk `(anc - 1) // 4` agrees
       |  -- only on DENSE key spaces and silently tunnels through
       |  -- non-part ancestor keys on sparse ones (caught by the
       |  -- round-6 sf1 sweep, whose replica keys stride by 10M)
       |  SELECT node, anc FROM edges
       |  UNION ALL
       |  SELECT anc.node, e.anc FROM anc JOIN edges e ON anc.anc = e.node),
       |price AS (
       |  SELECT p_partkey, ${Quantize.centsSql("p_retailprice")} AS cents
       |  FROM part),
       |pairs AS (
       |  SELECT node, anc FROM anc
       |  UNION ALL
       |  SELECT p_partkey, p_partkey FROM part),
       |sub AS (
       |  SELECT pairs.anc AS k, CAST(count(*) AS BIGINT) AS subtree_n,
       |         CAST(sum(price.cents) AS BIGINT) AS subtree_cents
       |  FROM pairs JOIN price ON pairs.node = price.p_partkey
       |  GROUP BY pairs.anc),
       |dep AS (
       |  SELECT node AS k, CAST(count(*) AS BIGINT) AS depth
       |  FROM anc GROUP BY node)
       |SELECT price.p_partkey, COALESCE(dep.depth, 0) AS depth,
       |       sub.subtree_n, sub.subtree_cents
       |FROM price
       |LEFT JOIN dep ON price.p_partkey = dep.k
       |JOIN sub ON price.p_partkey = sub.k
       |ORDER BY price.p_partkey""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("bom_rollup", bomRollup, Some(bomRollupOracle)))
}
