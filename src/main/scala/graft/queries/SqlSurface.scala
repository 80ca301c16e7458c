package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pure-SQL entry points — queries stated through `spark.sql` rather
  * than the DataFrame API, exercising surface Spark 4 only recently
  * grew and that a reference user would reach for first:
  *
  *  - `WITH RECURSIVE` (Spark 4's UnionLoop): the level-walk
  *    recursion the engine's own `bom_rollup` replaces with
  *    distributed path doubling at scale. Keeping BOTH is the point:
  *    this row proves semantic parity of the native node against
  *    DuckDB's recursion on the identical key-derived tree, while
  *    bom_rollup remains the ⌈log₂ d⌉-shuffle scale path (a recursive
  *    CTE shuffles once per LEVEL).
  *  - correlated `LATERAL` subqueries with ORDER BY + LIMIT — the
  *    top-N-per-group idiom stated relationally (the planner
  *    decorrelates it; the DataFrame twin `group_topk` states the
  *    same contract through a window and plans WindowGroupLimit).
  *
  * Temp views are registered under query-unique names so parallel
  * suite runs can't collide.
  */
object SqlSurface {

  /** `rcte_levels`: ancestor-chain enumeration over the key-derived
    * 4-ary part tree (parent(k) = (k−1) div 4 — bom_rollup's domain)
    * through a NATIVE recursive CTE, collapsed per depth to count +
    * key checksum (order-independent integer sums, so the recursion's
    * row set is pinned exactly).
    */
  def rcteLevels(spark: SparkSession, dir: String): DataFrame = {
    // The ancestor closure is n·depth rows (~20M at the sf1 replica's
    // 2M parts), which trips the engine's 1M-row recursion guard —
    // raise it explicitly. That guard IS the bom_rollup scale
    // argument in miniature: level-walk recursion materializes the
    // whole closure through the loop node, while path doubling closes
    // the same tree in ⌈log₂ d⌉ self-joins of shuffle-partitioned
    // relations.
    // The raised guard must not outlive this query: a recursive CTE a
    // user runs later in the same session deserves the default runaway
    // protection back. conf reads are lazy at execution, so force the
    // result inside the raised window, then restore unconditionally.
    val key = "spark.sql.cteRecursionRowLimit"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, 200000000)
    try {
      Tables.read(spark, dir, "part").createOrReplaceTempView("part_rcte")
      spark.sql(
        """WITH RECURSIVE anc(node, a, depth) AS (
          |  SELECT p_partkey, (p_partkey - 1) div 4, 1L
          |  FROM part_rcte WHERE p_partkey >= 1
          |  UNION ALL
          |  SELECT node, (a - 1) div 4, depth + 1L FROM anc WHERE a >= 1
          |)
          |SELECT depth, count(*) AS n, sum(node) AS checksum
          |FROM anc GROUP BY depth ORDER BY depth""".stripMargin)
        .localCheckpoint(eager = true)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  def rcteLevelsOracle: String =
    """WITH RECURSIVE anc(node, a, depth) AS (
      |  SELECT p_partkey, (p_partkey - 1) // 4, CAST(1 AS BIGINT)
      |  FROM part WHERE p_partkey >= 1
      |  UNION ALL
      |  SELECT node, (a - 1) // 4, depth + 1 FROM anc WHERE a >= 1
      |)
      |SELECT depth, CAST(count(*) AS BIGINT) n,
      |  CAST(sum(node) AS BIGINT) checksum
      |FROM anc GROUP BY depth ORDER BY depth""".stripMargin

  /** `lateral_topk`: richest 2 customers per nation through a
    * correlated LATERAL subquery with ORDER BY + LIMIT — the SQL
    * statement of top-N-per-group. Balance compares in exact cents
    * with the custkey tie-break, per the suite's determinism
    * discipline.
    */
  def lateralTopk(spark: SparkSession, dir: String): DataFrame = {
    Tables.read(spark, dir, "customer").createOrReplaceTempView("cust_lat")
    // HAZARD (pinned in SqlSurfaceSpec): casting the OUTER correlation
    // column inside the driving subquery (DISTINCT CAST(c_nationkey AS
    // BIGINT)) makes Spark 4.1 silently mis-decorrelate this lateral —
    // the plan degrades to a GLOBAL limit-2 with the correlation
    // applied as a post-filter (2 rows total instead of 2 per nation,
    // no error). Keeping the correlation key at its native type and
    // casting AFTER the join is both correct and what a production
    // query should do anyway.
    spark.sql(
      s"""SELECT CAST(n.nation AS BIGINT) AS nation, l.c_custkey,
         |  CAST(round(l.c_acctbal * 100) AS BIGINT) AS bal_c FROM
         |  (SELECT DISTINCT c_nationkey AS nation FROM cust_lat) n,
         |  LATERAL (
         |    SELECT c_custkey, c_acctbal
         |    FROM cust_lat c
         |    WHERE c.c_nationkey = n.nation
         |    ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) DESC,
         |      c_custkey LIMIT 2) l
         |ORDER BY nation, bal_c DESC, l.c_custkey""".stripMargin)
  }

  def lateralTopkOracle: String =
    s"""SELECT n.nation, l.c_custkey, l.bal_c FROM
       |  (SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nation
       |   FROM customer) n,
       |  LATERAL (
       |    SELECT c_custkey, ${Quantize.centsSql("c_acctbal")} bal_c
       |    FROM customer c
       |    WHERE c.c_nationkey = n.nation
       |    ORDER BY bal_c DESC, c_custkey LIMIT 2) l
       |ORDER BY n.nation, l.bal_c DESC, l.c_custkey""".stripMargin

  /** `existence_join`: an IN-subquery that is one branch of an OR —
    * the shape the planner CANNOT turn into a semi join (a semi join
    * would also drop rows the other branch keeps), so it plans
    * Spark's fourth join variant, ExistenceJoin: the subquery joins
    * in as a boolean `exists` flag and the disjunction evaluates in
    * the Filter above. Completes the suite's join-type inventory
    * (inner/outer/semi/anti/null-safe/existence); the node is pinned
    * in PlanShapeSpec. Big-spender customers OR rich-balance
    * customers, counted per segment with the branch overlap split
    * out so the disjunction's row-keeping is visible in data.
    *
    * Scale shape: the flag join is a plain equi hash join on custkey
    * (the subquery side pre-aggregates to distinct keys); nothing
    * about the existence variant changes the exchange layout.
    */
  def existenceJoin(spark: SparkSession, dir: String): DataFrame = {
    Tables.read(spark, dir, "customer")
      .createOrReplaceTempView("customer_ej")
    Tables.read(spark, dir, "orders").createOrReplaceTempView("orders_ej")
    spark.sql(
      """SELECT c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS n_qualifying,
        |  CAST(sum(CASE WHEN c_acctbal > 9000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_rich
        |FROM customer_ej
        |WHERE c_custkey IN (SELECT o_custkey FROM orders_ej
        |                    WHERE o_totalprice > 450000)
        |   OR c_acctbal > 9000
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  def existenceJoinOracle: String =
    """SELECT c_mktsegment,
      |  CAST(count(*) AS BIGINT) AS n_qualifying,
      |  CAST(sum(CASE WHEN c_acctbal > 9000 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_rich
      |FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders
      |                    WHERE o_totalprice > 450000)
      |   OR c_acctbal > 9000
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** `sql_udf_surface`: Spark 4 SQL UDFs (`CREATE FUNCTION … RETURN
    * expr`) — the catalog-level reuse surface a warehouse user
    * reaches for before ever writing Scala. Two scalar functions
    * (cents quantization; a price band over it) are defined and
    * COMPOSED (`graft_band(graft_cents(x))`); the analyzer inlines
    * the bodies into the plan — no ScalaUDF black box, whole-stage
    * codegen intact, pushdown/pruning see through the call
    * (SqlSurfaceSpec pins the no-ScalaUDF property). The oracle
    * states the inlined expression, so the hash check IS the
    * inlining-correctness check.
    */
  def sqlUdfSurface(spark: SparkSession, dir: String): DataFrame = {
    spark.sql(
      "CREATE OR REPLACE TEMPORARY FUNCTION graft_cents(x DOUBLE) " +
        "RETURNS BIGINT RETURN CAST(round(x * 100) AS BIGINT)")
    spark.sql(
      "CREATE OR REPLACE TEMPORARY FUNCTION graft_band(c BIGINT) " +
        "RETURNS STRING RETURN CASE WHEN c < 10000000 THEN 'low' " +
        "WHEN c < 25000000 THEN 'mid' ELSE 'high' END")
    Tables.read(spark, dir, "orders")
      .createOrReplaceTempView("orders_sqludf")
    spark.sql(
      """SELECT graft_band(graft_cents(o_totalprice)) AS band,
        |  count(*) AS n,
        |  sum(graft_cents(o_totalprice)) AS total_c
        |FROM orders_sqludf GROUP BY 1 ORDER BY band""".stripMargin)
  }

  def sqlUdfSurfaceOracle: String =
    s"""WITH c AS (
       |  SELECT ${Quantize.centsSql("o_totalprice")} vc FROM orders)
       |SELECT CASE WHEN vc < 10000000 THEN 'low'
       |    WHEN vc < 25000000 THEN 'mid' ELSE 'high' END AS band,
       |  CAST(count(*) AS BIGINT) n,
       |  CAST(sum(vc) AS BIGINT) total_c
       |FROM c GROUP BY 1 ORDER BY band""".stripMargin

  /** `sql_script`: Spark 4 SQL scripting (`BEGIN … END`, session
    * variables) — the parameterized-report shape: DECLARE a
    * threshold, SET it from an aggregate of the data, use it in the
    * final SELECT. The scripting runtime executes statements
    * sequentially and returns the last result; the oracle states the
    * same computation with the variable re-expressed as a scalar
    * subquery. The scripting conf is scoped try/finally per the
    * rcte_levels discipline — a raised feature flag must not outlive
    * its query.
    */
  def sqlScript(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.scripting.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      Tables.read(spark, dir, "orders")
        .createOrReplaceTempView("orders_script")
      spark.sql(
        """BEGIN
          |  DECLARE big_c BIGINT DEFAULT 0;
          |  SET big_c = (SELECT 6 * sum(CAST(round(o_totalprice * 100)
          |    AS BIGINT)) div (5 * count(*)) FROM orders_script);
          |  SELECT o_orderpriority AS priority,
          |    CAST(count(*) AS BIGINT) AS n_big,
          |    CAST(min(big_c) AS BIGINT) AS threshold_c
          |  FROM orders_script
          |  WHERE CAST(round(o_totalprice * 100) AS BIGINT) > big_c
          |  GROUP BY 1 ORDER BY priority;
          |END""".stripMargin)
        .localCheckpoint(eager = true)
    } finally {
      prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
  }

  def sqlScriptOracle: String =
    s"""WITH t AS (
       |  SELECT 6 * sum(${Quantize.centsSql("o_totalprice")}) //
       |    (5 * count(*)) AS big_c
       |  FROM orders)
       |SELECT o_orderpriority AS priority,
       |  CAST(count(*) AS BIGINT) n_big,
       |  CAST(min(big_c) AS BIGINT) threshold_c
       |FROM orders, t
       |WHERE ${Quantize.centsSql("o_totalprice")} > big_c
       |GROUP BY 1, big_c ORDER BY priority""".stripMargin

  /** `not_in_null_trap`: the most-reported SQL wrong-answer class —
    * `NOT IN` against a subquery that CAN yield NULL returns zero
    * rows under three-valued logic (x <> NULL is UNKNOWN, so no row
    * ever satisfies the conjunction), while the `NOT EXISTS` twin is
    * null-blind and returns the real anti set. All three statements
    * run against the same deterministically null-injected subquery
    * and land as one 3-row panel, so the 0 IS in the hash check —
    * an engine that "helpfully" treats NOT IN as anti join would
    * mismatch. Plan note: Spark plans the nullable NOT IN as a
    * null-aware anti join (BroadcastNestedLoopJoin with a one-sided
    * null check), which is why the subquery side must stay
    * broadcast-sized in production — stated here over the orders
    * key domain, where it is.
    */
  def notInNullTrap(spark: SparkSession, dir: String): DataFrame = {
    Tables.read(spark, dir, "customer")
      .createOrReplaceTempView("cust_nint")
    Tables.read(spark, dir, "orders").createOrReplaceTempView("ord_nint")
    spark.sql(
      """WITH sub AS (
        |  SELECT CASE WHEN o_orderkey % 1000 = 0 THEN CAST(NULL AS BIGINT)
        |    ELSE o_custkey END AS k
        |  FROM ord_nint WHERE o_totalprice > 300000)
        |SELECT 'not_in_clean' AS mode, CAST(count(*) AS BIGINT) AS n
        |FROM cust_nint
        |WHERE c_custkey NOT IN (SELECT k FROM sub WHERE k IS NOT NULL)
        |UNION ALL
        |SELECT 'not_in_null', CAST(count(*) AS BIGINT)
        |FROM cust_nint WHERE c_custkey NOT IN (SELECT k FROM sub)
        |UNION ALL
        |SELECT 'not_exists', CAST(count(*) AS BIGINT)
        |FROM cust_nint c
        |WHERE NOT EXISTS (SELECT 1 FROM sub WHERE sub.k = c.c_custkey)
        |ORDER BY mode""".stripMargin)
  }

  def notInNullTrapOracle: String =
    """WITH sub AS (
      |  SELECT CASE WHEN o_orderkey % 1000 = 0 THEN CAST(NULL AS BIGINT)
      |    ELSE o_custkey END AS k
      |  FROM orders WHERE o_totalprice > 300000)
      |SELECT 'not_in_clean' AS mode, CAST(count(*) AS BIGINT) AS n
      |FROM customer
      |WHERE c_custkey NOT IN (SELECT k FROM sub WHERE k IS NOT NULL)
      |UNION ALL
      |SELECT 'not_in_null', CAST(count(*) AS BIGINT)
      |FROM customer WHERE c_custkey NOT IN (SELECT k FROM sub)
      |UNION ALL
      |SELECT 'not_exists', CAST(count(*) AS BIGINT)
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM sub WHERE sub.k = c.c_custkey)
      |ORDER BY mode""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "not_in_null_trap", notInNullTrap, Some(notInNullTrapOracle)),
    QueryDef("sql_udf_surface", sqlUdfSurface, Some(sqlUdfSurfaceOracle)),
    QueryDef("sql_script", sqlScript, Some(sqlScriptOracle)),
    QueryDef("rcte_levels", rcteLevels, Some(rcteLevelsOracle)),
    QueryDef("lateral_topk", lateralTopk, Some(lateralTopkOracle)),
    QueryDef("existence_join", existenceJoin, Some(existenceJoinOracle)))
}
