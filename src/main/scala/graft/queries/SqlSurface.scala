package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** `survival_km`: the Kaplan-Meier time-to-conversion curve over
    * the events table — per duration hour t: at-risk count n_at,
    * conversions d, right-censorings c, and the KM survival estimate
    * S(t) in ppm ("share not yet purchased t hours after first
    * contact"). Each user enters at their first event and is followed
    * for a fixed 48-hour horizon, truncated at the data window's end
    * for late entrants: first purchase inside the follow-up = event
    * at t = hours(purchase − entry); otherwise right-censored at the
    * follow-up's end. That mix of fixed-horizon and data-end
    * censoring is exactly what makes the naive "share converted by
    * hour t" curve wrong (truncated users can't have converted late)
    * and KM the estimator a conversion dashboard actually needs —
    * the curve form of the suite's signup-to-purchase latency
    * percentiles. The product Π(1 − d_i/n_i) is ppm-floored at each
    * step identically in both engines (every operand is
    * non-negative, so Spark's truncating `div` and DuckDB's flooring
    * `//` agree) — hash-exact with zero floats. Hours with d=0
    * multiply by n/n and leave S unchanged, so iterating the full
    * grid adds no rounding drift.
    *
    * Plan: one fact shuffle (user-grain min/conditional-min), then
    * an hour-grain aggregate — the time axis is BOUNDED (≤ horizon
    * hours rows regardless of user count: depth ≤ 49 here, ~10³ at a
    * multi-week horizon, whatever the corpus size), so the
    * sequential Π fold runs DRIVER-SIDE over the collected grid (the
    * bom_rollup/whale_share bounded-driver-arithmetic exception —
    * the per-level UnionLoop scheduling floor was ~5 s of pure
    * constant overhead on a ≤49-row relation). The NATIVE recursive
    * CTE form survives as [[survivalKmRcte]], pinned row-for-row
    * against this fold in SqlSurfaceSpec so the two can never
    * diverge.
    */
  /** 48-hour follow-up horizon in micros, shared by the Spark plan
    * and (as a literal) the oracle SQL. Declared before
    * [[SurvivalLabelCtes]] — a val forward reference would splice 0.
    */
  private val HorizonUs: Long = 48L * 3600000000L

  /** User-grain conversion-survival labels (user_id, t hours, ev
    * 0/1): entry at first event, first purchase inside the 48-hour
    * follow-up (truncated at the data window's end) = event at
    * t = hours(purchase − entry), otherwise right-censored at the
    * follow-up's end. Single-sourced so [[survivalKm]] and the
    * two-cohort comparison ([[Evaluation]]'s `log_rank_test`) can
    * never diverge on the censoring rule.
    */
  private[queries] def survivalLabels(
      spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val usr = ev.groupBy(col("user_id"))
      .agg(
        min(unix_micros(col("ts"))).as("fu"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts"))))
          .as("pu"))
    val endRel = ev.agg(max(unix_micros(col("ts"))).as("endu"))
    usr
      .crossJoin(broadcast(endRel)) // 1-row total: documented exception
      .withColumn("fup", least(col("fu") + lit(HorizonUs), col("endu")))
      .select(
        col("user_id"),
        when(
          col("pu").isNotNull && col("pu") < col("fup"),
          expr("(pu - fu) div 3600000000"))
          .otherwise(expr("(fup - fu) div 3600000000")).as("t"),
        (col("pu").isNotNull && col("pu") < col("fup"))
          .cast("long").as("ev"))
  }

  /** The DuckDB twin of [[survivalLabels]]: CTEs `svu`/`sve`/`svlab`
    * (user_id, t, ev) — splice with `WITH [RECURSIVE] $..., ...`.
    */
  private[queries] val SurvivalLabelCtes: String =
    s"""svu AS (
      |  SELECT user_id,
      |    min(epoch_us(CAST(ts AS TIMESTAMP))) fu,
      |    min(CASE WHEN event_type = 'purchase'
      |        THEN epoch_us(CAST(ts AS TIMESTAMP)) END) pu
      |  FROM events GROUP BY 1),
      |sve AS (SELECT max(epoch_us(CAST(ts AS TIMESTAMP))) endu FROM events),
      |svlab AS (
      |  SELECT user_id,
      |    CASE WHEN pu IS NOT NULL AND pu < fup
      |      THEN (pu - fu) // 3600000000
      |      ELSE (fup - fu) // 3600000000 END t,
      |    CASE WHEN pu IS NOT NULL AND pu < fup THEN 1 ELSE 0 END ev
      |  FROM (SELECT user_id, fu, pu, least(fu + $HorizonUs, endu) fup
      |        FROM svu CROSS JOIN sve))""".stripMargin

  def survivalKm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val grid = survivalLabels(spark, dir)
      .groupBy(col("t"))
      .agg(
        sum(col("ev")).as("d"),
        (count(lit(1)) - sum(col("ev"))).as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var nAt = grid.map(r => r._2 + r._3).sum
    var s = 0L
    var first = true
    val out = grid.map { case (t, d, c) =>
      s = if (first) { first = false; (nAt - d) * 1000000L / nAt }
      else s * (nAt - d) / nAt
      val row = (t, nAt, d, c, s)
      nAt -= d + c
      row
    }
    out.toSeq.toDF("t", "n_at", "d", "c", "s_ppm")
  }

  /** The native-recursive-CTE statement of [[survivalKm]] — kept as
    * the spec-pinned twin (SqlSurfaceSpec compares it row-for-row to
    * the driver fold), and as the suite's exemplar of a data-sized
    * recursion whose probe side MUST be materialized first.
    */
  private[queries] def survivalKmRcte(
      spark: SparkSession, dir: String): DataFrame = {
    val lab = survivalLabels(spark, dir)
    val dg = lab.groupBy(col("t"))
      .agg(
        sum(col("ev")).as("d"),
        (count(lit(1)) - sum(col("ev"))).as("c"))
      .localCheckpoint(eager = false) // totals + triangular join reuse
    val tot = dg.agg(sum(col("d") + col("c")).as("ntot"))
    val km = dg.as("a")
      .join(
        broadcast(dg.select(
          col("t").as("t2"), (col("d") + col("c")).as("rm2"))),
        col("t2") < col("a.t"), "left")
      .groupBy(col("a.t").as("t"), col("a.d").as("d"), col("a.c").as("c"))
      .agg(
        (count(col("t2")) + 1).as("rn"),
        coalesce(sum(col("rm2")), lit(0L)).as("rm_below"))
      .crossJoin(broadcast(tot)) // 1-row total: documented exception
      .select(
        col("rn"), col("t"), (col("ntot") - col("rm_below")).as("n_at"),
        col("d"), col("c"))
    // MATERIALIZE the probe side before the recursion: UnionLoop
    // re-evaluates the joined relation once PER LEVEL, so an
    // unmaterialized km re-runs the fact aggregate ~50 times
    // (measured 8.8s at sf0.1 — and that cost would GROW with the
    // corpus). Eager-checkpointed, each level probes a ~50-row local
    // relation; the remaining ~0.1s/level is UnionLoop's scheduling
    // floor — constant in data size (a LocalRelation probe measures
    // identically), the k_core_peel per-round-floor class.
    km.localCheckpoint(eager = true).createOrReplaceTempView("km_days_surv")
    val key = "spark.sql.cteRecursionLevelLimit"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, 100000)
    try {
      spark.sql(
        """WITH RECURSIVE s(rn, t, n_at, d, c, s_ppm) AS (
          |  SELECT rn, t, n_at, d, c, (n_at - d) * 1000000L div n_at
          |  FROM km_days_surv WHERE rn = 1
          |  UNION ALL
          |  SELECT k.rn, k.t, k.n_at, k.d, k.c,
          |    s.s_ppm * (k.n_at - k.d) div k.n_at
          |  FROM s JOIN km_days_surv k ON k.rn = s.rn + 1
          |)
          |SELECT t, n_at, d, c, s_ppm FROM s ORDER BY t""".stripMargin)
        .localCheckpoint(eager = true)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  def survivalKmOracle: String =
    s"""WITH RECURSIVE $SurvivalLabelCtes,
      |lab AS (SELECT t, ev FROM svlab),
      |dg AS (
      |  SELECT CAST(t AS BIGINT) t, CAST(SUM(ev) AS BIGINT) d,
      |    CAST(SUM(1 - ev) AS BIGINT) c
      |  FROM lab GROUP BY 1),
      |tot AS (SELECT CAST(SUM(d + c) AS BIGINT) ntot FROM dg),
      |km AS (
      |  SELECT a.t, a.d, a.c, CAST(1 + COUNT(b.t) AS BIGINT) rn,
      |    CAST(ntot - COALESCE(SUM(b.d + b.c), 0) AS BIGINT) n_at
      |  FROM dg a CROSS JOIN tot LEFT JOIN dg b ON b.t < a.t
      |  GROUP BY a.t, a.d, a.c, ntot),
      |s AS (
      |  SELECT rn, t, n_at, d, c,
      |    CAST((n_at - d) * 1000000 // n_at AS BIGINT) s_ppm
      |  FROM km WHERE rn = 1
      |  UNION ALL
      |  SELECT k.rn, k.t, k.n_at, k.d, k.c,
      |    CAST(s.s_ppm * (k.n_at - k.d) // k.n_at AS BIGINT)
      |  FROM s JOIN km k ON k.rn = s.rn + 1)
      |SELECT t, n_at, d, c, s_ppm FROM s ORDER BY t""".stripMargin

  /** `holt_linear`: Holt's double-exponential smoothing of the daily
    * purchase-revenue series — level + trend with α = β = 1/4, the
    * forecasting step up from `ewma_smooth` (a level-only smoother
    * lags every ramp; the trend term is what tracks one), emitting
    * per day the observed cents, smoothed level, trend, and the
    * 7-step-ahead linear forecast l + 7b that a capacity plan reads.
    * The recurrence l_t = (y_t + 3(l+b))/4, b_t = (l_t − l + 3b)/4 is
    * inherently sequential, and every step quantizes to integer
    * cents IDENTICALLY in both engines: the trend term goes NEGATIVE
    * on a dip, and Scala/Spark integer division and DuckDB integer
    * `//` ALL truncate toward zero there (verified: -9846//4 = -2461
    * in DuckDB — its `//` floors only on doubles), so the plain
    * quotient is already engine-identical and no sign-split is
    * needed. Zero floats, hash-exact.
    *
    * Plan: one fact aggregate to the BOUNDED day grid (~10³ rows at
    * a multi-year window, whatever the corpus size), then the
    * sequential smoother folds DRIVER-SIDE over the collected grid
    * (the bounded-driver-arithmetic exception, as [[survivalKm]]).
    * The smoother runs over days PRESENT (like ewma_smooth's
    * self-normalization): a calendar gap advances one step, it does
    * not inject a phantom zero-revenue day. The native recursive CTE
    * form survives as [[holtLinearRcte]], spec-pinned to this fold.
    */
  def holtLinear(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val grid = Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(Quantize.cents(col("value"))).as("y_c"))
      .collect()
      .map(r => (r.getDate(0), r.getLong(1)))
      .sortBy(_._1.getTime)
    var l = 0L
    var b = 0L
    var first = true
    val out = grid.map { case (d, y) =>
      if (first) { first = false; l = y; b = 0L }
      else {
        val ln = (y + 3 * (l + b)) / 4
        val bn = (ln - l + 3 * b) / 4
        l = ln; b = bn
      }
      (d, y, l, b, l + 7 * b)
    }
    out.toSeq.toDF("day", "y_c", "level_c", "trend_c", "forecast7_c")
  }

  /** The native-recursive-CTE statement of [[holtLinear]] — kept as
    * the spec-pinned twin; see [[survivalKmRcte]].
    */
  private[queries] def holtLinearRcte(
      spark: SparkSession, dir: String): DataFrame = {
    val day = Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(Quantize.cents(col("value"))).as("y_c"))
      .localCheckpoint(eager = false) // both sides of the rn join
    val rn = day.as("a")
      .join(
        broadcast(day.select(col("day").as("d2"))),
        col("d2") < col("a.day"), "left")
      .groupBy(col("a.day").as("day"), col("a.y_c").as("y_c"))
      .agg((count(col("d2")) + 1).as("rn"))
    // materialized for the same per-level re-evaluation reason as
    // survival_km's km_days_surv (see the comment there)
    rn.localCheckpoint(eager = true).createOrReplaceTempView("holt_days")
    // The two update equations; lNew is spliced into bNew because SQL
    // cannot reference a select-list alias in the same select list.
    val lNew = "(d.y_c + 3 * (h.l_c + h.b_c)) div 4"
    val bNew = s"(($lNew) - h.l_c + 3 * h.b_c) div 4"
    val key = "spark.sql.cteRecursionLevelLimit"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, 100000)
    try {
      spark.sql(
        s"""WITH RECURSIVE h(rn, day, y_c, l_c, b_c) AS (
          |  SELECT rn, day, y_c, y_c, 0L FROM holt_days WHERE rn = 1
          |  UNION ALL
          |  SELECT d.rn, d.day, d.y_c, $lNew, $bNew
          |  FROM h JOIN holt_days d ON d.rn = h.rn + 1
          |)
          |SELECT day, y_c, l_c AS level_c, b_c AS trend_c,
          |  l_c + 7 * b_c AS forecast7_c
          |FROM h ORDER BY day""".stripMargin)
        .localCheckpoint(eager = true)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  def holtLinearOracle: String =
    s"""WITH RECURSIVE dg AS (
      |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    CAST(SUM(${Quantize.centsSql("value")}) AS BIGINT) y_c
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |rnd AS (
      |  SELECT a.day AS day, a.y_c, CAST(1 + COUNT(b.day) AS BIGINT) rn
      |  FROM dg a LEFT JOIN dg b ON b.day < a.day
      |  GROUP BY a.day, a.y_c),
      |h AS (
      |  SELECT rn, day, y_c, y_c l_c, CAST(0 AS BIGINT) b_c
      |  FROM rnd WHERE rn = 1
      |  UNION ALL
      |  SELECT d.rn, d.day, d.y_c,
      |    (d.y_c + 3 * (h.l_c + h.b_c)) // 4,
      |    (((d.y_c + 3 * (h.l_c + h.b_c)) // 4) - h.l_c + 3 * h.b_c) // 4
      |  FROM h JOIN rnd d ON d.rn = h.rn + 1)
      |SELECT day, y_c, l_c AS level_c, b_c AS trend_c,
      |  l_c + 7 * b_c AS forecast7_c
      |FROM h ORDER BY day""".stripMargin

  /** `holt_winters`: triple-exponential (additive Holt-Winters)
    * smoothing of the daily purchase-revenue series — the seasonal
    * step up from [[holtLinear]] (level+trend tracks a ramp but lags
    * every weekly rhythm; the per-weekday seasonal term is what
    * absorbs it). State: level, trend, and SEVEN weekday seasonal
    * components (isodow-indexed), all integer cents with
    * α = β = γ = 1/4 as the same div-4 recurrences:
    * l_t = (y − s_wd + 3(l+b)) div 4, b_t = (l_t − l + 3b) div 4,
    * s'_wd = (y − l_t + 3·s_wd) div 4; fitted_t = l + b + s_wd is the
    * one-step-ahead forecast BEFORE the update (the honest backtest
    * value). First day seeds l = y, b = 0, all s = 0. Negative
    * intermediates truncate toward zero identically in Scala, Spark
    * `div`, and DuckDB integer `//` (the holt_linear verification).
    *
    * Plan: one fact aggregate to the bounded day grid; the 9-state
    * sequential smoother folds DRIVER-SIDE over the collected grid
    * (the bounded-driver-arithmetic exception, as [[holtLinear]]);
    * the oracle replays it as a DuckDB recursive CTE carrying the
    * seven seasonal columns.
    */
  def holtWinters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val grid = Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(Quantize.cents(col("value"))).as("y_c"))
      .select(col("day"), col("y_c"), expr("weekday(day) + 1").as("wd"))
      .collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getInt(2)))
      .sortBy(_._1.getTime)
    var l = 0L
    var b = 0L
    val s = Array.fill(8)(0L) // isodow 1..7
    var first = true
    val out = grid.map { case (d, y, wd) =>
      if (first) {
        first = false; l = y; b = 0L
        (d, y, l, b, 0L, y)
      } else {
        val sOld = s(wd)
        val fitted = l + b + sOld
        val lN = (y - sOld + 3 * (l + b)) / 4
        val bN = (lN - l + 3 * b) / 4
        val sN = (y - lN + 3 * sOld) / 4
        l = lN; b = bN; s(wd) = sN
        (d, y, l, b, sN, fitted)
      }
    }
    out.toSeq
      .toDF("day", "y_c", "level_c", "trend_c", "seas_c", "fitted_c")
  }

  def holtWintersOracle: String = {
    val sOld = "(CASE d.wd WHEN 1 THEN h.s1 WHEN 2 THEN h.s2 " +
      "WHEN 3 THEN h.s3 WHEN 4 THEN h.s4 WHEN 5 THEN h.s5 " +
      "WHEN 6 THEN h.s6 ELSE h.s7 END)"
    val lN = s"((d.y_c - $sOld + 3 * (h.l_c + h.b_c)) // 4)"
    val bN = s"(($lN - h.l_c + 3 * h.b_c) // 4)"
    val sN = s"((d.y_c - $lN + 3 * $sOld) // 4)"
    def sCol(k: Int): String =
      s"CASE WHEN d.wd = $k THEN $sN ELSE h.s$k END"
    s"""WITH RECURSIVE dg AS (
       |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
       |    CAST(SUM(${Quantize.centsSql("value")}) AS BIGINT) y_c
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
       |rnd AS (
       |  SELECT a.day AS day, a.y_c,
       |    CAST(isodow(a.day) AS BIGINT) wd,
       |    CAST(1 + COUNT(b.day) AS BIGINT) rn
       |  FROM dg a LEFT JOIN dg b ON b.day < a.day
       |  GROUP BY a.day, a.y_c),
       |h AS (
       |  SELECT rn, day, y_c, wd, y_c l_c, CAST(0 AS BIGINT) b_c,
       |    CAST(0 AS BIGINT) seas_c, y_c fitted_c,
       |    CAST(0 AS BIGINT) s1, CAST(0 AS BIGINT) s2,
       |    CAST(0 AS BIGINT) s3, CAST(0 AS BIGINT) s4,
       |    CAST(0 AS BIGINT) s5, CAST(0 AS BIGINT) s6,
       |    CAST(0 AS BIGINT) s7
       |  FROM rnd WHERE rn = 1
       |  UNION ALL
       |  SELECT d.rn, d.day, d.y_c, d.wd,
       |    $lN, $bN, $sN, h.l_c + h.b_c + $sOld,
       |    ${sCol(1)}, ${sCol(2)}, ${sCol(3)}, ${sCol(4)},
       |    ${sCol(5)}, ${sCol(6)}, ${sCol(7)}
       |  FROM h JOIN rnd d ON d.rn = h.rn + 1)
       |SELECT day, y_c, l_c AS level_c, b_c AS trend_c, seas_c, fitted_c
       |FROM h ORDER BY day""".stripMargin
  }

  /** `pivot_sql_roundtrip`: the native SQL `PIVOT` and `UNPIVOT`
    * clauses exercised as an IDENTITY — revenue by (month, priority)
    * pivots to a wide month×5 matrix, unpivots back to long form,
    * and the long form re-aggregates beside the pre-pivot original
    * with the difference count pinned INSIDE the hash (0 rows must
    * differ; `zz_diff` row). The DataFrame twins (`pivot_counts`,
    * `unpivot_metrics`) state the same operators through the API;
    * this row proves the SQL clauses — including UNPIVOT's
    * NULL-dropping contract, which is exactly what makes the
    * roundtrip lossless only because every (month, priority) cell
    * here is populated… and where it isn't, the diff row would
    * say so loudly.
    *
    * Plan: one orders scan → month×priority grid; pivot/unpivot are
    * grid-shaped projections; the identity check is a grid-sized
    * full-outer compare. Nothing fact-sized moves twice.
    */
  def pivotSqlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    Tables.read(spark, dir, "orders")
      .createOrReplaceTempView("orders_pivot")
    spark.sql(
      s"""WITH base AS (
         |  SELECT month(o_orderdate) AS mon,
         |    translate(o_orderpriority, '- ', '__') AS prio,
         |    CAST(sum(${Quantize.centsSql("o_totalprice")}) AS BIGINT)
         |      AS rev_c
         |  FROM orders_pivot GROUP BY 1, 2),
         |wide AS (
         |  SELECT * FROM base
         |  PIVOT (sum(rev_c) FOR prio IN (
         |    '1_URGENT' AS p1, '2_HIGH' AS p2, '3_MEDIUM' AS p3,
         |    '4_NOT_SPECIFIED' AS p4, '5_LOW' AS p5))),
         |long AS (
         |  SELECT mon, prio, rev_c FROM wide
         |  UNPIVOT (rev_c FOR prio IN (
         |    p1 AS `1_URGENT`, p2 AS `2_HIGH`, p3 AS `3_MEDIUM`,
         |    p4 AS `4_NOT_SPECIFIED`, p5 AS `5_LOW`))),
         |diff AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n FROM (
         |    (SELECT mon, prio, rev_c FROM base
         |     EXCEPT
         |     SELECT mon, prio, rev_c FROM long)
         |    UNION ALL
         |    (SELECT mon, prio, rev_c FROM long
         |     EXCEPT
         |     SELECT mon, prio, rev_c FROM base)))
         |SELECT CAST(mon AS BIGINT) AS mon, p1, p2, p3, p4, p5,
         |  CAST(NULL AS BIGINT) AS diff_rows FROM wide
         |UNION ALL
         |SELECT CAST(NULL AS BIGINT), NULL, NULL, NULL, NULL, NULL, n
         |FROM diff
         |ORDER BY mon NULLS LAST""".stripMargin)
  }

  def pivotSqlRoundtripOracle: String = {
    def cell(p: String) =
      s"CAST(SUM(CASE WHEN prio = '$p' THEN rev_c END) AS BIGINT)"
    s"""WITH base AS (
       |  SELECT month(CAST(o_orderdate AS TIMESTAMP)) AS mon,
       |    translate(o_orderpriority, '- ', '__') AS prio,
       |    CAST(sum(${Quantize.centsSql("o_totalprice")}) AS BIGINT)
       |      AS rev_c
       |  FROM orders GROUP BY 1, 2),
       |wide AS (
       |  SELECT mon, ${cell("1_URGENT")} p1, ${cell("2_HIGH")} p2,
       |    ${cell("3_MEDIUM")} p3, ${cell("4_NOT_SPECIFIED")} p4,
       |    ${cell("5_LOW")} p5
       |  FROM base GROUP BY mon)
       |SELECT CAST(mon AS BIGINT) AS mon, p1, p2, p3, p4, p5,
       |  CAST(NULL AS BIGINT) AS diff_rows FROM wide
       |UNION ALL
       |SELECT CAST(NULL AS BIGINT), NULL, NULL, NULL, NULL, NULL,
       |  CAST(0 AS BIGINT)
       |ORDER BY mon NULLS LAST""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("survival_km", survivalKm, Some(survivalKmOracle)),
    QueryDef(
      "pivot_sql_roundtrip", pivotSqlRoundtrip,
      Some(pivotSqlRoundtripOracle)),
    QueryDef("holt_linear", holtLinear, Some(holtLinearOracle)),
    QueryDef("holt_winters", holtWinters, Some(holtWintersOracle)),
    QueryDef(
      "not_in_null_trap", notInNullTrap, Some(notInNullTrapOracle)),
    QueryDef("sql_udf_surface", sqlUdfSurface, Some(sqlUdfSurfaceOracle)),
    QueryDef("sql_script", sqlScript, Some(sqlScriptOracle)),
    QueryDef("rcte_levels", rcteLevels, Some(rcteLevelsOracle)),
    QueryDef("lateral_topk", lateralTopk, Some(lateralTopkOracle)),
    QueryDef("existence_join", existenceJoin, Some(existenceJoinOracle)))
}
