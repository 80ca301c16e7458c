package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Gap-fill relational inventory (SURVEY §2.6) over the TPC-H-ish star
  * schema. All built-in Spark operators; every query is deterministic
  * (explicit total ordering, exact decimal aggregation surfaced as
  * double) so the DuckDB oracle hash-matches bit-for-bit.
  *
  * Scale notes (100 TB): dimension joins (region/nation/customer/
  * supplier) broadcast — no shuffle of the fact side; fact-fact joins
  * (orders⋈lineitem) hash-shuffle on the join key, which AQE re-plans
  * at runtime; aggregations are partial+final automatically.
  */
object Relational {

  /** Exact sum of a 2-decimal-place double column, surfaced as double:
    * decimal aggregation is order-independent, so Spark's and DuckDB's
    * parallel sums agree exactly (SURVEY §7.3 DuckDB-determinism).
    */
  private def sumExact(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")
  private val SumExactSql = "CAST(SUM(CAST(%s AS DECIMAL(18,2))) AS DOUBLE)"

  /** Round-11 exact-revenue discipline (the q9 split-sum pattern,
    * guide §2.3): ep·(1−d) per row in 1e-4-dollar LONGS — the
    * DECIMAL(18,2) casts are unchanged, the precision-37 product and
    * precision-38 sum are not paid per fact row. [[sumE4]] carries
    * the sum as quotient/remainder longs (exact for either sign,
    * overflow-safe past 10^14 rows per group); [[reconE4]] rebuilds
    * the exact DECIMAL(38,0) e4 total once per output group.
    */
  private def revE4: Column =
    (col("l_extendedprice").cast(DecimalType(18, 2)) * 100).cast("long") *
      (lit(100L) -
        (col("l_discount").cast(DecimalType(18, 2)) * 100).cast("long"))
  private def sumE4(a: String): Seq[Column] = Seq(
    sum(expr(s"$a div 1000000")).as(s"${a}_q"),
    sum(expr(s"$a % 1000000")).as(s"${a}_r"))
  private def reconE4(a: String): Column =
    col(s"${a}_q").cast(DecimalType(38, 0)) * 1000000 + col(s"${a}_r")
  /** The exact e4 total surfaced as the decimal sum's double. */
  private def e4Double(a: String): Column =
    (reconE4(a) / 10000).cast("double")
  /** floor(sum·100) of the old 4-decimal sum — cents, non-negative. */
  private def e4Cents(a: String): Column =
    floor(reconE4(a) / 100).cast("long")

  /** Timestamp literal resolved in the SESSION timezone (UTC per
    * build.sbt/Verify/Bench), not the JVM default —
    * java.sql.Timestamp.valueOf would shift the boundary on any
    * non-UTC driver host and silently diverge from the DuckDB
    * oracle's naive TIMESTAMP literals.
    */
  private def ts(s: String): Column =
    to_timestamp(lit(s))

  // --- q1: scan + filter + hash aggregation (TPC-H Q1 shape) ---

  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    // Round 11: the q9 split-sum discipline — per-row values as exact
    // scaled-integer longs (cents / 1e-4 dollars after the unchanged
    // DECIMAL(18,2) casts), summed as quotient/remainder long pairs,
    // each measure reconstructed exactly in DECIMAL(38,0) once per
    // output group and surfaced as the same correctly-rounded double
    // the decimal sums produced. Removes the per-fact-row
    // BigDecimal products and precision-28/38 sum updates.
    val li = Tables.read(spark, dir, "lineitem")
    val qc = (col("l_quantity").cast(DecimalType(18, 2)) * 100)
      .cast("long")
    val epc = (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
      .cast("long")
    val dc = (col("l_discount").cast(DecimalType(18, 2)) * 100)
      .cast("long")
    def reconC(q: Column, r: Column): Column =
      ((q.cast(DecimalType(38, 0)) * 1000000 + r) / 100).cast("double")
    li.where(col("l_shipdate") <= ts("2000-12-31 00:00:00"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        qc.as("qc"), epc.as("epc"),
        (epc * (lit(100L) - dc)).as("v_e4"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(expr("qc div 1000000")).as("qq"),
        sum(expr("qc % 1000000")).as("qr"),
        sum(expr("epc div 1000000")).as("eq"),
        sum(expr("epc % 1000000")).as("er"),
        sum(expr("v_e4 div 1000000")).as("vq"),
        sum(expr("v_e4 % 1000000")).as("vr"),
        count(lit(1)).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        reconC(col("qq"), col("qr")).as("sum_qty"),
        reconC(col("eq"), col("er")).as("sum_base_price"),
        ((col("vq").cast(DecimalType(38, 0)) * 1000000 + col("vr")) / 10000)
          .cast("double").as("sum_disc_price"),
        (reconC(col("qq"), col("qr")) / col("count_order")).as("avg_qty"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  def q1Oracle: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${SumExactSql.format("l_quantity")} AS sum_qty,
       |  ${SumExactSql.format("l_extendedprice")} AS sum_base_price,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       |  ${SumExactSql.format("l_quantity")} / COUNT(*) AS avg_qty,
       |  CAST(COUNT(*) AS BIGINT) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // --- q3: broadcast dim join + shuffle fact join + top-k ---

  def q3TopK(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.read(spark, dir, "customer")
      .where(col("c_mktsegment") === "BUILDING")
    val ord = Tables.read(spark, dir, "orders")
      .where(col("o_orderdate") < ts("1999-01-01 00:00:00"))
    val li = Tables.read(spark, dir, "lineitem")
      .where(col("l_shipdate") > ts("1999-01-01 00:00:00"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("l_orderkey"), col("o_orderdate"), revE4.as("v"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sumE4("v").head, sumE4("v").tail: _*)
      .select(
        col("l_orderkey"), col("o_orderdate"),
        e4Double("v").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  def q3Oracle: String =
    """SELECT l_orderkey, o_orderdate,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // --- q5: multi-way join, dims broadcast, revenue per nation ---

  def q5Regional(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.read(spark, dir, "region")
      .where(col("r_name") === "ASIA")
    val nation = Tables.read(spark, dir, "nation")
    val cust = Tables.read(spark, dir, "customer")
    val supp = Tables.read(spark, dir, "supplier")
    val ord = Tables.read(spark, dir, "orders")
      .where(
        col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
          col("o_orderdate") < ts("1998-01-01 00:00:00"))
    val li = Tables.read(spark, dir, "lineitem")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(
        broadcast(supp),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name"), revE4.as("v"))
      .groupBy(col("n_name"))
      .agg(sumE4("v").head, sumE4("v").tail: _*)
      .select(col("n_name"), e4Double("v").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  def q5Oracle: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // --- semi / anti / outer joins ---

  def joinSemi(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.read(spark, dir, "customer")
    val bigOrders = Tables.read(spark, dir, "orders")
      .where(col("o_totalprice") > 400000.0)
    cust
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  def joinSemiOracle: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      |ORDER BY c_custkey""".stripMargin

  def joinAnti(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.read(spark, dir, "customer")
    val bigOrders = Tables.read(spark, dir, "orders")
      .where(col("o_totalprice") > 400000.0)
    cust
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  def joinAntiOracle: String =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      |ORDER BY c_custkey""".stripMargin

  /** Full outer join with orphans on both sides: nations having
    * high-balance customers vs nations having low-balance suppliers.
    */
  def joinFull(spark: SparkSession, dir: String): DataFrame = {
    val custN = Tables.read(spark, dir, "customer")
      .where(col("c_acctbal") > 9000.0)
      .groupBy(col("c_nationkey").as("nk_c"))
      .agg(count(lit(1)).as("n_cust"))
    val suppN = Tables.read(spark, dir, "supplier")
      .where(col("s_acctbal") < 500.0)
      .groupBy(col("s_nationkey").as("nk_s"))
      .agg(count(lit(1)).as("n_supp"))
    custN
      .join(suppN, col("nk_c") === col("nk_s"), "full_outer")
      .select(
        coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
        col("n_cust"), col("n_supp"))
      .orderBy("nationkey")
  }

  def joinFullOracle: String =
    """SELECT COALESCE(c.nk, s.nk) AS nationkey, c.n_cust, s.n_supp
      |FROM (SELECT c_nationkey nk, CAST(COUNT(*) AS BIGINT) n_cust
      |      FROM customer WHERE c_acctbal > 9000.0 GROUP BY 1) c
      |FULL OUTER JOIN (SELECT s_nationkey nk, CAST(COUNT(*) AS BIGINT) n_supp
      |      FROM supplier WHERE s_acctbal < 500.0 GROUP BY 1) s
      |  ON c.nk = s.nk
      |ORDER BY nationkey""".stripMargin

  def joinLeftAgg(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.read(spark, dir, "customer")
    val ord = Tables.read(spark, dir, "orders")
    cust
      .join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sumExact(col("o_totalprice")), lit(0.0)).as("total_spent"))
      .orderBy("c_custkey")
  }

  def joinLeftAggOracle: String =
    s"""SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
       |  COALESCE(${SumExactSql.format("o_totalprice")}, 0.0) AS total_spent
       |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  // --- window functions ---

  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.read(spark, dir, "orders")
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    ord
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("long").as("rn"),
        rank()
          .over(Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc))
          .cast("long")
          .as("rk"))
      .where(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  def windowRankOracle: String =
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
      |    RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rk
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    ev.select(
        col("user_id"), col("event_id"),
        sum(col("value").cast(DecimalType(18, 2)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double")
          .as("running_value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        row_number().over(w).cast("long").as("seq"))
      .orderBy("user_id", "seq")
  }

  def windowRunningOracle: String =
    """SELECT user_id, event_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_value,
      |  LAG(value, 1) OVER w AS prev_value,
      |  ROW_NUMBER() OVER w AS seq
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
      |ORDER BY user_id, seq""".stripMargin

  // --- global top-k (TakeOrderedAndProject) ---

  def topkOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .limit(10)

  def topkOrdersOracle: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  // --- set operations ---

  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.read(spark, dir, "orders")
    def buyers(y: Int): DataFrame =
      ord.where(year(col("o_orderdate")) === y).select(col("o_custkey"))
    val both = buyers(1998).intersect(buyers(1999))
      .select(lit("both").as("tag"), col("o_custkey"))
    val only98 = buyers(1998).except(buyers(1999))
      .select(lit("only_1998").as("tag"), col("o_custkey"))
    both.union(only98).orderBy("tag", "o_custkey")
  }

  def setOpsOracle: String =
    """SELECT 'both' AS tag, o_custkey FROM (
      |  SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1998
      |  INTERSECT
      |  SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1999)
      |UNION ALL
      |SELECT 'only_1998' AS tag, o_custkey FROM (
      |  SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1998
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1999)
      |ORDER BY tag, o_custkey""".stripMargin

  // --- rollup / cube (grouping-set nulls materialized as 'ALL') ---

  def rollupSales(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumExact(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("n"))
      .orderBy("rf", "ls")

  def rollupSalesOracle: String =
    s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
       |  COALESCE(l_linestatus, 'ALL') AS ls,
       |  ${SumExactSql.format("l_quantity")} AS sum_qty,
       |  CAST(COUNT(*) AS BIGINT) AS n
       |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY rf, ls""".stripMargin

  def cubePriority(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sumExact(col("o_totalprice")).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy("status", "priority")

  def cubePriorityOracle: String =
    s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       |  COALESCE(o_orderpriority, 'ALL') AS priority,
       |  CAST(COUNT(*) AS BIGINT) AS n,
       |  ${SumExactSql.format("o_totalprice")} AS total
       |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
       |ORDER BY status, priority""".stripMargin

  // --- distinct aggregation ---

  def distinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_cust"))
      .orderBy("c_mktsegment")

  def distinctAggOracle: String =
    """SELECT c_mktsegment,
      |  CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
      |  CAST(COUNT(*) AS BIGINT) AS n_cust
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // --- exact dedup: keep first event per (user, type) ---

  def dedupEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val w = Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    ev.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"))
      .orderBy("user_id", "event_type")
  }

  def dedupEventsOracle: String =
    """SELECT user_id, event_type, event_id FROM (
      |  SELECT user_id, event_type, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
      |  FROM events)
      |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  /** Sketch aggregation: HyperLogLog++ distinct counts next to exact
    * ones. Sketch internals are engine-specific, so the raw estimates
    * can't hash-match DuckDB; instead the output carries the exact
    * counts plus booleans asserting the HLL++ estimates stay inside
    * their error bounds (3x the configured rsd), which the oracle
    * states as constant TRUE — if an estimate ever drifted out of
    * bounds the hash compare would go red. QueriesSpec additionally
    * bounds the raw estimates.
    */
  def sketchDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("event_id"), 0.02).as("approx_events"),
        // event_id is the table's primary key, so COUNT(*) ==
        // COUNT(DISTINCT event_id); a second countDistinct column
        // would force an Expand (x2 rows) for no information. The
        // oracle deliberately states COUNT(DISTINCT event_id): if
        // uniqueness ever broke, this row would go red.
        count(lit(1)).as("exact_events"))
      .select(
        col("event_type"), col("exact_users"), col("exact_events"),
        (abs(col("approx_users") - col("exact_users")) <=
          col("exact_users") * 0.15).as("users_in_bounds"),
        (abs(col("approx_events") - col("exact_events")) <=
          col("exact_events") * 0.06).as("events_in_bounds"))
      .orderBy("event_type")

  def sketchDistinctOracle: String =
    """SELECT event_type,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  CAST(COUNT(DISTINCT event_id) AS BIGINT) AS exact_events,
      |  TRUE AS users_in_bounds, TRUE AS events_in_bounds
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Two-phase salted aggregation: the skew pattern for low-cardinality
    * hot keys (5 event types over the whole table would hash to 5
    * reducers at cluster scale). Phase 1 groups by (key, salt) — 16-way
    * fan-out of each hot key with map-side combine; phase 2 merges the
    * tiny salted partials. Result is identical to the direct groupBy
    * (the oracle states the plain aggregation).
    */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy(col("event_type"), col("salt"))
      .agg(
        count(lit(1)).as("pn"),
        sum(col("value").cast(DecimalType(18, 2))).as("pv"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("pn")).as("n"),
        sum(col("pv")).cast("double").as("total"))
      .orderBy("event_type")

  def saltedAggOracle: String =
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) total
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** `share_of_parent`: hierarchical contribution ratios — each
    * nation's revenue share WITHIN its region and each region's share
    * of the total, the OLAP drill-down readout a plain rollup doesn't
    * give (rollup emits the level totals; this divides across
    * adjacent levels). One fact-sized aggregate to the nation grain,
    * then region and grand totals re-aggregate from the nation grid
    * (never re-scanning facts) and broadcast back — ratios in integer
    * ppm of cents, so the division is floor-exact in both engines.
    * The ppm cross-products run in DECIMAL(38,0)/HUGEINT (the
    * linreg_trend discipline): region_cents·10⁶ crosses 2^63 right at
    * the 100× replica — the round-9 sf10 gate caught the raw-BIGINT
    * form failing loud under ANSI there.
    */
  def shareOfParent(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.read(spark, dir, "nation")
    val region = Tables.read(spark, dir, "region")
    val cust = Tables.read(spark, dir, "customer")
    val byNation = Tables.read(spark, dir, "orders")
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(Quantize.cents(col("o_totalprice"))).as("cents"))
    val byRegion = byNation.groupBy(col("r_name"))
      .agg(sum(col("cents")).as("r_cents"))
    val total = byRegion.agg(sum(col("r_cents")).as("t_cents"))
    byNation
      .join(broadcast(byRegion), "r_name")
      .crossJoin(broadcast(total))
      .select(
        col("r_name"), col("n_name"), col("cents"),
        expr("CAST(CAST(cents AS DECIMAL(38,0)) * 1000000 div r_cents" +
          " AS BIGINT)").as("nation_share_ppm"),
        expr("CAST(CAST(r_cents AS DECIMAL(38,0)) * 1000000 div t_cents" +
          " AS BIGINT)").as("region_share_ppm"))
      .orderBy("r_name", "n_name")
  }

  def shareOfParentOracle: String =
    s"""WITH bn AS (
       |  SELECT r_name, n_name,
       |    CAST(sum(${Quantize.centsSql("o_totalprice")}) AS BIGINT) cents
       |  FROM orders
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |  GROUP BY 1, 2),
       |br AS (SELECT r_name, CAST(sum(cents) AS BIGINT) r_cents
       |  FROM bn GROUP BY 1),
       |t AS (SELECT CAST(sum(r_cents) AS BIGINT) t_cents FROM br)
       |SELECT bn.r_name, bn.n_name, bn.cents,
       |  CAST(CAST(bn.cents AS HUGEINT) * 1000000 // br.r_cents
       |    AS BIGINT) nation_share_ppm,
       |  CAST(CAST(br.r_cents AS HUGEINT) * 1000000 // t.t_cents
       |    AS BIGINT) region_share_ppm
       |FROM bn JOIN br ON bn.r_name = br.r_name, t
       |ORDER BY bn.r_name, bn.n_name""".stripMargin

  /** `q9_profit`: the TPC-H Q9 "product-type profit" shape adapted to
    * this schema (no partsupp table: supply cost proxies as retail
    * price × quantity) — profit per (supplier nation, ship year), the
    * canonical star-join + multi-dim rollup every warehouse runs.
    * Exact decimal arithmetic per the file's discipline: DECIMAL(18,2)
    * products, summed exactly, surfaced as double once.
    *
    * Plan shape: lineitem joins THREE broadcast dimensions (part,
    * supplier, nation) — zero shuffles of the fact side — then one
    * (nation, year) aggregate. At 100 TB this is the plan you want: a
    * single fact scan, dims ride task binaries, map-side partial
    * aggregation collapses to a 175-row grid.
    */
  def q9Profit(spark: SparkSession, dir: String): DataFrame = {
    // Round 11 (guide §2.3 narrower types / §1.2 per-task work): the
    // DECIMAL(18,2) products ran at precision 37 and the sum at 38 —
    // the non-compact BigDecimal path, per fact row, inside the
    // single-task scan stage. The same EXACT value in 1e-4-dollar
    // integer units: each factor is integral after the (unchanged)
    // DECIMAL(18,2) cast ×100, so the per-row value v_e4 =
    // ep_c·(100−d_c) − rp_c·q_c is exact long arithmetic (|v_e4| ≲
    // 1e9 ≪ 2^63). The sum is carried as SPLIT longs (quotient /
    // remainder by 1e6; v = 1e6·(v div 1e6) + (v % 1e6) exactly for
    // either sign) so each partial stays ≲ rows·1e3 and rows·1e6 —
    // overflow-safe past 10^14 rows per group where a single long sum
    // of v_e4 would clip near 10^9.5 rows. The exact total is
    // reconstructed ONCE per output group in DECIMAL(38,0) and
    // surfaced as double through an exact scale-4 value — the same
    // correctly-rounded double the decimal sum produced. rp_c is
    // hoisted onto the broadcast part dimension (once per part, not
    // per fact row).
    val li = Tables.read(spark, dir, "lineitem")
    val part = Tables.read(spark, dir, "part").select(
      col("p_partkey"),
      (col("p_retailprice").cast(DecimalType(18, 2)) * 100)
        .cast("long").as("rp_c"))
    val supp = Tables.read(spark, dir, "supplier")
    val nation = Tables.read(spark, dir, "nation")
    val epC = (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
      .cast("long")
    val dC = (col("l_discount").cast(DecimalType(18, 2)) * 100)
      .cast("long")
    val qC = (col("l_quantity").cast(DecimalType(18, 2)) * 100)
      .cast("long")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(
        col("n_name").as("nation"),
        year(col("l_shipdate")).cast("long").as("o_year"),
        (epC * (lit(100L) - dC) - col("rp_c") * qC).as("v_e4"))
      .groupBy(col("nation"), col("o_year"))
      .agg(
        sum(expr("v_e4 div 1000000")).as("vq"),
        sum(expr("v_e4 % 1000000")).as("vr"))
      .select(
        col("nation"), col("o_year"),
        ((col("vq").cast(DecimalType(38, 0)) * 1000000 + col("vr")) / 10000)
          .cast("double").as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  def q9ProfitOracle: String =
    """SELECT n_name AS nation,
      |  CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |             (1 - CAST(l_discount AS DECIMAL(18,2))) -
      |           CAST(p_retailprice AS DECIMAL(18,2)) *
      |             CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  /** `q18_large_orders`: the TPC-H Q18 "large volume customer" shape —
    * orders whose total line quantity exceeds a threshold, joined out
    * to the order header and customer. The HAVING-gate is computed
    * FIRST on the fact table (one l_orderkey aggregate) so only the
    * ~0.3% surviving keys join onward: the qualifying-key set is tiny
    * and broadcasts into the orders probe, and customer broadcasts as a
    * dimension — at 100 TB the only fact-sized shuffle is the initial
    * orderkey aggregate (map-side combinable, co-partitioned with
    * lineitem's natural key). Quantities route through Quantize.cents
    * so the threshold compare is integer-exact on both engines. Final
    * top-100 by (totalprice desc, orderkey) plans TakeOrderedAndProject.
    */
  private val Q18MinQtyCents = 250L * 100L

  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val qual = Tables.read(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(Quantize.cents(col("l_quantity"))).as("sum_qty_c"))
      .where(col("sum_qty_c") > Q18MinQtyCents)
    Tables.read(spark, dir, "orders")
      .join(broadcast(qual), col("o_orderkey") === col("l_orderkey"))
      .join(
        broadcast(Tables.read(spark, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .select(
        col("c_custkey"), col("c_name"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("o_date"),
        Quantize.cents(col("o_totalprice")).as("price_c"),
        col("sum_qty_c"))
      .orderBy(col("price_c").desc, col("o_orderkey"))
      .limit(100)
  }

  def q18LargeOrdersOracle: String =
    s"""WITH qual AS (
       |  SELECT l_orderkey,
       |    CAST(SUM(${Quantize.centsSql("l_quantity")}) AS BIGINT) sum_qty_c
       |  FROM lineitem GROUP BY 1
       |  HAVING CAST(SUM(${Quantize.centsSql("l_quantity")}) AS BIGINT)
       |    > $Q18MinQtyCents)
       |SELECT c_custkey, c_name, o_orderkey,
       |  CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) o_date,
       |  ${Quantize.centsSql("o_totalprice")} price_c, sum_qty_c
       |FROM orders JOIN qual ON o_orderkey = l_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |ORDER BY price_c DESC, o_orderkey LIMIT 100""".stripMargin

  /** `q13_custdist`: the TPC-H Q13 "customer distribution" shape —
    * how many customers placed exactly k orders, INCLUDING the
    * zero-order customers only an outer join can see (the classic
    * left-outer + double-aggregate: count(o_orderkey) skips the
    * null-extended rows, so no-order customers land in the k=0
    * bucket instead of vanishing). First aggregate is customer-grain
    * (co-partitioned with the join's own shuffle); the second
    * collapses to the ~40-row order-count histogram — nothing after
    * the join is ever fact-sized. At 100 TB AQE picks
    * broadcast-vs-shuffle for the dim side from true sizes.
    */
  def q13Custdist(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "customer")
      .join(
        Tables.read(spark, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  def q13CustdistOracle: String =
    """WITH co AS (
      |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |SELECT c_count, CAST(COUNT(*) AS BIGINT) custdist
      |FROM co GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** `q4_priority`: the TPC-H Q4 "order priority checking" shape —
    * orders with at least one LATE line (shipped > 30 days after the
    * order date), counted per priority. The correlated EXISTS states
    * as a left-semi join whose condition spans both sides
    * (l_orderkey match AND the lateness comparison) — Spark plans the
    * non-equi part as the semi join's residual, so the probe stays an
    * equi hash join on orderkey, co-partitioned with lineitem's
    * natural key; output collapses to the 5-row priority grid.
    */
  def q4Priority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.read(spark, dir, "orders")
    val li = Tables.read(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    ord
      .join(
        li,
        col("o_orderkey") === col("l_orderkey") &&
          to_date(col("l_shipdate")) > date_add(to_date(col("o_orderdate")), 30),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  def q4PriorityOracle: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) order_count
      |FROM orders
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey
      |    AND CAST(CAST(l_shipdate AS TIMESTAMP) AS DATE)
      |      > CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) + 30)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** `q22_idle_customers`: the TPC-H Q22 "global sales opportunity"
    * shape — customers richer than the positive-balance average with
    * no RECENT order (nothing since 2001-06-01; the dataset's every
    * customer has ordered at some point, so the literal never-ordered
    * form is empty — the recency window keeps the anti join earning
    * its place), rolled up per nation. Two classic sub-shapes in one
    * plan: a SCALAR SUBQUERY (the global average, one broadcast row)
    * and an ANTI JOIN. The above-average compare cross-multiplies in
    * integer cents (bal·n > Σbal) instead of comparing against a
    * float average — the suite's exact-compare discipline — and the
    * recency filter pushes to the orders scan before the anti probe.
    */
  private val Q22Cutoff = "2001-06-01"

  def q22IdleCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.read(spark, dir, "customer")
      .withColumn("bal_c", Quantize.cents(col("c_acctbal")))
    val stats = cust.where(col("bal_c") > 0)
      .agg(sum(col("bal_c")).as("s"), count(lit(1)).as("n"))
    cust
      .crossJoin(broadcast(stats))
      .where(col("bal_c") * col("n") > col("s"))
      .join(
        Tables.read(spark, dir, "orders")
          .where(to_date(col("o_orderdate")) >= lit(Q22Cutoff).cast("date"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").cast("long").as("nation"))
      .agg(
        count(lit(1)).as("numcust"),
        sum(col("bal_c")).as("totacctbal_c"))
      .orderBy("nation")
  }

  def q22IdleCustomersOracle: String =
    s"""WITH c AS (
       |  SELECT c_custkey, c_nationkey, ${Quantize.centsSql("c_acctbal")} bal_c
       |  FROM customer),
       |s AS (
       |  SELECT CAST(sum(bal_c) AS BIGINT) s, CAST(count(*) AS BIGINT) n
       |  FROM c WHERE bal_c > 0)
       |SELECT CAST(c_nationkey AS BIGINT) nation,
       |  CAST(count(*) AS BIGINT) numcust,
       |  CAST(sum(bal_c) AS BIGINT) totacctbal_c
       |FROM c, s
       |WHERE bal_c * n > s
       |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
       |    AND CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE)
       |      >= DATE '$Q22Cutoff')
       |GROUP BY 1 ORDER BY nation""".stripMargin

  /** `q14_type_share`: the TPC-H Q14 "promotion effect" shape — the
    * share of revenue coming from one part type (ECONOMY stands in
    * for PROMO%) per ship month, as a CONDITIONAL aggregate: both the
    * numerator (gated by the joined dimension attribute) and the
    * denominator come from the SAME fact pass over lineitem ⋈
    * broadcast(part). Revenue is exact DECIMAL(18,2)
    * price·(1−discount) per the q9 discipline; the share surfaces in
    * integer ppm via cents cross-division so no float ratio is ever
    * compared. One fact scan, zero fact shuffles, month-grid output.
    */
  def q14TypeShare(spark: SparkSession, dir: String): DataFrame = {
    // Round 11: q9/q1 split-sum discipline. rev_e4 ≥ 0 (price ≥ 0,
    // discount ≤ 1), so the old floor(sum · 100) is exactly the
    // DECIMAL(38,0) reconstruction div 100 — truncation and floor
    // agree on non-negatives.
    val vE4 = (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
      .cast("long") *
      (lit(100L) -
        (col("l_discount").cast(DecimalType(18, 2)) * 100).cast("long"))
    def cents(q: Column, r: Column): Column =
      floor((q.cast(DecimalType(38, 0)) * 1000000 + r) / 100).cast("long")
    Tables.read(spark, dir, "lineitem")
      .join(
        broadcast(Tables.read(spark, dir, "part")),
        col("l_partkey") === col("p_partkey"))
      .select(
        year(col("l_shipdate")).cast("long").as("yr"),
        month(col("l_shipdate")).cast("long").as("mo"),
        vE4.as("v_e4"),
        when(col("p_type") === "ECONOMY", vE4).otherwise(lit(0L))
          .as("econ_e4"))
      .groupBy(col("yr"), col("mo"))
      .agg(
        sum(expr("econ_e4 div 1000000")).as("aq"),
        sum(expr("econ_e4 % 1000000")).as("ar"),
        sum(expr("v_e4 div 1000000")).as("tq"),
        sum(expr("v_e4 % 1000000")).as("tr"))
      .select(
        col("yr"), col("mo"),
        cents(col("aq"), col("ar")).as("economy_c"),
        cents(col("tq"), col("tr")).as("total_c"))
      .withColumn(
        // NULL-guard per the suite convention (lsh_recall,
        // selectivity_estimate): group rows can't be empty on this
        // data, but an empty month bucket must yield NULL, not an
        // ANSI DIVIDE_BY_ZERO.
        "economy_ppm",
        expr("CASE WHEN total_c = 0 THEN NULL " +
          "ELSE economy_c * 1000000 div total_c END"))
      .orderBy("yr", "mo")
  }

  def q14TypeShareOracle: String =
    """WITH m AS (
      |  SELECT CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) yr,
      |    CAST(month(CAST(l_shipdate AS DATE)) AS BIGINT) mo,
      |    CAST(floor(SUM(CASE WHEN p_type = 'ECONOMY'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |      ELSE CAST(0 AS DECIMAL(18,2)) END) * 100) AS BIGINT) economy_c,
      |    CAST(floor(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 100) AS BIGINT)
      |      total_c
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1, 2)
      |SELECT yr, mo, economy_c, total_c,
      |  CASE WHEN total_c = 0 THEN NULL
      |    ELSE economy_c * 1000000 // total_c END economy_ppm
      |FROM m ORDER BY yr, mo""".stripMargin

  /** `q10_returned`: the TPC-H Q10 "returned item reporting" shape —
    * revenue lost to returns (l_returnflag = 'R') per customer over a
    * quarter, top 20 by lost revenue. The return-flag and date
    * filters push to the lineitem scan, orders shuffles once on the
    * natural key, customer + nation broadcast; revenue follows the
    * q9 exact-decimal discipline floored to cents (the q14 lesson),
    * and the top 20 by (revenue desc, custkey) plans
    * TakeOrderedAndProject.
    */
  def q10Returned(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.read(spark, dir, "lineitem")
      .where(col("l_returnflag") === "R")
    val ord = Tables.read(spark, dir, "orders")
      .where(
        col("o_orderdate") >= ts("2000-01-01 00:00:00") &&
          col("o_orderdate") < ts("2000-07-01 00:00:00"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(
        broadcast(Tables.read(spark, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .join(
        broadcast(Tables.read(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), revE4.as("v"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sumE4("v").head, sumE4("v").tail: _*)
      .select(
        col("c_custkey"), col("c_name"), col("n_name"),
        e4Cents("v").as("lost_c"))
      .orderBy(col("lost_c").desc, col("c_custkey"))
      .limit(20)
  }

  def q10ReturnedOracle: String =
    """SELECT c_custkey, c_name, n_name,
      |  CAST(floor(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 100) AS BIGINT)
      |    lost_c
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '2000-07-01 00:00:00'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY lost_c DESC, c_custkey LIMIT 20""".stripMargin

  /** `q21_waiting`: the TPC-H Q21 "suppliers who kept orders waiting"
    * shape — the planner's classic EXISTS + NOT EXISTS stressor,
    * chained on the SAME fact. A supplier's late line (shipped > 30
    * days after the order date, the suite's q4 lateness contract, on
    * finished orders) counts iff the order is multi-supplier (EXISTS
    * a line from another supplier) and this supplier is the SOLE
    * late one (NOT EXISTS a late line from another supplier).
    * Stated as residual-condition left-semi and left-anti joins: all
    * three legs are equi joins on l_orderkey — co-partitioned with
    * lineitem's natural key, so one shuffle family, no fact-sized
    * rework — with the `l_suppkey <>` inequality planned as the
    * join residual (never a CartesianProduct; PlanShapeSpec pins
    * this). Supplier names broadcast at the 100-row tail.
    */
  def q21Waiting(spark: SparkSession, dir: String): DataFrame = {
    val ordF = Tables.read(spark, dir, "orders")
      .where(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = Tables.read(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    // late lines of finished orders, the l1 side of the chain
    val late = li
      .join(ordF, col("l_orderkey") === col("o_orderkey"))
      .where(
        to_date(col("l_shipdate")) > date_add(to_date(col("o_orderdate")), 30))
      .select(col("l_orderkey"), col("l_suppkey"))
    val l2 = li.select(
      col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
    val l3 = late.select(
      col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
    late
      .join(
        l2,
        col("l_orderkey") === col("k2") && col("l_suppkey") =!= col("s2"),
        "left_semi")
      .join(
        l3,
        col("l_orderkey") === col("k3") && col("l_suppkey") =!= col("s3"),
        "left_anti")
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(
        broadcast(Tables.read(spark, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(100)
  }

  def q21WaitingOracle: String =
    """WITH late AS (
      |  SELECT l_orderkey, l_suppkey
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'
      |    AND CAST(CAST(l_shipdate AS TIMESTAMP) AS DATE)
      |      > CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) + 30)
      |SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) numwait
      |FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE EXISTS (SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM late l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey)
      |GROUP BY 1, 2
      |ORDER BY numwait DESC, s_suppkey LIMIT 100""".stripMargin

  /** `q19_disjunctive`: the TPC-H Q19 "discounted revenue" shape —
    * an OR-of-ANDs predicate spanning BOTH join sides (brand × size
    * band × quantity band), stated whole ABOVE the join, the way a
    * user writes it. The plan question this row exists to pin: what
    * does Catalyst push? Conjunctive pushdown is proven elsewhere in
    * the suite; here the optimizer must CNF-extract the per-table
    * weakening of the disjunction — `(brand₁∧size₁) ∨ (brand₂∧size₂)
    * ∨ …` onto the part scan and the quantity-band union onto the
    * lineitem scan — while the full cross-table disjunction
    * evaluates as the join filter. PlanShapeSpec asserts exactly
    * that: Or-shaped PushedFilters on BOTH parquet scans, full
    * predicate residual at the join. At 100 TB the scan-level
    * weakenings are what keep the probe from reading every row
    * group: parquet min/max prunes on quantity and brand/size before
    * the join ever sees a row.
    */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    val band = (
      col("p_brand") === "Brand#12" &&
        col("p_size").between(1, 10) && col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" &&
        col("p_size").between(1, 20) && col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#34" &&
        col("p_size").between(1, 30) && col("l_quantity").between(20, 30))
    Tables.read(spark, dir, "lineitem")
      .join(
        broadcast(Tables.read(spark, dir, "part")),
        col("l_partkey") === col("p_partkey"))
      .where(band)
      .select(col("p_brand"), revE4.as("v"))
      .groupBy(col("p_brand"))
      .agg(sumE4("v").head, sumE4("v").tail: _*)
      .select(col("p_brand"), e4Cents("v").as("revenue_c"))
      .orderBy("p_brand")
  }

  def q19DisjunctiveOracle: String =
    """SELECT p_brand,
      |  CAST(floor(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 100) AS BIGINT)
      |    revenue_c
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
      |    AND l_quantity BETWEEN 1 AND 11)
      |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
      |    AND l_quantity BETWEEN 10 AND 20)
      |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 30
      |    AND l_quantity BETWEEN 20 AND 30)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** `q17_small_qty`: the TPC-H Q17 "small-quantity-order revenue"
    * shape — revenue from lines whose quantity is below 20% of the
    * part's average quantity, for two brands. The correlated scalar
    * subquery (`avg(l_quantity)` per part) decorrelates into a
    * part-grain aggregate BROADCAST back onto the probe — never a
    * per-row subquery. The below-average compare cross-multiplies in
    * integer centi-units (5·n·q < Σq ⟺ q < 0.2·avg), so no float
    * average is ever compared; revenue follows the q9/q14 exact
    * decimal-cents discipline, and the yearly average is integer
    * division of cents by 7 on both engines. The brand filter prunes
    * via the broadcast part join before either aggregate, so the
    * part-grain stats relation is filtered-parts-sized — tiny — and
    * broadcastable at any SF.
    */
  def q17SmallQty(spark: SparkSession, dir: String): DataFrame = {
    val brands = Seq("Brand#23", "Brand#31")
    val parts = Tables.read(spark, dir, "part")
      .where(col("p_brand").isin(brands: _*))
      .select(col("p_partkey"), col("p_brand"))
    val li2 = Tables.read(spark, dir, "lineitem")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .select(
        col("p_brand"), col("p_partkey"),
        Quantize.cents(col("l_quantity")).as("ql"),
        col("l_extendedprice").cast(DecimalType(18, 2)).as("px"))
    val stats = li2.groupBy(col("p_partkey").as("sk"))
      .agg(sum(col("ql")).as("sq"), count(lit(1)).as("n"))
    li2
      .join(broadcast(stats), col("p_partkey") === col("sk"))
      .where(col("ql") * col("n") * 5 < col("sq"))
      .groupBy(col("p_brand"))
      .agg(floor(sum(col("px")) * 100).cast("long").as("lost_c"))
      .withColumn("avg_yearly_c", expr("lost_c div 7"))
      .orderBy("p_brand")
  }

  def q17SmallQtyOracle: String =
    s"""WITH li2 AS (
       |  SELECT p_brand, p_partkey, ${Quantize.centsSql("l_quantity")} ql,
       |    CAST(l_extendedprice AS DECIMAL(18,2)) px
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE p_brand IN ('Brand#23', 'Brand#31')),
       |st AS (
       |  SELECT p_partkey, CAST(sum(ql) AS BIGINT) sq,
       |    CAST(count(*) AS BIGINT) n
       |  FROM li2 GROUP BY 1)
       |SELECT p_brand, CAST(floor(sum(px) * 100) AS BIGINT) lost_c,
       |  CAST(floor(sum(px) * 100) AS BIGINT) // 7 avg_yearly_c
       |FROM li2 JOIN st USING (p_partkey)
       |WHERE ql * n * 5 < sq
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** `q2_min_cost_supplier`: the TPC-H Q2 "minimum cost supplier"
    * shape — for each qualifying part, the supplier(s) achieving the
    * part's minimum supply cost within one region. The schema has no
    * partsupp, so the supply relation derives from the fact: cost of
    * (part, supplier) := min observed line price in cents — ONE fact
    * shuffle on (partkey, suppkey), which is lineitem's natural
    * locality. The correlated `min(cost) per part` decorrelates the
    * q17 way: a part-grain aggregate over the already-filtered
    * candidate set, broadcast back; all dimension joins (supplier ⋈
    * nation ⋈ region, part attributes) broadcast. Ties all surface,
    * ordered by richest supplier (exact cents) with full key
    * tie-breaks, top 100 via TakeOrderedAndProject.
    */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val asia = Tables.read(spark, dir, "supplier")
      .join(
        broadcast(
          Tables.read(spark, dir, "nation").join(
            broadcast(Tables.read(spark, dir, "region")
              .where(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(
        col("s_suppkey"), col("s_name"), col("n_name"),
        Quantize.cents(col("s_acctbal")).as("bal_c"))
    val parts = Tables.read(spark, dir, "part")
      .where(col("p_size") <= 10 && col("p_type") === "STANDARD")
      .select(col("p_partkey"))
    val supply = Tables.read(spark, dir, "lineitem")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("l_suppkey"))
      .agg(min(Quantize.cents(col("l_extendedprice"))).as("cost_c"))
    val cand = supply.join(
      broadcast(asia), col("l_suppkey") === col("s_suppkey"))
    val minc = cand.groupBy(col("p_partkey").as("mk"))
      .agg(min(col("cost_c")).as("min_c"))
    cand
      .join(
        broadcast(minc),
        col("p_partkey") === col("mk") && col("cost_c") === col("min_c"))
      .select(
        col("bal_c"), col("s_name"), col("n_name"), col("p_partkey"),
        col("cost_c"))
      .orderBy(
        col("bal_c").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  def q2MinCostSupplierOracle: String =
    s"""WITH asia AS (
       |  SELECT s_suppkey, s_name, n_name,
       |    ${Quantize.centsSql("s_acctbal")} bal_c
       |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |  WHERE r_name = 'ASIA'),
       |cand AS (
       |  SELECT l.l_partkey p_partkey, a.s_name, a.n_name, a.bal_c,
       |    CAST(min(${Quantize.centsSql("l_extendedprice")}) AS BIGINT)
       |      cost_c
       |  FROM lineitem l
       |  JOIN part p ON l.l_partkey = p.p_partkey
       |  JOIN asia a ON l.l_suppkey = a.s_suppkey
       |  WHERE p.p_size <= 10 AND p.p_type = 'STANDARD'
       |  GROUP BY 1, 2, 3, 4)
       |SELECT bal_c, s_name, n_name, p_partkey, cost_c
       |FROM cand c
       |WHERE cost_c = (SELECT min(cost_c) FROM cand c2
       |  WHERE c2.p_partkey = c.p_partkey)
       |ORDER BY bal_c DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin

  /** `q15_top_supplier`: the TPC-H Q15 "top supplier" shape — the
    * revenue view (per-supplier quarter revenue in exact decimal
    * cents) consumed twice: once for its global max (a 1-row
    * broadcast aggregate, the q22 scalar-subquery pattern) and once
    * as the probe that keeps every supplier achieving it. One fact
    * scan with the quarter filter pushed, one shuffle on suppkey;
    * everything after is supplier-grain.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val view = Tables.read(spark, dir, "lineitem")
      .where(
        col("l_shipdate") >= ts("1997-01-01 00:00:00") &&
          col("l_shipdate") < ts("1997-04-01 00:00:00"))
      .select(col("l_suppkey"), revE4.as("v"))
      .groupBy(col("l_suppkey"))
      .agg(sumE4("v").head, sumE4("v").tail: _*)
      .select(col("l_suppkey"), e4Cents("v").as("total_c"))
    val mx = view.agg(max(col("total_c")).as("mx"))
    view
      .crossJoin(broadcast(mx))
      .where(col("total_c") === col("mx"))
      .join(
        broadcast(Tables.read(spark, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_c"))
      .orderBy("s_suppkey")
  }

  def q15TopSupplierOracle: String =
    """WITH rv AS (
      |  SELECT l_suppkey,
      |    CAST(floor(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 100) AS BIGINT)
      |      total_c
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, total_c
      |FROM rv JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_c = (SELECT max(total_c) FROM rv)
      |ORDER BY s_suppkey""".stripMargin

  /** `q20_dominant_supplier`: the TPC-H Q20 two-level nested-IN
    * shape — suppliers IN (the set supplying a part IN (the
    * name-filtered part set) with a correlated-aggregate condition:
    * their 1997 shipped quantity for that part exceeds HALF the
    * part's total 1997 shipped quantity across all suppliers — the
    * availqty>½·shipped analog this schema supports). Decorrelation:
    * (part, supplier)-grain sums — one fact shuffle, name filter
    * pre-joined broadcast — then the part-grain total broadcast back
    * (the dominance compare cross-multiplies: 2·q > tot, integer
    * centi-units); the outer IN becomes a left-semi join of supplier
    * against the distinct dominant suppkeys.
    */
  def q20DominantSupplier(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.read(spark, dir, "part")
      .where(col("p_name").startsWith("small"))
      .select(col("p_partkey"))
    val ship = Tables.read(spark, dir, "lineitem")
      .where(year(col("l_shipdate")) === 1997)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("l_suppkey"))
      .agg(sum(Quantize.cents(col("l_quantity"))).as("q"))
    val tot = ship.groupBy(col("p_partkey").as("tk"))
      .agg(sum(col("q")).as("tq"))
    val dominant = ship
      .join(
        broadcast(tot),
        col("p_partkey") === col("tk") && col("q") * 2 > col("tq"))
      .select(col("l_suppkey")).distinct()
    Tables.read(spark, dir, "supplier")
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_suppkey")
  }

  def q20DominantSupplierOracle: String =
    s"""WITH ship AS (
       |  SELECT l_partkey, l_suppkey,
       |    CAST(sum(${Quantize.centsSql("l_quantity")}) AS BIGINT) q
       |  FROM lineitem
       |  WHERE year(CAST(l_shipdate AS TIMESTAMP)) = 1997
       |    AND l_partkey IN (SELECT p_partkey FROM part
       |      WHERE p_name LIKE 'small%')
       |  GROUP BY 1, 2)
       |SELECT s_suppkey, s_name FROM supplier
       |WHERE s_suppkey IN (
       |  SELECT l_suppkey FROM ship s1
       |  WHERE 2 * q > (SELECT sum(q) FROM ship s2
       |    WHERE s2.l_partkey = s1.l_partkey))
       |ORDER BY s_suppkey""".stripMargin

  /** `q6_forecast`: the TPC-H Q6 "forecasting revenue change" shape —
    * the pure scan-side query: three conjunctive single-column
    * predicates (ship year, discount band, quantity cap) and one
    * exact-decimal product sum, no joins at all. Its whole value is
    * the PLAN: every filter must reach the parquet scan's
    * PushedFilters and the aggregate must collapse map-side to one
    * row per task — at 100 TB this query is a single pruned
    * column-scan (3 of 11 lineitem columns) and nothing else.
    * The discount band compares on round(d*100) integers, not raw
    * doubles: the generator's 0.05 is a binary fraction neither
    * engine should be trusted to compare with `BETWEEN 0.05 AND 0.07`.
    */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.read(spark, dir, "lineitem")
    li.where(
        col("l_shipdate") >= ts("1997-01-01 00:00:00") &&
          col("l_shipdate") < ts("1998-01-01 00:00:00") &&
          Quantize.cents(col("l_discount")).between(5, 7) &&
          col("l_quantity") < 24)
      .select(
        ((col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
          .cast("long") *
          (col("l_discount").cast(DecimalType(18, 2)) * 100).cast("long"))
          .as("v"))
      .agg(
        (sumE4("v") :+ count(lit(1)).as("n_lines")).head,
        (sumE4("v") :+ count(lit(1)).as("n_lines")).tail: _*)
      .select(e4Double("v").as("revenue"), col("n_lines"))
  }

  def q6ForecastOracle: String =
    s"""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
       |             CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) revenue,
       |  CAST(COUNT(*) AS BIGINT) n_lines
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       |  AND ${Quantize.centsSql("l_discount")} BETWEEN 5 AND 7
       |  AND l_quantity < 24""".stripMargin

  /** `q7_volume_shipping`: the TPC-H Q7 "volume shipping" shape —
    * bilateral trade between two nations: revenue per (supplier
    * nation, customer nation, ship year) for the two directed pairs
    * (N1→N2, N2→N1) over a two-year window. Decorrelation of the
    * pair predicate: supplier and customer each pre-join their
    * nation BROADCAST and pre-filter to the two nations — the pair
    * disjunction then reduces to `supp_nation <> cust_nation` on the
    * surviving rows (both sides are in {N1,N2}), evaluated as the
    * fact join's residual. One fact-fact shuffle (lineitem⋈orders on
    * orderkey, lineitem's natural key); both dim joins broadcast; at
    * 100 TB the ship-date window prunes the scan and the 2-nation
    * dim filters make the broadcast sides tiny.
    */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val nations = Set("NATION_1", "NATION_2")
    val nation = Tables.read(spark, dir, "nation")
      .where(col("n_name").isin(nations.toSeq: _*))
    val supp = Tables.read(spark, dir, "supplier")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.read(spark, dir, "customer")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables.read(spark, dir, "lineitem")
      .where(
        col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1998-01-01 00:00:00"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(
        Tables.read(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .where(col("supp_nation") =!= col("cust_nation"))
      .select(
        col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"), revE4.as("v"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sumE4("v").head, sumE4("v").tail: _*)
      .select(
        col("supp_nation"), col("cust_nation"), col("l_year"),
        e4Double("v").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  def q7VolumeShippingOracle: String =
    """SELECT sn.n_name supp_nation, cn.n_name cust_nation,
      |  CAST(year(CAST(l_shipdate AS TIMESTAMP)) AS BIGINT) l_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
      |    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** `q8_market_share`: the TPC-H Q8 "national market share" shape —
    * of all STANDARD-type revenue sold into the ASIA customer market
    * per order year, the share supplied by NATION_2, in integer ppm
    * (exact-cents numerator/denominator, zero-guarded per the suite's
    * convention). The conditional share states as one aggregate with
    * a CASE'd numerator — never two scans. Joins: part (type filter,
    * broadcast) prunes the fact first; orders⋈lineitem is the one
    * fact-fact shuffle; customer→nation→region collapses to an
    * ASIA custkey dimension broadcast; the supplier nation arrives
    * as a broadcast (suppkey → name) map. 100 TB: one lineitem scan,
    * one orderkey shuffle, 2-row output.
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val asiaCust = Tables.read(spark, dir, "customer")
      .join(
        broadcast(
          Tables.read(spark, dir, "nation").join(
            broadcast(Tables.read(spark, dir, "region")
              .where(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val suppNation = Tables.read(spark, dir, "supplier")
      .join(
        broadcast(Tables.read(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val parts = Tables.read(spark, dir, "part")
      .where(col("p_type") === "STANDARD").select(col("p_partkey"))
    // per-row cents: rev_e4 ≥ 0 so (v_e4 div 100) IS the old
    // floor(rev · 100) — pure long arithmetic per row
    val revC = expr("v_e4 div 100")
    Tables.read(spark, dir, "lineitem")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(
        Tables.read(spark, dir, "orders")
          .where(
            col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
              col("o_orderdate") < ts("1998-01-01 00:00:00"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"))
      .withColumn("v_e4", revE4)
      .select(
        year(col("o_orderdate")).cast("long").as("o_year"),
        revC.as("rev_c"),
        when(col("supp_nation") === "NATION_2", lit(1L)).otherwise(lit(0L))
          .as("is_target"))
      .groupBy(col("o_year"))
      .agg(
        sum(col("rev_c") * col("is_target")).as("target_c"),
        sum(col("rev_c")).as("total_c"))
      .withColumn(
        // NULL-guard + integer ppm per the q14 convention.
        "share_ppm",
        expr("CASE WHEN total_c = 0 THEN NULL " +
          "ELSE target_c * 1000000 div total_c END"))
      .select(col("o_year"), col("share_ppm"), col("total_c"))
      .orderBy("o_year")
  }

  def q8MarketShareOracle: String =
    """WITH rv AS (
      |  SELECT CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) o_year,
      |    CAST(floor(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      (1 - CAST(l_discount AS DECIMAL(18,2))) * 100) AS BIGINT) rev_c,
      |    sn.n_name supp_nation
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation cn ON c_nationkey = cn.n_nationkey
      |  JOIN region ON cn.n_regionkey = r_regionkey
      |  WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
      |, agg AS (
      |  SELECT o_year,
      |    CAST(SUM(CASE WHEN supp_nation = 'NATION_2'
      |                  THEN rev_c ELSE 0 END) AS BIGINT) target_c,
      |    CAST(SUM(rev_c) AS BIGINT) total_c
      |  FROM rv GROUP BY o_year)
      |SELECT o_year,
      |  CASE WHEN total_c = 0 THEN NULL
      |    ELSE target_c * 1000000 // total_c END share_ppm,
      |  total_c
      |FROM agg ORDER BY o_year""".stripMargin

  /** `q11_important_stock`: the TPC-H Q11 "important stock
    * identification" shape adapted to this schema (no partsupp:
    * inventory value of a part := exact-cents sum of price×quantity
    * shipped by NATION_3 suppliers). Keep parts whose value exceeds
    * TWICE the mean part value — TPC-H's own fraction scales as
    * 0.0001/SF precisely because a fixed share of the total empties
    * at scale (a fixed 1/1000 cut kept 394 parts at sf0.01 and ZERO
    * at sf1); a mean-relative cut keeps the survivor share stable at
    * any corpus size. The global scalar (total, part count) is a
    * 1-row broadcast aggregate consumed by a cross-multiplied
    * integer compare (value·n_parts > 2·total — never a float
    * fraction). One fact shuffle on partkey; the supplier filter
    * broadcasts. 100 TB: the threshold side is one extra reduction
    * over the already-aggregated part-grain relation — no second
    * fact scan.
    */
  def q11ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    val natSupp = Tables.read(spark, dir, "supplier")
      .join(
        broadcast(Tables.read(spark, dir, "nation")
          .where(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val value = Tables.read(spark, dir, "lineitem")
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(
        sum(
          floor(
            col("l_extendedprice").cast(DecimalType(18, 2)) *
              col("l_quantity").cast(DecimalType(18, 2)) * 100)
            .cast("long"))
          .as("value_c"))
    val tot = value.agg(
      sum(col("value_c")).as("tot_c"), count(lit(1)).as("n_parts"))
    value.crossJoin(broadcast(tot))
      .where(col("value_c") * col("n_parts") > col("tot_c") * 2)
      .select(col("l_partkey"), col("value_c"))
      .orderBy(col("value_c").desc, col("l_partkey"))
  }

  def q11ImportantStockOracle: String =
    """WITH v AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(floor(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      CAST(l_quantity AS DECIMAL(18,2)) * 100) AS BIGINT))
      |      AS BIGINT) value_c
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_3'
      |  GROUP BY 1)
      |, t AS (SELECT SUM(value_c) tot_c, COUNT(*) n_parts FROM v)
      |SELECT l_partkey, value_c FROM v, t
      |WHERE value_c * n_parts > tot_c * 2
      |ORDER BY value_c DESC, l_partkey""".stripMargin

  /** `q12_shipmode`: the TPC-H Q12 "shipping modes and order
    * priority" shape adapted to this schema (no l_shipmode: the mode
    * is the ship-latency band — FAST ≤ 30 days after the order,
    * SLOW otherwise, the suite's q4 lateness contract). Per band,
    * over 1997 shipments: how many lines belong to high-priority
    * orders (1-URGENT/2-HIGH) vs not — the classic pivoted
    * conditional count stated as one aggregate with CASE'd sums.
    * orders⋈lineitem is the single fact-fact shuffle on orderkey;
    * output is the 2-row band grid.
    */
  def q12Shipmode(spark: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.read(spark, dir, "lineitem")
      .where(
        col("l_shipdate") >= ts("1997-01-01 00:00:00") &&
          col("l_shipdate") < ts("1998-01-01 00:00:00"))
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(
        Tables.read(spark, dir, "orders")
          .select(
            col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(
        when(
          to_date(col("l_shipdate")) <=
            date_add(to_date(col("o_orderdate")), 30),
          lit("FAST")).otherwise(lit("SLOW")).as("ship_band"),
        when(high, lit(1L)).otherwise(lit(0L)).as("is_high"))
      .groupBy(col("ship_band"))
      .agg(
        sum(col("is_high")).as("high_line_count"),
        sum(lit(1L) - col("is_high")).as("low_line_count"))
      .orderBy("ship_band")
  }

  def q12ShipmodeOracle: String =
    """SELECT
      |  CASE WHEN CAST(CAST(l_shipdate AS TIMESTAMP) AS DATE)
      |         <= CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) + 30
      |       THEN 'FAST' ELSE 'SLOW' END ship_band,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |                THEN 0 ELSE 1 END) AS BIGINT) low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** `q16_supplier_cnt`: the TPC-H Q16 "parts/supplier relationship"
    * shape — distinct suppliers per (brand, type, size) for a size
    * set, excluding one brand/type family and excluding flagged
    * suppliers (the "customer complaints" NOT IN, adapted to the
    * schema's negative-balance suppliers). The supply relation
    * derives from the fact: (part, supplier) pairs observed in
    * lineitem. NOT IN states as a broadcast left-anti join BEFORE
    * aggregation; the distinct rides the aggregate
    * (countDistinct), which Spark plans as the two-phase
    * partial-distinct expand — no separate dedup pass. One fact
    * shuffle on the grouping key; part attributes broadcast.
    */
  def q16SupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.read(spark, dir, "part")
      .where(
        col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val flagged = Tables.read(spark, dir, "supplier")
      .where(col("s_acctbal") < 0).select(col("s_suppkey"))
    Tables.read(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(
        broadcast(flagged), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(
        col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  def q16SupplierCntOracle: String =
    """SELECT p_brand, p_type, p_size,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      |  AND l_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q6_forecast", q6Forecast, Some(q6ForecastOracle)),
    QueryDef(
      "q7_volume_shipping", q7VolumeShipping, Some(q7VolumeShippingOracle)),
    QueryDef("q8_market_share", q8MarketShare, Some(q8MarketShareOracle)),
    QueryDef(
      "q11_important_stock", q11ImportantStock,
      Some(q11ImportantStockOracle)),
    QueryDef("q12_shipmode", q12Shipmode, Some(q12ShipmodeOracle)),
    QueryDef("q16_supplier_cnt", q16SupplierCnt, Some(q16SupplierCntOracle)),
    QueryDef(
      "q2_min_cost_supplier", q2MinCostSupplier, Some(q2MinCostSupplierOracle)),
    QueryDef("q15_top_supplier", q15TopSupplier, Some(q15TopSupplierOracle)),
    QueryDef(
      "q20_dominant_supplier", q20DominantSupplier,
      Some(q20DominantSupplierOracle)),
    QueryDef("q21_waiting", q21Waiting, Some(q21WaitingOracle)),
    QueryDef("q19_disjunctive", q19Disjunctive, Some(q19DisjunctiveOracle)),
    QueryDef("q17_small_qty", q17SmallQty, Some(q17SmallQtyOracle)),
    QueryDef("q10_returned", q10Returned, Some(q10ReturnedOracle)),
    QueryDef("q14_type_share", q14TypeShare, Some(q14TypeShareOracle)),
    QueryDef("q4_priority", q4Priority, Some(q4PriorityOracle)),
    QueryDef(
      "q22_idle_customers", q22IdleCustomers, Some(q22IdleCustomersOracle)),
    QueryDef("q13_custdist", q13Custdist, Some(q13CustdistOracle)),
    QueryDef("q18_large_orders", q18LargeOrders, Some(q18LargeOrdersOracle)),
    QueryDef("q9_profit", q9Profit, Some(q9ProfitOracle)),
    QueryDef("share_of_parent", shareOfParent, Some(shareOfParentOracle)),
    QueryDef("sketch_distinct", sketchDistinct, Some(sketchDistinctOracle)),
    QueryDef("salted_agg", saltedAgg, Some(saltedAggOracle)),
    QueryDef("q1_agg", q1Agg, Some(q1Oracle)),
    QueryDef("q3_topk", q3TopK, Some(q3Oracle)),
    QueryDef("q5_regional", q5Regional, Some(q5Oracle)),
    QueryDef("join_semi", joinSemi, Some(joinSemiOracle)),
    QueryDef("join_anti", joinAnti, Some(joinAntiOracle)),
    QueryDef("join_full", joinFull, Some(joinFullOracle)),
    QueryDef("join_left_agg", joinLeftAgg, Some(joinLeftAggOracle)),
    QueryDef("window_rank", windowRank, Some(windowRankOracle)),
    QueryDef("window_running", windowRunning, Some(windowRunningOracle)),
    QueryDef("topk_orders", topkOrders, Some(topkOrdersOracle)),
    QueryDef("set_ops", setOps, Some(setOpsOracle)),
    QueryDef("rollup_sales", rollupSales, Some(rollupSalesOracle)),
    QueryDef("cube_priority", cubePriority, Some(cubePriorityOracle)),
    QueryDef("distinct_agg", distinctAgg, Some(distinctAggOracle)),
    QueryDef("dedup_events", dedupEvents, Some(dedupEventsOracle)))
}
