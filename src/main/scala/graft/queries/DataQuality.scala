package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality audit (SURVEY §2.6 gap-fill): the validation gate a
  * production ingest runs before data is allowed into the corpus —
  * named invariant checks with exact violation counts.
  *
  * Scale shape: ONE narrow conditional-aggregate pass per audited
  * table (all of a table's counters come from the same scan via
  * sum(case when), then unpivot through explode(map) on the single
  * 1-row result), plus one anti join for the referential check —
  * orders⋉customer on the key, which AQE plans as a broadcast anti
  * join when the dimension fits and a shuffled one when it doesn't.
  * Nothing here is ever per-row wide; the audit's cost is exactly one
  * pass over each fact table regardless of how many checks share it.
  */
object DataQuality {

  private def unpivot(df: DataFrame, pairs: (String, String)*): DataFrame =
    df.select(
      explode(
        map(pairs.flatMap { case (k, c) => Seq(lit(k), col(c)) }: _*))
        .as(Seq("check_name", "n_violations")))

  def dqAudit(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.read(spark, dir, "orders")
    val cust = Tables.read(spark, dir, "customer")
    val li = Tables.read(spark, dir, "lineitem")
    val ev = Tables.events(spark, dir)

    val orphan = orders
      .join(cust, col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n"))
      .select(
        lit("orders_orphan_custkey").as("check_name"),
        col("n").as("n_violations"))

    val ordChecks = unpivot(
      orders.agg(
        sum(when(col("o_orderdate").isNull, 1L).otherwise(0L))
          .as("null_date"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L))
          .as("nonpos_price")),
      "orders_null_orderdate" -> "null_date",
      "orders_nonpositive_totalprice" -> "nonpos_price")

    val liChecks = unpivot(
      li.agg(
        sum(when(col("l_quantity") <= 0, 1L).otherwise(0L))
          .as("nonpos_qty"),
        sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L)
          .otherwise(0L)).as("bad_discount"),
        sum(when(col("l_shipdate").isNull, 1L).otherwise(0L))
          .as("null_shipdate")),
      "lineitem_nonpositive_quantity" -> "nonpos_qty",
      "lineitem_discount_out_of_range" -> "bad_discount",
      "lineitem_null_shipdate" -> "null_shipdate")

    val evChecks = unpivot(
      ev.agg(
        (count(lit(1)) - countDistinct(col("event_id"))).as("dup_rows"),
        sum(when(col("user_id").isNull, 1L).otherwise(0L))
          .as("null_user"),
        sum(when(
          col("ts") < to_timestamp(lit("2000-01-01 00:00:00")) ||
            col("ts") >= to_timestamp(lit("2030-01-01 00:00:00")),
          1L).otherwise(0L)).as("ts_out_of_range")),
      "events_duplicate_event_id_rows" -> "dup_rows",
      "events_null_user_id" -> "null_user",
      "events_ts_out_of_range" -> "ts_out_of_range")

    orphan.unionAll(ordChecks).unionAll(liChecks).unionAll(evChecks)
      .orderBy("check_name")
  }

  def dqAuditOracle: String =
    """WITH orphan AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) n FROM orders o
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
      |ord AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) null_date,
      |    CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) nonpos_price
      |  FROM orders),
      |li AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) nonpos_qty,
      |    CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) bad_discount,
      |    CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) null_shipdate
      |  FROM lineitem),
      |ev AS (
      |  SELECT
      |    CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT) dup_rows,
      |    CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) null_user,
      |    CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2000-01-01'
      |      OR CAST(ts AS TIMESTAMP) >= TIMESTAMP '2030-01-01' THEN 1 ELSE 0 END) AS BIGINT) ts_oor
      |  FROM events)
      |SELECT check_name, n_violations FROM (
      |  SELECT 'orders_orphan_custkey' check_name, n n_violations FROM orphan
      |  UNION ALL SELECT 'orders_null_orderdate', null_date FROM ord
      |  UNION ALL SELECT 'orders_nonpositive_totalprice', nonpos_price FROM ord
      |  UNION ALL SELECT 'lineitem_nonpositive_quantity', nonpos_qty FROM li
      |  UNION ALL SELECT 'lineitem_discount_out_of_range', bad_discount FROM li
      |  UNION ALL SELECT 'lineitem_null_shipdate', null_shipdate FROM li
      |  UNION ALL SELECT 'events_duplicate_event_id_rows', dup_rows FROM ev
      |  UNION ALL SELECT 'events_null_user_id', null_user FROM ev
      |  UNION ALL SELECT 'events_ts_out_of_range', ts_oor FROM ev)
      |ORDER BY check_name""".stripMargin

  /** Snapshot reconciliation (data diff): classify every key across
    * two versions of a table as added / removed / changed / same —
    * the audit a pipeline runs after a backfill or migration to prove
    * what actually moved. Snapshot B derives deterministically from
    * the customer table (key%11 rows deleted, key%7 balances shifted,
    * synthetic keys appended) so the diff has every outcome. Shape:
    * rows collapse to (key, row-hash) BEFORE the full-outer join —
    * comparing hashes, never wide rows — and the classification is
    * one co-partitioned join + a counts aggregate; at 100 TB both
    * snapshots bucket by key and the join is co-located.
    */
  def tableDiff(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.read(spark, dir, "customer")
    def hashed(df: DataFrame): DataFrame = df.select(
      col("c_custkey").as("k"),
      md5(concat_ws("|",
        col("c_name"), col("c_nationkey"),
        Quantize.cents(col("c_acctbal")), col("c_mktsegment"))).as("h"))
    val a = hashed(cust)
    val b = hashed(
      cust.where(col("c_custkey") % 11 =!= 0)
        .withColumn(
          "c_acctbal",
          when(col("c_custkey") % 7 === 0, col("c_acctbal") + 1.0)
            .otherwise(col("c_acctbal"))))
      .unionByName(
        cust.where(col("c_custkey") % 13 === 0)
          .select((col("c_custkey") + 1000000L).as("k"), md5(lit("new")).as("h")))
    a.select(col("k"), col("h").as("h_a"))
      .join(b.select(col("k"), col("h").as("h_b")), Seq("k"), "full")
      .select(
        when(col("h_a").isNull, "added")
          .when(col("h_b").isNull, "removed")
          .when(col("h_a") =!= col("h_b"), "changed")
          .otherwise("same").as("outcome"))
      .groupBy(col("outcome"))
      .agg(count(lit(1)).as("n_keys"))
      .orderBy("outcome")
  }

  def tableDiffOracle: String = {
    val rowHash =
      s"md5(concat_ws('|', c_name, c_nationkey, " +
        s"${Quantize.centsSql("c_acctbal")}, c_mktsegment))"
    s"""WITH a AS (SELECT c_custkey k, $rowHash h FROM customer),
      |b0 AS (
      |  SELECT c_custkey, c_name, c_nationkey,
      |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 1.0 ELSE c_acctbal END c_acctbal,
      |    c_mktsegment
      |  FROM customer WHERE c_custkey % 11 <> 0),
      |b AS (
      |  SELECT c_custkey k, $rowHash h FROM b0
      |  UNION ALL
      |  SELECT c_custkey + 1000000 k, md5('new') h
      |  FROM customer WHERE c_custkey % 13 = 0)
      |SELECT CASE WHEN a.k IS NULL THEN 'added'
      |            WHEN b.k IS NULL THEN 'removed'
      |            WHEN a.h <> b.h THEN 'changed'
      |            ELSE 'same' END AS outcome,
      |  CAST(COUNT(*) AS BIGINT) n_keys
      |FROM a FULL OUTER JOIN b ON a.k = b.k
      |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** `column_profile`: the per-column profile a data catalog keeps —
    * null count, distinct count, min/max — for every audited column of
    * `orders`. One independent aggregation per column, unioned: each
    * branch's parquet scan prunes to EXACTLY its column (total I/O ==
    * one 5-column scan) and its single-distinct aggregate plans the
    * efficient two-phase shape — the round-5 first cut packed all
    * five distincts into one aggregate, which Spark executes via a 6x
    * row Expand through the shuffle (measured 3x slower than the
    * union at sf0.1 and growing with column count). Min/max compute
    * on the NATIVE type and cast to VARCHAR only for the report, so
    * numeric/date ordering is never string ordering; the price column
    * profiles in exact cents.
    */
  def columnProfile(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.read(spark, dir, "orders")
      .withColumn("cents", Quantize.cents(col("o_totalprice")))
    def prof(name: String, c: String): DataFrame =
      orders.select(col(c))
        .agg(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_v"),
          max(col(c)).cast("string").as("max_v"))
        .select(
          lit(name).as("column_name"), col("n_null"), col("n_distinct"),
          col("min_v"), col("max_v"))
    Seq(
        prof("o_orderkey", "o_orderkey"),
        prof("o_custkey", "o_custkey"),
        prof("o_orderpriority", "o_orderpriority"),
        prof("o_orderdate", "o_orderdate"),
        prof("o_totalprice_cents", "cents"))
      .reduce(_.unionByName(_))
      .orderBy("column_name")
  }

  def columnProfileOracle: String = {
    def prof(name: String, c: String) =
      s"""SELECT '$name' column_name,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) n_null,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) n_distinct,
         |  CAST(MIN($c) AS VARCHAR) min_v, CAST(MAX($c) AS VARCHAR) max_v
         |FROM o""".stripMargin
    s"""WITH o AS (
       |  SELECT *, ${Quantize.centsSql("o_totalprice")} cents FROM orders)
       |SELECT * FROM (
       |${prof("o_orderkey", "o_orderkey")}
       |UNION ALL ${prof("o_custkey", "o_custkey")}
       |UNION ALL ${prof("o_orderpriority", "o_orderpriority")}
       |UNION ALL ${prof("o_orderdate", "o_orderdate")}
       |UNION ALL ${prof("o_totalprice_cents", "cents")})
       |ORDER BY column_name""".stripMargin
  }

  /** `histogram_bins`: equi-width value histogram of order totals —
    * the distribution half of column profiling (column_profile
    * reports the moments/extremes; this reports the SHAPE data
    * engineers eyeball for skew, truncation and outliers before
    * picking partition bounds). One hash aggregate over the
    * cents-quantized fact column into fixed $25,000 bins — the bin
    * count is value-domain-bounded, so the output stays ~20 rows at
    * any scale; share in ppm via one broadcast single-row total.
    * Empty bins are absent (a spine join would add them — gap_fill
    * covers that idiom).
    */
  private val HistWidthCents = 2500000L

  def histogramBins(spark: SparkSession, dir: String): DataFrame = {
    val vals = Tables.read(spark, dir, "orders")
      .select(Quantize.cents(col("o_totalprice")).as("vc"))
    val hist = vals
      .withColumn("bin", expr(s"vc div ${HistWidthCents}L"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        min(col("vc")).as("min_cents"),
        max(col("vc")).as("max_cents"))
    val total = vals.agg(count(lit(1)).as("tot"))
    hist.crossJoin(broadcast(total))
      .select(
        col("bin"),
        (col("bin") * HistWidthCents).as("lo_cents"),
        col("n"), col("min_cents"), col("max_cents"),
        expr("n * 1000000 div tot").as("pct_ppm"))
      .orderBy("bin")
  }

  def histogramBinsOracle: String =
    s"""WITH v AS (
       |  SELECT ${Quantize.centsSql("o_totalprice")} vc FROM orders),
       |h AS (
       |  SELECT vc // $HistWidthCents bin, CAST(count(*) AS BIGINT) n,
       |    min(vc) min_cents, max(vc) max_cents
       |  FROM v GROUP BY 1),
       |t AS (SELECT CAST(count(*) AS BIGINT) tot FROM v)
       |SELECT bin, bin * $HistWidthCents lo_cents, n, min_cents,
       |  max_cents, n * 1000000 // tot pct_ppm
       |FROM h, t ORDER BY bin""".stripMargin

  /** `column_modes`: most-frequent values per audited column — the
    * third profiling face beside column_profile (moments/extremes)
    * and histogram_bins (shape): the top-3 values with ppm shares per
    * categorical column, the default-value / placeholder-pollution
    * detector ('1996-01-01 everywhere' class of bugs). One scan
    * unpivots the audited columns via explode(map), one (column,
    * value) grid aggregate, rank over the grid (column-partitioned,
    * grid-sized), shares from a per-column total re-aggregated off
    * the same grid.
    */
  def columnModes(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grid = Tables.read(spark, dir, "orders")
      .select(explode(map(
        lit("o_orderstatus"), col("o_orderstatus"),
        lit("o_orderpriority"), col("o_orderpriority"))).as(Seq("c", "v")))
      .groupBy(col("c"), col("v"))
      .agg(count(lit(1)).as("n"))
    val totals = grid.groupBy(col("c")).agg(sum(col("n")).as("tot"))
    grid
      .withColumn(
        "rk",
        row_number().over(
          Window.partitionBy(col("c")).orderBy(col("n").desc, col("v"))))
      .where(col("rk") <= 3)
      .join(broadcast(totals), "c")
      .select(
        col("c").as("column_name"), col("rk").cast("long").as("rk"),
        col("v").as("value"),
        col("n"), expr("n * 1000000 div tot").as("share_ppm"))
      .orderBy("column_name", "rk")
  }

  def columnModesOracle: String =
    """WITH g AS (
      |  SELECT c, v, CAST(count(*) AS BIGINT) n FROM (
      |    SELECT 'o_orderstatus' c, o_orderstatus v FROM orders
      |    UNION ALL
      |    SELECT 'o_orderpriority', o_orderpriority FROM orders)
      |  GROUP BY 1, 2),
      |t AS (SELECT c, CAST(sum(n) AS BIGINT) tot FROM g GROUP BY 1),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY c
      |    ORDER BY n DESC, v) rk
      |  FROM g)
      |SELECT r.c column_name, CAST(r.rk AS BIGINT) rk, r.v "value", r.n,
      |  r.n * 1000000 // t.tot share_ppm
      |FROM r JOIN t ON r.c = t.c
      |WHERE r.rk <= 3 ORDER BY column_name, rk""".stripMargin

  /** `k_anonymity`: the privacy-release audit (Sweeney) a dataset runs
    * before sharing — group records by their quasi-identifier tuple
    * (nation, market segment: the columns an adversary can link on) and
    * flag equivalence classes smaller than k=10, whose members are
    * re-identifiable. Beside it the l-diversity count (Machanavalli et
    * al.): distinct sensitive values — account-balance $1000 bands —
    * per class; a class can be k-anonymous yet leak if every member
    * shares one sensitive value. One customer-table aggregate into the
    * ≤125-cell QI grid (nations × segments) — the grid, not the table,
    * is what's ever driver-side, so the audit is one map-side-
    * combinable pass at any scale.
    */
  private val KAnonK = 10L

  def kAnonymity(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "customer")
      .select(
        col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"),
        // +$1000 shift keeps the band operand positive (acctbal goes to
        // −$994), where Spark `div` (truncate) == DuckDB `//` (floor).
        expr(s"(${Quantize.centsSql("c_acctbal")} + 100000) div 100000")
          .as("bal_band"))
      .groupBy(col("nation"), col("segment"))
      .agg(
        count(lit(1)).as("class_size"),
        countDistinct(col("bal_band")).as("l_distinct"))
      .withColumn("at_risk", col("class_size") < KAnonK)
      .orderBy("nation", "segment")

  def kAnonymityOracle: String =
    s"""WITH c AS (
       |  SELECT CAST(c_nationkey AS BIGINT) nation, c_mktsegment segment,
       |    (${Quantize.centsSql("c_acctbal")} + 100000) // 100000 bal_band
       |  FROM customer)
       |SELECT nation, segment, CAST(count(*) AS BIGINT) class_size,
       |  CAST(count(DISTINCT bal_band) AS BIGINT) l_distinct,
       |  count(*) < $KAnonK at_risk
       |FROM c GROUP BY nation, segment
       |ORDER BY nation, segment""".stripMargin

  /** `t_closeness`: the third privacy audit (Li et al.), completing
    * [[kAnonymity]]'s k/l pair — a class can be k-anonymous AND
    * l-diverse yet still leak when its sensitive-value DISTRIBUTION
    * skews far from the table's (all its l distinct balance bands
    * clustered at the rich end says plenty). Distance = 1-D earth
    * mover's over the ordered $1000 balance bands, which for
    * histograms is just Σ|cumulative difference| — stated in exact
    * integers by cross-multiplying the two denominators:
    * cumdiff_b in units of (class count·N − global count·m), and
    * emd_ppm = Σ|cumdiff| · 10⁶ div (m·N·(B−1)) where B is the band
    * count (the (B−1) normalizer makes 10⁶ = "all mass moved end to
    * end"). at_risk pins the t = 0.2 cut the paper suggests.
    *
    * Plan: ONE customer aggregate to the class×band grid (≤125·~20
    * rows), global band totals rolled up FROM THE GRID and broadcast
    * back; the cumulative runs per class over grid rows (never
    * facts). int64: count_class·N caps at ~3·10⁹ customers — loud
    * under ANSI past it.
    */
  def tCloseness(spark: SparkSession, dir: String): DataFrame = {
    val grid = Tables.read(spark, dir, "customer")
      .select(
        col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"),
        expr(s"(${Quantize.centsSql("c_acctbal")} + 100000) div 100000")
          .as("bal_band"))
      .groupBy(col("nation"), col("segment"), col("bal_band"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false) // global rollup + band spine
    val glob = grid.groupBy(col("bal_band")).agg(sum(col("cnt")).as("g"))
      .localCheckpoint(eager = false) // band spine + totals
    val tot = glob.agg(
      sum(col("g")).as("n_all"), count(lit(1)).as("n_bands"))
    // every class needs every band on its cumulative spine (a class
    // missing a band still accumulates the global mass there)
    val classes = grid.groupBy(col("nation"), col("segment"))
      .agg(sum(col("cnt")).as("m"))
    val spine = classes.crossJoin(broadcast(glob)) // grid×bands, bounded
      .join(grid, Seq("nation", "segment", "bal_band"), "left")
      .select(
        col("nation"), col("segment"), col("m"), col("bal_band"),
        coalesce(col("cnt"), lit(0L)).as("cnt"), col("g"))
    val w = Window.partitionBy(col("nation"), col("segment"))
      .orderBy(col("bal_band"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .crossJoin(broadcast(tot)) // 1-row totals: documented exception
      .withColumn(
        "cumdiff", sum(col("cnt") * col("n_all") - col("g") * col("m"))
          .over(w))
      .groupBy(col("nation"), col("segment"), col("m"))
      .agg(
        sum(abs(col("cumdiff"))).as("s"),
        max(col("n_all")).as("n_all"), max(col("n_bands")).as("n_bands"))
      .select(
        col("nation"), col("segment"), col("m").as("class_size"),
        expr("s * 1000000 div (m * n_all * (n_bands - 1))").as("emd_ppm"))
      .withColumn("at_risk", col("emd_ppm") > 200000L)
      .orderBy("nation", "segment")
  }

  def tClosenessOracle: String =
    s"""WITH c AS (
       |  SELECT CAST(c_nationkey AS BIGINT) nation, c_mktsegment segment,
       |    (${Quantize.centsSql("c_acctbal")} + 100000) // 100000 bal_band
       |  FROM customer),
       |g AS (
       |  SELECT nation, segment, bal_band, CAST(count(*) AS BIGINT) cnt
       |  FROM c GROUP BY 1, 2, 3),
       |gl AS (SELECT bal_band, CAST(SUM(cnt) AS BIGINT) gcnt
       |  FROM g GROUP BY 1),
       |tt AS (SELECT CAST(SUM(gcnt) AS BIGINT) n_all,
       |  CAST(COUNT(*) AS BIGINT) n_bands FROM gl),
       |cl AS (SELECT nation, segment, CAST(SUM(cnt) AS BIGINT) m
       |  FROM g GROUP BY 1, 2),
       |sp AS (
       |  SELECT cl.nation, cl.segment, cl.m, gl.bal_band,
       |    COALESCE(g.cnt, 0) cnt, gl.gcnt
       |  FROM cl CROSS JOIN gl
       |  LEFT JOIN g ON g.nation = cl.nation AND g.segment = cl.segment
       |    AND g.bal_band = gl.bal_band),
       |cm AS (
       |  SELECT nation, segment, m,
       |    CAST(SUM(cnt * n_all - gcnt * m) OVER (
       |      PARTITION BY nation, segment ORDER BY bal_band) AS BIGINT)
       |      cumdiff,
       |    n_all, n_bands
       |  FROM sp CROSS JOIN tt)
       |SELECT nation, segment, m class_size,
       |  CAST(SUM(abs(cumdiff)) AS BIGINT) * 1000000
       |    // (m * MAX(n_all) * (MAX(n_bands) - 1)) emd_ppm,
       |  CAST(SUM(abs(cumdiff)) AS BIGINT) * 1000000
       |    // (m * MAX(n_all) * (MAX(n_bands) - 1)) > 200000 at_risk
       |FROM cm GROUP BY nation, segment, m
       |ORDER BY nation, segment""".stripMargin

  /** `totals_reconcile`: financial header-vs-lines reconciliation —
    * for every order, the header total against the sum of its lines'
    * discounted revenue, mismatches bucketed by relative-error band
    * (exact match / <1% / <10% / ≥10%). The close-the-books audit
    * every billing pipeline runs; on this synthetic data the header
    * is NOT derived from the lines, so the banding exercises real
    * spread rather than asserting zero. One orders⋈lineitem
    * co-partitioned join-aggregate on the natural key (the join
    * AQE-plans; the per-order compare is integer cents, band by
    * cross-multiplication — |diff|·100 vs header — so no float
    * ratios), then a 4-row band rollup.
    */
  def totalsReconcile(spark: SparkSession, dir: String): DataFrame = {
    val lines = Tables.read(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(
        Quantize.cents(
          col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("line_c"))
    Tables.read(spark, dir, "orders")
      .select(
        col("o_orderkey"), Quantize.cents(col("o_totalprice")).as("hdr_c"))
      .join(lines, col("o_orderkey") === col("l_orderkey"), "left")
      .withColumn("line_c", coalesce(col("line_c"), lit(0L)))
      .withColumn(
        "adiff",
        when(col("hdr_c") >= col("line_c"), col("hdr_c") - col("line_c"))
          .otherwise(col("line_c") - col("hdr_c")))
      .withColumn(
        "band",
        when(col("adiff") === 0, "exact")
          .when(col("adiff") * 100 < col("hdr_c"), "lt_1pct")
          .when(col("adiff") * 10 < col("hdr_c"), "lt_10pct")
          .otherwise("ge_10pct"))
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("adiff")).as("total_gap_c"))
      .orderBy("band")
  }

  def totalsReconcileOracle: String =
    s"""WITH l AS (
       |  SELECT l_orderkey,
       |    CAST(SUM(${Quantize.centsSql("l_extendedprice * (1.0 - l_discount)")})
       |      AS BIGINT) line_c
       |  FROM lineitem GROUP BY 1),
       |j AS (
       |  SELECT o_orderkey, ${Quantize.centsSql("o_totalprice")} hdr_c,
       |    COALESCE(l.line_c, 0) line_c
       |  FROM orders LEFT JOIN l ON o_orderkey = l_orderkey),
       |b AS (
       |  SELECT hdr_c,
       |    CASE WHEN hdr_c >= line_c THEN hdr_c - line_c
       |      ELSE line_c - hdr_c END adiff
       |  FROM j),
       |c AS (
       |  SELECT CASE WHEN adiff = 0 THEN 'exact'
       |    WHEN adiff * 100 < hdr_c THEN 'lt_1pct'
       |    WHEN adiff * 10 < hdr_c THEN 'lt_10pct'
       |    ELSE 'ge_10pct' END band, adiff
       |  FROM b)
       |SELECT band, CAST(count(*) AS BIGINT) n_orders,
       |  CAST(sum(adiff) AS BIGINT) total_gap_c
       |FROM c GROUP BY band ORDER BY band""".stripMargin

  /** `task_completion`: unordered multi-event completion — users who
    * performed ALL THREE of view/click/purchase on the same day (any
    * order — window_funnel is the ORDERED form), per day, with the
    * active-user base for a completion share in ppm. distinct
    * (user, day, type) first, then one countDistinct-per-(user, day)
    * aggregate — never a per-user sort or window.
    */
  def taskCompletion(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(spark, dir)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(
        col("user_id"), to_date(col("ts")).as("d"), col("event_type"))
      .distinct()
    ud.groupBy(col("user_id"), col("d"))
      .agg(count(lit(1)).as("n_types"))
      .groupBy(col("d"))
      .agg(
        count(lit(1)).as("active_users"),
        sum(when(col("n_types") === 3, 1L).otherwise(0L)).as("completed"))
      .withColumn(
        "completion_ppm", expr("completed * 1000000 div active_users"))
      .orderBy("d")
  }

  def taskCompletionOracle: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) d,
      |    event_type
      |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
      |g AS (
      |  SELECT user_id, d, CAST(count(*) AS BIGINT) n_types
      |  FROM ud GROUP BY 1, 2)
      |SELECT d, CAST(count(*) AS BIGINT) active_users,
      |  CAST(sum(CASE WHEN n_types = 3 THEN 1 ELSE 0 END) AS BIGINT) completed,
      |  CAST(sum(CASE WHEN n_types = 3 THEN 1 ELSE 0 END) AS BIGINT)
      |    * 1000000 // count(*) completion_ppm
      |FROM g GROUP BY d ORDER BY d""".stripMargin

  /** `table_digest`: order-independent anti-entropy checksums — the
    * cross-system reconciliation primitive (is the replica's `orders`
    * THE SAME table?) every migration/validation tool needs. Each row
    * canonicalizes to a string over engine-stable fields only
    * (integer keys, cents-quantized money, ISO date text — raw
    * doubles never enter a digest), hashes through md5, and the
    * table digest is the SUM of two differently-salted residues —
    * commutative, so any partitioning, any engine, any row order
    * yields the identical pair, and two sums make silent collisions
    * across a row swap astronomically unlikely where one might
    * cancel. Plan: one narrow scan + one map-side-combinable
    * aggregate per table; at 100 TB each side computes its digest
    * locally and ships 3 numbers, never rows.
    */
  def tableDigest(spark: SparkSession, dir: String): DataFrame = {
    def digest(name: String, df: DataFrame, canon: org.apache.spark.sql.Column) = {
      val h = conv(substring(md5(canon), 1, 15), 16, 10).cast("long")
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(pmod(h, lit(1000003L))).as("digest_a"),
        sum(pmod(h, lit(999983L))).as("digest_b"))
        .select(
          lit(name).as("table_name"), col("n_rows"),
          col("digest_a"), col("digest_b"))
    }
    val orders = digest(
      "orders", Tables.read(spark, dir, "orders"),
      concat_ws(
        "|",
        col("o_orderkey"), col("o_custkey"),
        Quantize.cents(col("o_totalprice")),
        col("o_orderstatus"), col("o_orderpriority"),
        to_date(col("o_orderdate")).cast("string")))
    val customer = digest(
      "customer", Tables.read(spark, dir, "customer"),
      concat_ws(
        "|",
        col("c_custkey"), col("c_nationkey"),
        Quantize.cents(col("c_acctbal")), col("c_mktsegment"),
        col("c_name")))
    val supplier = digest(
      "supplier", Tables.read(spark, dir, "supplier"),
      concat_ws(
        "|", col("s_suppkey"), col("s_nationkey"), col("s_name")))
    val part = digest(
      "part", Tables.read(spark, dir, "part"),
      concat_ws(
        "|", col("p_partkey"), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size"),
        Quantize.cents(col("p_retailprice"))))
    orders.unionByName(customer).unionByName(supplier).unionByName(part)
      .orderBy("table_name")
  }

  def tableDigestOracle: String = {
    def d(name: String, table: String, canon: String) =
      s"""SELECT '$name' AS table_name, CAST(count(*) AS BIGINT) n_rows,
         |  CAST(SUM(('0x' || substr(md5($canon), 1, 15))::BIGINT % 1000003)
         |    AS BIGINT) digest_a,
         |  CAST(SUM(('0x' || substr(md5($canon), 1, 15))::BIGINT % 999983)
         |    AS BIGINT) digest_b
         |FROM $table""".stripMargin
    val orders = d(
      "orders", "orders",
      "concat_ws('|', o_orderkey, o_custkey, " +
        Quantize.centsSql("o_totalprice") +
        ", o_orderstatus, o_orderpriority, " +
        "CAST(CAST(o_orderdate AS DATE) AS VARCHAR))")
    val customer = d(
      "customer", "customer",
      "concat_ws('|', c_custkey, c_nationkey, " +
        Quantize.centsSql("c_acctbal") + ", c_mktsegment, c_name)")
    val supplier = d(
      "supplier", "supplier",
      "concat_ws('|', s_suppkey, s_nationkey, s_name)")
    val part = d(
      "part", "part",
      "concat_ws('|', p_partkey, p_name, p_brand, p_type, p_size, " +
        Quantize.centsSql("p_retailprice") + ")")
    s"""$orders
       |UNION ALL
       |$customer
       |UNION ALL
       |$supplier
       |UNION ALL
       |$part
       |ORDER BY table_name""".stripMargin
  }

  /** `id_gap_audit`: sequence-loss detection over a monotonically
    * assigned id — count of missing ids, number of maximal gap RUNS,
    * and the largest run, between the observed min and max. The
    * ingest audit that distinguishes "we lost 500 scattered rows"
    * from "we lost one 500-row batch" — the gap-run shape IS the
    * diagnosis. Audited stream: event_ids excluding the 'error'
    * rows, which play the lost records on this synthetic data (the
    * raw sequence is dense, so auditing it would pin only zeros).
    *
    * Neighbor diffs over a fact-sized sorted id set never run under
    * one global window: ids shard by value range (the lorenz/gini
    * width rule, (hi−lo) div 64 + 1), within-shard gaps come from a
    * shard-partitioned lead, and cross-shard gaps from the bounded
    * shard-grain relation (next non-empty shard's min vs this
    * shard's max, triangular broadcast join — an entirely-missing
    * shard lands in the boundary term automatically). At 100 TB:
    * one distinct shuffle, one partitioned window, grid-sized
    * stitching.
    */
  def idGapAudit(spark: SparkSession, dir: String): DataFrame = {
    val ids = Tables.events(spark, dir)
      .where(col("event_type") =!= "error")
      .select(col("event_id").as("id")).distinct()
      .localCheckpoint(eager = false) // bounds + sharded window share it
    val b = ids.agg(
      min(col("id")).as("lo"), max(col("id")).as("hi"),
      count(lit(1)).as("n"))
    val sharded = ids
      .crossJoin(broadcast(
        b.select(expr("(hi - lo) div 64 + 1").as("wd"), col("lo"))))
      .withColumn("shard", expr("(id - lo) div wd"))
      .localCheckpoint(eager = false) // window + shard-grain rollup
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
    val within = sharded
      .withColumn("nxt", lead(col("id"), 1).over(w))
      .where(col("nxt") > col("id") + 1)
      .agg(
        count(lit(1)).as("gw"),
        max(col("nxt") - col("id") - 1).as("mw"))
      .select(col("gw"), coalesce(col("mw"), lit(0L)).as("mw"))
    val shardGrain = sharded.groupBy(col("shard"))
      .agg(min(col("id")).as("smin"), max(col("id")).as("smax"))
      .localCheckpoint(eager = false) // both sides of the stitch join
    val boundary = shardGrain.as("a")
      .join(
        broadcast(shardGrain.select(
          col("shard").as("s2"), col("smin").as("smin2"))),
        col("s2") > col("a.shard"), "left")
      .groupBy(col("a.shard").as("shard"), col("a.smax").as("smax"))
      .agg(min(col("smin2")).as("next_min"))
      .where(col("next_min") > col("smax") + 1)
      .agg(
        count(lit(1)).as("gb"),
        max(col("next_min") - col("smax") - 1).as("mb"))
      .select(col("gb"), coalesce(col("mb"), lit(0L)).as("mb"))
    b.crossJoin(broadcast(within)) // 1-row folds: documented exception
      .crossJoin(broadcast(boundary))
      .select(
        col("n").as("n_ids"), col("lo").as("id_min"), col("hi").as("id_max"),
        (col("hi") - col("lo") + 1 - col("n")).as("n_missing"),
        (col("gw") + col("gb")).as("n_gaps"),
        greatest(col("mw"), col("mb")).as("max_gap"))
  }

  def idGapAuditOracle: String =
    """WITH ids AS (
      |  SELECT DISTINCT event_id id FROM events
      |  WHERE event_type <> 'error'),
      |b AS (SELECT CAST(min(id) AS BIGINT) lo, CAST(max(id) AS BIGINT) hi,
      |  CAST(count(*) AS BIGINT) n FROM ids),
      |d AS (SELECT id, lead(id) OVER (ORDER BY id) nxt FROM ids),
      |g AS (
      |  SELECT CAST(count(*) AS BIGINT) n_gaps,
      |    CAST(COALESCE(max(nxt - id - 1), 0) AS BIGINT) max_gap
      |  FROM d WHERE nxt > id + 1)
      |SELECT n n_ids, lo id_min, hi id_max,
      |  hi - lo + 1 - n AS n_missing, n_gaps, max_gap
      |FROM b CROSS JOIN g""".stripMargin

  /** `referential_integrity`: the FULL foreign-key audit — every FK
    * edge of the star schema in one panel (dq_audit spot-checks the
    * single orders→customer edge among its counters; a corpus ingest
    * gate needs all seven, because a partial parent load orphans
    * every child table downstream of it). Per edge: child row count,
    * distinct child keys, orphan rows (no matching parent), orphan
    * distinct keys, and the boolean verdict — all inside the hash.
    * NULL child keys are not orphans (SQL FK semantics: a null FK is
    * "no reference", caught by dq_audit's null counters instead);
    * the testdata has none, and the anti-join convention here counts
    * a null key as unmatched only if present.
    *
    * Scale shape: one LEFT ANTI join + one aggregate per edge.
    * Dimension parents (region/nation/supplier) broadcast; the
    * fact-sized parents (orders, part, customer) plan as shuffled
    * anti joins under AQE — the join key is the child's FK so the
    * shuffle is the minimal key-repartition, and the per-edge
    * aggregates are map-side-combinable counts.
    */
  def referentialIntegrity(spark: SparkSession, dir: String): DataFrame = {
    // Round 12 (guide §2.3 aggregate before you shuffle): fold each
    // edge to KEY GRAIN first — one child scan + one map-side-
    // combinable groupBy(k) replaces the old two scans (base agg +
    // anti-join input) and both countDistinct two-phase rewrites, and
    // the anti join then probes distinct keys instead of fact rows
    // (lineitem's three edges each pushed 600k raw rows through their
    // anti join; now ≤ the key domain). Semantics are identical:
    // child_rows = Σ cnt (the NULL-key group included, as count(*)
    // was), child_keys = count(k) (the NULL group contributes nothing,
    // as countDistinct did), and a NULL key never equals a parent key
    // so its group survives the anti join into orphan_rows exactly
    // like the old row-grain anti join counted it.
    def edge(
        name: String, child: DataFrame, childKey: String,
        parent: DataFrame, parentKey: String,
        broadcastParent: Boolean): DataFrame = {
      val keyGrain = child.select(col(childKey).as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
      val par = parent.select(col(parentKey).as("pk")).distinct()
      val orphans = keyGrain.join(
        if (broadcastParent) broadcast(par) else par,
        col("k") === col("pk"), "left_anti")
      val base = keyGrain.agg(
        coalesce(sum(col("cnt")), lit(0L)).as("child_rows"),
        count(col("k")).as("child_keys"))
      val orph = orphans.agg(
        coalesce(sum(col("cnt")), lit(0L)).as("orphan_rows"),
        count(col("k")).as("orphan_keys"))
      base.crossJoin(orph).select(
        lit(name).as("edge"),
        col("child_rows"), col("child_keys"),
        col("orphan_rows"), col("orphan_keys"),
        (col("orphan_rows") === 0L).as("ok"))
    }
    val li = Tables.read(spark, dir, "lineitem")
    val orders = Tables.read(spark, dir, "orders")
    val cust = Tables.read(spark, dir, "customer")
    val supp = Tables.read(spark, dir, "supplier")
    val part = Tables.read(spark, dir, "part")
    val nation = Tables.read(spark, dir, "nation")
    val region = Tables.read(spark, dir, "region")
    edge("customer->nation", cust, "c_nationkey", nation, "n_nationkey",
      broadcastParent = true)
      .unionAll(edge("lineitem->orders", li, "l_orderkey", orders,
        "o_orderkey", broadcastParent = false))
      .unionAll(edge("lineitem->part", li, "l_partkey", part, "p_partkey",
        broadcastParent = false))
      .unionAll(edge("lineitem->supplier", li, "l_suppkey", supp,
        "s_suppkey", broadcastParent = true))
      .unionAll(edge("nation->region", nation, "n_regionkey", region,
        "r_regionkey", broadcastParent = true))
      .unionAll(edge("orders->customer", orders, "o_custkey", cust,
        "c_custkey", broadcastParent = false))
      .unionAll(edge("supplier->nation", supp, "s_nationkey", nation,
        "n_nationkey", broadcastParent = true))
      .orderBy("edge")
  }

  def referentialIntegrityOracle: String = {
    def edgeSql(
        name: String, child: String, childKey: String,
        parent: String, parentKey: String): String =
      s"""SELECT '$name' edge,
         |  CAST(count(*) AS BIGINT) child_rows,
         |  CAST(count(DISTINCT $childKey) AS BIGINT) child_keys,
         |  CAST(count(*) FILTER (pk_ IS NULL) AS BIGINT) orphan_rows,
         |  CAST(count(DISTINCT $childKey) FILTER (pk_ IS NULL)
         |    AS BIGINT) orphan_keys,
         |  count(*) FILTER (pk_ IS NULL) = 0 AS ok
         |FROM $child LEFT JOIN (
         |  SELECT DISTINCT $parentKey pk_ FROM $parent) par_
         |  ON par_.pk_ = $childKey""".stripMargin
    Seq(
      edgeSql("customer->nation", "customer", "c_nationkey",
        "nation", "n_nationkey"),
      edgeSql("lineitem->orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      edgeSql("lineitem->part", "lineitem", "l_partkey",
        "part", "p_partkey"),
      edgeSql("lineitem->supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      edgeSql("nation->region", "nation", "n_regionkey",
        "region", "r_regionkey"),
      edgeSql("orders->customer", "orders", "o_custkey",
        "customer", "c_custkey"),
      edgeSql("supplier->nation", "supplier", "s_nationkey",
        "nation", "n_nationkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY edge")
  }

  /** `primary_key_audit`: key uniqueness over ALL TEN tables — the
    * PK half of the constraint audit (`referential_integrity` walks
    * every FK edge; this pins that each table's declared key is
    * actually a key, lineitem's COMPOSITE (orderkey, linenumber)
    * included). Per table: rows, distinct keys, duplicate rows, and
    * the boolean verdict inside the hash. A key audit is the first
    * thing a 100 TB ingest runs — a silently duplicated key corrupts
    * every downstream join fan-out, and catching it costs one
    * map-side-combinable distinct per table.
    *
    * Plan shape: ten independent (count, count-distinct) aggregates
    * unioned — each a two-phase hash aggregate on the key; no joins.
    */
  def primaryKeyAudit(spark: SparkSession, dir: String): DataFrame = {
    // Composite keys count as a null-safe STRUCT: Spark's plain
    // countDistinct(k1, k2) drops any row with a NULL key column,
    // while DuckDB's COUNT(DISTINCT (k1, k2)) counts the tuple — a
    // NULL in one component would silently vanish from the dup count
    // AND diverge the engines. A struct is never NULL itself, so both
    // engines see the same tuple universe (single-column keys keep
    // plain COUNT(DISTINCT k), which skips NULLs identically in both).
    // Key-grain first (the referential_integrity discipline, guide
    // §2.3 aggregate-before-shuffle): count(*) + countDistinct in one
    // aggregate plans as an Expand that pushes every fact row through
    // the distinct rewrite TWICE; one map-side-combinable groupBy(key)
    // followed by a tiny rollup shuffles each distinct key once
    // instead. NULL semantics preserved exactly: a single-column NULL
    // key groups but drops from count(k) (as COUNT(DISTINCT k) skipped
    // it) while its rows still sum into n_rows; composite keys count
    // every group because both engines count the tuple (a struct/row
    // is never NULL itself) — same universe as COUNT(DISTINCT (k1,k2)).
    def one(table: String, df: DataFrame, keys: Seq[String]): DataFrame =
      df.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("c"))
        .agg(
          // coalesce: empty-relation safety (sum over zero groups is
          // NULL where count(*) was 0) and keeps the column
          // non-nullable like the count(*) it replaces
          coalesce(sum(col("c")), lit(0L)).as("n_rows"),
          (if (keys.size == 1) count(col(keys.head))
           else count(lit(1))).as("n_keys"))
        .select(
          lit(table).as("table_name"),
          lit(keys.mkString(",")).as("key_cols"),
          col("n_rows"), col("n_keys"),
          (col("n_rows") - col("n_keys")).as("dup_rows"),
          (col("n_rows") === col("n_keys")).as("pk_ok"))
    val parts = Seq(
      ("region", Seq("r_regionkey")), ("nation", Seq("n_nationkey")),
      ("customer", Seq("c_custkey")), ("supplier", Seq("s_suppkey")),
      ("part", Seq("p_partkey")), ("orders", Seq("o_orderkey")),
      ("lineitem", Seq("l_orderkey", "l_linenumber")),
      ("documents", Seq("doc_id")), ("embeddings", Seq("vec_id")))
      .map { case (t, k) => one(t, Tables.read(spark, dir, t), k) }
    val ev = one("events", Tables.events(spark, dir), Seq("event_id"))
    (parts :+ ev).reduce(_ unionByName _).orderBy("table_name")
  }

  def primaryKeyAuditOracle: String = {
    val specs = Seq(
      ("region", Seq("r_regionkey")), ("nation", Seq("n_nationkey")),
      ("customer", Seq("c_custkey")), ("supplier", Seq("s_suppkey")),
      ("part", Seq("p_partkey")), ("orders", Seq("o_orderkey")),
      ("lineitem", Seq("l_orderkey", "l_linenumber")),
      ("documents", Seq("doc_id")), ("embeddings", Seq("vec_id")),
      ("events", Seq("event_id")))
    specs.map { case (t, k) =>
      val kd =
        if (k.size == 1) k.head else s"(${k.mkString(", ")})"
      s"""SELECT '$t' table_name, '${k.mkString(",")}' key_cols,
         |  CAST(COUNT(*) AS BIGINT) n_rows,
         |  CAST(COUNT(DISTINCT $kd) AS BIGINT) n_keys,
         |  CAST(COUNT(*) - COUNT(DISTINCT $kd) AS BIGINT) dup_rows,
         |  COUNT(*) = COUNT(DISTINCT $kd) pk_ok
         |FROM $t""".stripMargin
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
      "\n) ORDER BY table_name")
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "primary_key_audit", primaryKeyAudit, Some(primaryKeyAuditOracle)),
    QueryDef(
      "referential_integrity", referentialIntegrity,
      Some(referentialIntegrityOracle)),
    QueryDef("id_gap_audit", idGapAudit, Some(idGapAuditOracle)),
    QueryDef("table_digest", tableDigest, Some(tableDigestOracle)),
    QueryDef(
      "totals_reconcile", totalsReconcile, Some(totalsReconcileOracle)),
    QueryDef("task_completion", taskCompletion, Some(taskCompletionOracle)),
    QueryDef("k_anonymity", kAnonymity, Some(kAnonymityOracle)),
    QueryDef("t_closeness", tCloseness, Some(tClosenessOracle)),
    QueryDef("column_modes", columnModes, Some(columnModesOracle)),
    QueryDef("dq_audit", dqAudit, Some(dqAuditOracle)),
    QueryDef("column_profile", columnProfile, Some(columnProfileOracle)),
    QueryDef("table_diff", tableDiff, Some(tableDiffOracle)),
    QueryDef("histogram_bins", histogramBins, Some(histogramBinsOracle)))
}
