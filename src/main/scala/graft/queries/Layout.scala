package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: how 100 TB gets ARRANGED so queries skip
  * most of it. Z-ordering interleaves the bits of several filter
  * dimensions into one sort key; files written in that order carry
  * tight min/max ranges on EVERY interleaved dimension at once, so a
  * scan with a predicate on any of them prunes most files — the
  * multi-dimensional generalization of partitioning-by-one-column
  * (which prunes perfectly on one dimension and not at all on the
  * others).
  */
object Layout {

  private val Bits = 10 // per dimension => 20-bit z-values
  private val BucketBits = 6 // 64 file buckets = top 6 z-bits

  /** Interleave the low `Bits` bits of x (even positions) and y (odd
    * positions) — plain integer arithmetic, identical in any engine.
    */
  private def zval(x: Column, y: Column): Column =
    (0 until Bits).map { i =>
      (shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  private def zvalSql(x: String, y: String): String =
    (0 until Bits).map { i =>
      s"((($x >> $i) & 1) * ${1L << (2 * i)}) + " +
        s"((($y >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString("(", " + ", ")")

  /** `zorder_layout`: lay orders out by the z-value of (customer
    * bucket, price bucket) and report each file bucket's min/max on
    * BOTH dimensions — the pruning ranges a scan would use. The whole
    * query is one narrow projection + one aggregate: the integer
    * z-key is exactly what `df.repartitionByRange(zval).sortWithin…`
    * would write at ingest, and the per-bucket spans measure layout
    * quality (sum of span products ≪ naive layouts ⇒ a predicate on
    * either dimension prunes most buckets).
    */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val mask = (1L << Bits) - 1
    val ord = Tables.read(spark, dir, "orders").select(
      (col("o_custkey").bitwiseAND(lit(mask))).as("x"),
      (Quantize.cents(col("o_totalprice"))
        .divide(lit(6000)).cast("long").bitwiseAND(lit(mask))).as("y"))
    ord
      .withColumn(
        "bucket", shiftright(zval(col("x"), col("y")), 2 * Bits - BucketBits))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
      .withColumn(
        "span_product",
        (col("x_max") - col("x_min") + 1) * (col("y_max") - col("y_min") + 1))
      .orderBy("bucket")
  }

  def zorderLayoutOracle: String = {
    val mask = (1L << Bits) - 1
    s"""WITH pts AS (
       |  SELECT o_custkey & $mask AS x,
       |    (${Quantize.centsSql("o_totalprice")} // 6000) & $mask AS y
       |  FROM orders),
       |z AS (
       |  SELECT x, y, ${zvalSql("x", "y")} >> ${2 * Bits - BucketBits} AS bucket
       |  FROM pts)
       |SELECT bucket, CAST(COUNT(*) AS BIGINT) n,
       |  MIN(x) x_min, MAX(x) x_max, MIN(y) y_min, MAX(y) y_max,
       |  (MAX(x) - MIN(x) + 1) * (MAX(y) - MIN(y) + 1) AS span_product
       |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  /** One Hilbert-curve refinement level (s = 2^k): the standard
    * xy→d step — quadrant = (3·rx) XOR ry spelled as the arithmetic
    * identity 3rx + ry − 2·rx·ry (no engine-specific XOR), then the
    * ry=0 reflect-and-swap rotation. Emitted as SQL text so Spark
    * (selectExpr) and DuckDB (chained CTEs) evaluate the IDENTICAL
    * integer expressions level by level.
    */
  private def hilbertLevel(s: Long): (String, String, String) = {
    val rx = s"(CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END)"
    val ry = s"(CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)"
    val dStep =
      s"hd + $s * $s * (3 * $rx + $ry - 2 * $rx * $ry)"
    val nx =
      s"CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN $s - 1 - hy" +
        s" ELSE hy END) ELSE hx END"
    val ny =
      s"CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN $s - 1 - hx" +
        s" ELSE hx END) ELSE hy END"
    (dStep, nx, ny)
  }

  /** `hilbert_layout`: the same two-dimension layout question as
    * [[zorderLayout]] answered with the Hilbert curve — the
    * space-filling order whose consecutive cells are always GRID
    * NEIGHBORS (Z's diagonal jumps are exactly what inflates its
    * bucket spans), so Hilbert-bucketed files carry tighter min/max
    * ranges on both dimensions. Same (customer-bucket, price-bucket)
    * points, same 64 file buckets (top 6 of 20 index bits), same
    * span metrics — the two queries together price the Z-vs-Hilbert
    * ingest decision on real data (HilbertSpec additionally pins the
    * curve itself: bijective on the full 1024² grid and every
    * consecutive pair adjacent, plus Σ span_product ≤ the Z layout's
    * on this dataset). The index is 10 unrolled refinement levels of
    * pure integer CASE arithmetic — no UDF, fully codegen-friendly,
    * identical text in both engines.
    *
    * Plan shape: one narrow orders scan → 10 stacked projections
    * (collapse into one WholeStageCodegen) → one 64-group aggregate.
    * Scan-bound at any scale.
    */
  def hilbertLayout(spark: SparkSession, dir: String): DataFrame = {
    val mask = (1L << Bits) - 1
    var df = Tables.read(spark, dir, "orders").select(
      (col("o_custkey").bitwiseAND(lit(mask))).as("x"),
      (Quantize.cents(col("o_totalprice"))
        .divide(lit(6000)).cast("long").bitwiseAND(lit(mask))).as("y"))
      .selectExpr("x", "y", "x AS hx", "y AS hy", "CAST(0 AS BIGINT) AS hd")
    for (k <- (0 until Bits).reverse) {
      val (dStep, nx, ny) = hilbertLevel(1L << k)
      df = df.selectExpr(
        "x", "y", s"($dStep) AS hd2", s"($nx) AS hx2", s"($ny) AS hy2")
        .selectExpr("x", "y", "hd2 AS hd", "hx2 AS hx", "hy2 AS hy")
    }
    df
      .selectExpr(
        "x", "y", s"shiftright(hd, ${2 * Bits - BucketBits}) AS bucket")
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
      .withColumn(
        "span_product",
        (col("x_max") - col("x_min") + 1) * (col("y_max") - col("y_min") + 1))
      .orderBy("bucket")
  }

  def hilbertLayoutOracle: String = {
    val mask = (1L << Bits) - 1
    val levels = (0 until Bits).reverse.zipWithIndex.map { case (k, i) =>
      val (dStep, nx, ny) = hilbertLevel(1L << k)
      s"""l${i + 1} AS (
         |  SELECT x, y, ($dStep) AS hd, ($nx) AS hx, ($ny) AS hy
         |  FROM l$i)"""
    }.mkString(",\n")
    s"""WITH l0 AS (
       |  SELECT o_custkey & $mask AS x,
       |    (${Quantize.centsSql("o_totalprice")} // 6000) & $mask AS y,
       |    o_custkey & $mask AS hx,
       |    (${Quantize.centsSql("o_totalprice")} // 6000) & $mask AS hy,
       |    CAST(0 AS BIGINT) AS hd
       |  FROM orders),
       |$levels,
       |z AS (SELECT x, y, hd >> ${2 * Bits - BucketBits} AS bucket
       |  FROM l$Bits)
       |SELECT bucket, CAST(COUNT(*) AS BIGINT) n,
       |  MIN(x) x_min, MAX(x) x_max, MIN(y) y_min, MAX(y) y_max,
       |  (MAX(x) - MIN(x) + 1) * (MAX(y) - MIN(y) + 1) AS span_product
       |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  private val CompactTarget = 2000L // rows per compacted output file

  /** `compaction_plan`: the small-file compaction planner — group a
    * table's per-day "files" (one file per order day, sized by row
    * count) into target-sized compaction bins, never crossing a month
    * boundary (compaction respects the table's partition layout, and
    * the month partition is ALSO what keeps the planning window
    * partitioned: the running-size prefix sum runs per month over
    * file METADATA rows, thousands at 100 TB, not data). Bin id =
    * cumulative-rows-before div target — the deterministic streaming
    * bin-packing every table maintenance service runs.
    */
  def compactionPlan(spark: SparkSession, dir: String): DataFrame = {
    val files = Tables.read(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("file_rows"))
      .withColumn("month", trunc(col("day"), "month"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("month")).orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    files
      .withColumn("cum_before", coalesce(sum(col("file_rows")).over(w), lit(0L)))
      .withColumn("bin", expr(s"cum_before div $CompactTarget"))
      .groupBy(col("month"), col("bin"))
      .agg(
        count(lit(1)).as("n_files"),
        sum(col("file_rows")).as("total_rows"),
        min(col("day")).as("day_min"),
        max(col("day")).as("day_max"))
      .orderBy("month", "bin")
  }

  def compactionPlanOracle: String =
    s"""WITH f AS (
       |  SELECT CAST(o_orderdate AS DATE) fday, CAST(COUNT(*) AS BIGINT) file_rows
       |  FROM orders GROUP BY 1),
       |m AS (
       |  SELECT *, date_trunc('month', fday) fmonth,
       |    CAST(COALESCE(SUM(file_rows) OVER (
       |      PARTITION BY date_trunc('month', fday) ORDER BY fday
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      cum_before
       |  FROM f)
       |SELECT fmonth AS month, cum_before // $CompactTarget AS bin,
       |  CAST(COUNT(*) AS BIGINT) n_files,
       |  CAST(SUM(file_rows) AS BIGINT) total_rows,
       |  MIN(fday) day_min, MAX(fday) day_max
       |FROM m GROUP BY 1, 2 ORDER BY month, bin""".stripMargin

  /** `posting_compression`: the storage economics of an inverted
    * index — per-term posting lists delta-encoded, the gap cost
    * priced under Elias-γ (2·⌊log₂ g⌋ + 1 bits) and LEB128 varint
    * (⌈bits/7⌉ bytes) against fixed 64-bit ids, rolled up by
    * document-frequency octave (rare terms have large sparse gaps,
    * common terms tiny dense ones — the df band IS the compression
    * story). ⌊log₂⌋ is computed EXACTLY as length(bin(g)) − 1 — an
    * integer in both engines, never a transcendental whose last ulp
    * could disagree. Plan: one distinct (term, doc) projection, the
    * gap from a lag window PARTITIONED BY TERM (high-cardinality —
    * each posting list is one partition, the same order a real index
    * writer needs anyway), then a map-side-combinable band rollup.
    * At 100 TB the posting relation shards by term hash and nothing
    * else shuffles.
    */
  def postingCompression(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val post = Tables.read(spark, dir, "documents")
      .select(
        explode(graft.queries.TextAnalysis.toks(lower(col("text"))))
          .as("t"),
        col("doc_id"))
      .where(col("t").rlike("^[a-z]{3,}$"))
      .distinct()
    val w = Window.partitionBy(col("t")).orderBy(col("doc_id"))
    val gaps = post
      .withColumn(
        "gap",
        coalesce(
          col("doc_id") - lag(col("doc_id"), 1).over(w),
          col("doc_id") + 1))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("t"))))
      .withColumn("lg", (length(bin(col("gap"))) - 1).cast("long"))
      .withColumn("band", (length(bin(col("df"))) - 1).cast("long"))
    gaps
      .groupBy(col("band"))
      .agg(
        countDistinct(col("t")).as("n_terms"),
        count(lit(1)).as("n_postings"),
        sum(lit(2L) * col("lg") + 1L).as("gamma_bits"),
        sum(expr("(lg + 7) div 7")).as("varint_bytes"),
        (count(lit(1)) * 64L).as("fixed_bits"))
      .withColumn(
        "gamma_savings_ppm",
        expr("(fixed_bits - gamma_bits) * 1000000 div fixed_bits"))
      .orderBy("band")
  }

  def postingCompressionOracle: String = {
    val toks =
      "list_filter(regexp_split_to_array(lower(text), '\\s+'), " +
        "x -> regexp_matches(x, '^[a-z]{3,}$'))"
    s"""WITH post AS (
       |  SELECT DISTINCT t.tok AS t, doc_id
       |  FROM documents, unnest($toks) AS t(tok)),
       |g AS (
       |  SELECT t, doc_id,
       |    COALESCE(doc_id - lag(doc_id) OVER (PARTITION BY t ORDER BY doc_id),
       |      doc_id + 1) AS gap,
       |    CAST(COUNT(*) OVER (PARTITION BY t) AS BIGINT) df
       |  FROM post),
       |b AS (
       |  SELECT t, length(bin(df)) - 1 AS band, length(bin(gap)) - 1 AS lg
       |  FROM g)
       |SELECT CAST(band AS BIGINT) band,
       |  CAST(COUNT(DISTINCT t) AS BIGINT) n_terms,
       |  CAST(COUNT(*) AS BIGINT) n_postings,
       |  CAST(SUM(2 * lg + 1) AS BIGINT) gamma_bits,
       |  CAST(SUM((lg + 7) // 7) AS BIGINT) varint_bytes,
       |  CAST(COUNT(*) * 64 AS BIGINT) fixed_bits,
       |  CAST((COUNT(*) * 64 - SUM(2 * lg + 1)) * 1000000 //
       |    (COUNT(*) * 64) AS BIGINT) AS gamma_savings_ppm
       |FROM b GROUP BY band ORDER BY band""".stripMargin
  }

  /** `zone_map_prune`: the data-skipping ECONOMICS of two physical
    * layouts under the same predicate — what zorder_layout's span
    * report stops short of pricing. Orders lay out as 2000-row
    * "files" two ways: arrival order (orderkey ranges — the layout
    * ingestion gives you for free) and date-partitioned (one file
    * per order day — the layout a maintenance pass buys); each
    * file's zone map is its min/max orderdate, the predicate is a
    * pinned one-week slice derived from the data's own bounds, and
    * the readout per layout is files hit, rows scanned vs rows
    * actually matching, and the scan overhead in ppm of the scan —
    * the number that justifies (or doesn't) the re-clustering job.
    * Everything integer/date-exact; the hit rule is the standard
    * zone-map overlap test (max ≥ lo AND min < hi).
    *
    * Plan: one narrow scan feeding two file-grain aggregates (file
    * METADATA rows — thousands at 100 TB, the compaction_plan
    * stance), predicate bounds as a 1-row broadcast, 2-row output.
    */
  def zoneMapPrune(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.read(spark, dir, "orders")
      .select(col("o_orderkey").as("k"), to_date(col("o_orderdate")).as("d"))
      .localCheckpoint(eager = false) // bounds + both layouts share it
    val pred = ord.agg(
      date_add(min(col("d")), 7).as("lo"),
      date_add(min(col("d")), 14).as("hi"))
    def layout(name: String, fileId: Column): DataFrame =
      ord
        .crossJoin(broadcast(pred)) // 1-row bounds: documented exception
        .select(
          fileId.as("f"), col("d"),
          (col("d") >= col("lo") && col("d") < col("hi")).cast("long")
            .as("m"),
          col("lo"), col("hi"))
        .groupBy(col("f"), col("lo"), col("hi"))
        .agg(
          count(lit(1)).as("n"), min(col("d")).as("fmin"),
          max(col("d")).as("fmax"), sum(col("m")).as("nm"))
        .select(
          col("n"), col("nm"),
          (col("fmax") >= col("lo") && col("fmin") < col("hi"))
            .cast("long").as("hit"))
        .agg(
          count(lit(1)).as("n_files"),
          sum(col("hit")).as("n_hit_files"),
          sum(col("hit") * col("n")).as("rows_scanned"),
          sum(col("nm")).as("rows_matching"))
        .select(
          lit(name).as("layout"), col("n_files"), col("n_hit_files"),
          col("rows_scanned"), col("rows_matching"),
          expr("""CASE WHEN rows_scanned = 0 THEN NULL
            ELSE (rows_scanned - rows_matching) * 1000000 div rows_scanned
            END""").as("overhead_ppm"))
    layout("arrival", expr("k div 2000"))
      .unionByName(layout("date_partitioned", col("d").cast("string")
        .substr(1, 10).as("fd"))) // one file per day
      .orderBy("layout")
  }

  def zoneMapPruneOracle: String = {
    def lay(name: String, fileExpr: String): String =
      s"""SELECT '$name' layout, CAST(COUNT(*) AS BIGINT) n_files,
         |  CAST(SUM(hit) AS BIGINT) n_hit_files,
         |  CAST(SUM(hit * n) AS BIGINT) rows_scanned,
         |  CAST(SUM(nm) AS BIGINT) rows_matching,
         |  CASE WHEN SUM(hit * n) = 0 THEN NULL
         |    ELSE CAST((SUM(hit * n) - SUM(nm)) AS BIGINT) * 1000000
         |      // CAST(SUM(hit * n) AS BIGINT)
         |  END overhead_ppm
         |FROM (
         |  SELECT $fileExpr f, CAST(COUNT(*) AS BIGINT) n,
         |    CAST(SUM(CASE WHEN d >= lo AND d < hi THEN 1 ELSE 0 END)
         |      AS BIGINT) nm,
         |    CASE WHEN MAX(d) >= MAX(lo) AND MIN(d) < MAX(hi)
         |      THEN 1 ELSE 0 END hit
         |  FROM o CROSS JOIN p GROUP BY 1)""".stripMargin
    s"""WITH o AS (
       |  SELECT o_orderkey k, CAST(o_orderdate AS DATE) d FROM orders),
       |p AS (
       |  SELECT MIN(d) + 7 lo, MIN(d) + 14 hi FROM o)
       |${lay("arrival", "k // 2000")}
       |UNION ALL
       |${lay("date_partitioned", "CAST(d AS VARCHAR)")}
       |ORDER BY layout""".stripMargin
  }

  /** `dict_economics`: dictionary-encoding economics per column —
    * the columnar-storage decision (parquet makes it per-chunk by a
    * size heuristic; this query states the arithmetic on real data).
    * For each candidate part column, rendered as its string form:
    * row count, distinct count, plain payload bytes (Σ value
    * lengths — ASCII corpus, so chars = octets in both engines),
    * and the dictionary-encoded cost = distinct payload + one index
    * per row at the narrowest fixed width that addresses the
    * dictionary (1/2/4 bytes for ≤2⁸/≤2¹⁶/larger). The ratio in
    * milli and the verdict split the spectrum: low-cardinality
    * enums (p_brand) compress hard, the near-unique p_name pays the
    * dictionary and loses — the measured reason engines
    * dictionary-encode flags and NOT free text. (Real parquet adds
    * RLE on top of the dictionary indexes; this is the dictionary
    * step alone, stated exactly.)
    *
    * Plan shape: per column ONE hash aggregate on the value (the
    * distinct payload and the plain payload fold in the same pass —
    * count·len is distributive), then a 4-row union. At 100 TB this
    * is the scan profile a layout optimizer runs before rewriting a
    * table, one aggregate per column.
    */
  def dictEconomics(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.read(spark, dir, "part")
    def one(c: String): DataFrame =
      li.select(col(c).cast("string").as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
        .agg(
          sum(col("cnt")).as("n"),
          count(lit(1)).as("d"),
          sum(length(col("v")).cast("long") * col("cnt")).as("plain_bytes"),
          sum(length(col("v")).cast("long")).as("dict_payload"))
        .select(
          lit(c).as("column_name"), col("n"), col("d"), col("plain_bytes"),
          (col("dict_payload") + col("n") *
            when(col("d") <= 256, 1L)
              .when(col("d") <= 65536, 2L)
              .otherwise(4L)).as("dict_bytes"))
    Seq("p_brand", "p_name", "p_size", "p_type")
      .map(one).reduce(_.unionByName(_))
      .withColumn("ratio_milli", expr("dict_bytes * 1000 div plain_bytes"))
      .withColumn("dict_wins", col("dict_bytes") < col("plain_bytes"))
      .orderBy("column_name")
  }

  def dictEconomicsOracle: String = {
    def one(c: String): String =
      s"""SELECT '$c' column_name, n, d, plain_bytes, dict_bytes FROM (
         |  SELECT CAST(SUM(cnt) AS BIGINT) n, CAST(count(*) AS BIGINT) d,
         |    CAST(SUM(len * cnt) AS BIGINT) plain_bytes,
         |    CAST(SUM(len) +
         |      SUM(cnt) * (CASE WHEN count(*) <= 256 THEN 1
         |        WHEN count(*) <= 65536 THEN 2 ELSE 4 END) AS BIGINT)
         |      dict_bytes
         |  FROM (
         |    SELECT CAST($c AS VARCHAR) v,
         |      CAST(length(CAST($c AS VARCHAR)) AS BIGINT) len,
         |      CAST(count(*) AS BIGINT) cnt
         |    FROM part GROUP BY 1, 2))""".stripMargin
    Seq("p_brand", "p_name", "p_size", "p_type").map(one).mkString(
      "WITH u AS (\n", "\nUNION ALL\n", """)
        |SELECT column_name, n, d, plain_bytes, dict_bytes,
        |  dict_bytes * 1000 // plain_bytes ratio_milli,
        |  dict_bytes < plain_bytes dict_wins
        |FROM u ORDER BY column_name""".stripMargin)
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("dict_economics", dictEconomics, Some(dictEconomicsOracle)),
    QueryDef("zone_map_prune", zoneMapPrune, Some(zoneMapPruneOracle)),
    QueryDef(
      "posting_compression", postingCompression,
      Some(postingCompressionOracle)),
    QueryDef("zorder_layout", zorderLayout, Some(zorderLayoutOracle)),
    QueryDef("hilbert_layout", hilbertLayout, Some(hilbertLayoutOracle)),
    QueryDef("compaction_plan", compactionPlan, Some(compactionPlanOracle)))
}
