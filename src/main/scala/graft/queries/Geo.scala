package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spatial radius join — the grid-bucketed neighbor-join pattern every
  * geo engine uses (GeoSpark/Sedona partitioning, H3/S2 cell joins),
  * expressed as pure Spark algebra: bucket both sides into R-sized
  * grid cells, explode the SMALL side into its 3×3 neighbor cells
  * (bounded ×9), equi-join on the cell key, then an exact residual
  * distance predicate. Never a cross join: candidates are bounded by
  * cell occupancy, the same bounded-bucket discipline as the LSH
  * dedup family.
  *
  * Coordinates are synthetic but deterministic: micro-degree points
  * content-hashed from the entity keys (md5 arithmetic — the
  * [[ContentHash]] pattern), so both engines derive identical
  * geometry. All distance math is INTEGER (squared micro-degrees in
  * int64: diffs < 2^20, squares < 2^40, sums < 2^41), so the oracle
  * hash-pins exact results — no floating trig divergence (haversine's
  * sin/cos disagree in last ulps across libm implementations).
  */
object Geo {

  private val R = 20000L // radius in micro-degrees; also the cell size
  private val Box = 1000000L // 1°×1° box, micro-degrees
  /** Packs (dist2, suppkey) into one int64 for the argmin: headroom is
    * dist2 ≤ R² = 4×10⁸ (post-residual) × base 10⁹ + key < 10⁹ ⇒
    * ≤ 4×10¹⁷, inside int64. 10⁹ admits the sf1 replica's offset keys
    * (10⁷) with margin; the loud guard below still fails past it
    * rather than silently corrupting the argmin (it caught the 10⁶
    * base at the sf1 sweep exactly as designed).
    */
  private val PackBase = 1000000000L

  /** Two independent 24-bit hex chunks of the key's md5 → (lat, lon)
    * inside the box.
    */
  private def udeg(key: Column, off: Int): Column =
    conv(substring(md5(key.cast("string")), 1 + off, 6), 16, 10)
      .cast("long") % Box

  private def udegSql(keyExpr: String, off: Int): String =
    s"('0x' || substr(md5(CAST($keyExpr AS VARCHAR)), ${1 + off}, 6))::BIGINT % $Box"

  /** Per customer: how many suppliers sit within R micro-degrees, the
    * exact squared distance to the closest one, and that supplier's
    * key (ties broken to the smallest key via integer packing —
    * `dist2 * 1e6 + suppkey` minimized, portable to any engine).
    *
    * Scale shape: the supplier (small) side explodes ×9 into neighbor
    * cells and the join is a plain equi-join on the cell key — at
    * 100 TB the big side shuffles once by cell (or not at all if the
    * small side broadcasts, as here), and cell size R bounds candidate
    * fan-in regardless of corpus size. The residual filter is
    * codegen'd integer math at the join.
    */
  def geoRadiusJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.read(spark, dir, "customer")
      .select(
        col("c_custkey"),
        udeg(col("c_custkey"), 0).as("lat"),
        udeg(col("c_custkey"), 8).as("lon"))
      .withColumn("clat", expr(s"lat div $R"))
      .withColumn("clon", expr(s"lon div $R"))
    val supp = Tables.read(spark, dir, "supplier")
      .select(
        // the (dist2, suppkey) packing needs suppkey < PackBase; fail
        // loudly past sf~100 instead of silently corrupting the argmin
        when(col("s_suppkey") >= PackBase, raise_error(concat(
          lit("geo_radius_join: s_suppkey "), col("s_suppkey").cast("string"),
          lit(s" exceeds the $PackBase packing base (PackBase)"))))
          .otherwise(col("s_suppkey")).as("s_suppkey"),
        udeg(col("s_suppkey"), 0).as("slat"),
        udeg(col("s_suppkey"), 8).as("slon"))
      .select(
        col("s_suppkey"), col("slat"), col("slon"),
        explode(array((-1 to 1).map(lit): _*)).as("dlat"))
      .select(
        col("s_suppkey"), col("slat"), col("slon"), col("dlat"),
        explode(array((-1 to 1).map(lit): _*)).as("dlon"))
      .select(
        col("s_suppkey"), col("slat"), col("slon"),
        (expr(s"slat div $R") + col("dlat")).as("clat"),
        (expr(s"slon div $R") + col("dlon")).as("clon"))
    val dist2 =
      (col("lat") - col("slat")) * (col("lat") - col("slat")) +
        (col("lon") - col("slon")) * (col("lon") - col("slon"))
    cust.join(broadcast(supp), Seq("clat", "clon"))
      .withColumn("dist2", dist2)
      .where(col("dist2") <= R * R)
      .groupBy(col("c_custkey"))
      .agg(
        count(lit(1)).as("n_nearby"),
        min(col("dist2") * PackBase + col("s_suppkey")).as("packed"))
      .select(
        col("c_custkey"),
        col("n_nearby"),
        expr(s"packed div $PackBase").as("min_dist2"),
        (col("packed") % PackBase).as("nearest_supp"))
      .orderBy("c_custkey")
  }

  def geoRadiusJoinOracle: String =
    s"""WITH cust AS (
      |  SELECT c_custkey,
      |    ${udegSql("c_custkey", 0)} lat,
      |    ${udegSql("c_custkey", 8)} lon
      |  FROM customer),
      |supp AS (
      |  SELECT s_suppkey,
      |    ${udegSql("s_suppkey", 0)} slat,
      |    ${udegSql("s_suppkey", 8)} slon
      |  FROM supplier),
      |sgrid AS (
      |  SELECT s_suppkey, slat, slon,
      |    slat // $R + d1.d AS clat, slon // $R + d2.d AS clon
      |  FROM supp, (SELECT UNNEST([-1, 0, 1]) d) d1,
      |       (SELECT UNNEST([-1, 0, 1]) d) d2),
      |cand AS (
      |  SELECT c_custkey, s_suppkey,
      |    (lat - slat) * (lat - slat) + (lon - slon) * (lon - slon) dist2
      |  FROM cust JOIN sgrid
      |    ON lat // $R = clat AND lon // $R = clon
      |  WHERE (lat - slat) * (lat - slat) + (lon - slon) * (lon - slon)
      |    <= ${R * R})
      |SELECT c_custkey, CAST(COUNT(*) AS BIGINT) n_nearby,
      |  CAST(MIN(dist2 * $PackBase + s_suppkey) // $PackBase AS BIGINT) min_dist2,
      |  CAST(MIN(dist2 * $PackBase + s_suppkey) % $PackBase AS BIGINT) nearest_supp
      |FROM cand GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  private val DCell = 50000L // dbscan grid cell, micro-degrees
  private val MinPts = 5L // density threshold per cell
  private val CellPack = 100L // cid = cx * 100 + cy; 20 cells per axis

  /** `dbscan_grid`: grid-density clustering (the DBSCAN shape at
    * cell granularity — GriDBSCAN / in-warehouse approximations):
    * cells of the customer point cloud holding >= MinPts points are
    * DENSE; dense cells adjacent in the 8-neighborhood merge into
    * clusters via the SAME min-label connected-components fixpoint
    * the dedup family runs ([[Dedup.ccOn]]). Output: top-25 clusters
    * by contained points. The parameter regime is exercised at every
    * SF: sparse isolated cells at sf0.001, a real mixed
    * dense/sparse mosaic at sf0.01, a saturated grid (one spanning
    * cluster) at sf0.1.
    *
    * Plan shape: one fact-level cell aggregate (map-combinable);
    * everything after — neighbor explode (bounded ×9), the dense
    * cell graph, the CC loop — operates on the <=400-row dense-cell
    * relation. At 100 TB the cell aggregate is the only full-data
    * pass; cluster structure lives at grid resolution, the same
    * cells-not-points discipline as `geo_radius_join`.
    */
  def dbscanGrid(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.read(spark, dir, "customer")
      .select(
        udeg(col("c_custkey"), 0).as("lat"),
        udeg(col("c_custkey"), 8).as("lon"))
      .groupBy(
        expr(s"lat div $DCell").as("cx"), expr(s"lon div $DCell").as("cy"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= MinPts)
      .withColumn("cid", col("cx") * CellPack + col("cy"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nb = cells.select(
        col("cid"),
        explode(array((for (dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0)
          yield (col("cx") + dx) * CellPack + (col("cy") + dy)): _*)).as("nid"))
      val edges = nb
        .join(cells.select(col("cid").as("nid")), "nid")
        .where(col("cid") < col("nid"))
        .select(col("cid").as("a"), col("nid").as("b"))
      // the dense-cell graph is bounded by the GRID (≤400 cells at
      // this packing), not the data — single-task union-find beats
      // ~log₂(diameter) driver rounds of the distributed fixpoint
      // (which remains the path for data-sized graphs)
      val labels = Dedup.ccSummaryGraph(edges)
        .withColumnRenamed("doc", "cid")
      cells.join(labels, Seq("cid"), "left")
        .select(
          coalesce(col("root"), col("cid")).as("cluster_id"), col("n"))
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_cells"), sum(col("n")).as("n_points"))
        .orderBy(col("n_points").desc, col("cluster_id"))
        .limit(25)
        .localCheckpoint() // materialize before the cell unpersist
    } finally cells.unpersist()
  }

  def dbscanGridOracle: String =
    s"""WITH RECURSIVE pts AS (
       |  SELECT ${udegSql("c_custkey", 0)} lat, ${udegSql("c_custkey", 8)} lon
       |  FROM customer),
       |c AS (
       |  SELECT lat // $DCell cx, lon // $DCell cy,
       |         CAST(count(*) AS BIGINT) n
       |  FROM pts GROUP BY 1, 2 HAVING count(*) >= $MinPts),
       |c2 AS (SELECT cx * $CellPack + cy cid, cx, cy, n FROM c),
       |e AS (
       |  SELECT a.cid src, b.cid dst FROM c2 a JOIN c2 b
       |  ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
       |    AND a.cid <> b.cid),
       |reach AS (
       |  SELECT src AS cid, dst AS r FROM e
       |  UNION
       |  SELECT reach.cid, e.dst FROM reach JOIN e ON reach.r = e.src),
       |comp AS (SELECT cid, least(cid, MIN(r)) AS root FROM reach GROUP BY cid)
       |SELECT coalesce(comp.root, c2.cid) AS cluster_id,
       |  CAST(count(*) AS BIGINT) n_cells, CAST(sum(c2.n) AS BIGINT) n_points
       |FROM c2 LEFT JOIN comp ON c2.cid = comp.cid
       |GROUP BY 1 ORDER BY n_points DESC, cluster_id LIMIT 25""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("geo_radius_join", geoRadiusJoin, Some(geoRadiusJoinOracle)),
    QueryDef("dbscan_grid", dbscanGrid, Some(dbscanGridOracle)))
}
