package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Guards for the pure-SQL entry points — most importantly the
  * lateral-decorrelation hazard: Spark 4.1 silently returns a GLOBAL
  * top-2 (correlation dropped, no error) when the outer correlation
  * column is cast inside the driving subquery. The shipped form keeps
  * the key at native type; this spec fails loudly if any future edit
  * (or Spark upgrade) reintroduces the silent wrong-answer plan.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("lateral_topk returns exactly 2 rows per nation (correlation intact)") {
    val rows = SqlSurface.lateralTopk(spark, dir).collect()
    val nations = Tables.read(spark, dir, "customer")
      .select("c_nationkey").distinct().count()
    assert(rows.length == 2 * nations, s"got ${rows.length} rows")
    val perNation = rows.groupBy(_.getLong(0)).values.map(_.length).toSet
    assert(perNation == Set(2))
    // within each nation the two rows are in descending balance order
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      assert(g(0).getLong(2) >= g(1).getLong(2))
    }
  }

  /** The shipped survival_km/holt_linear fold their bounded grids
    * driver-side (the UnionLoop per-level floor was ~5 s of constant
    * overhead); the native recursive-CTE twins are the semantic
    * statement. Row-for-row equality here is what licenses the fold.
    */
  test("survival_km driver fold == the native recursive CTE") {
    val fold = SqlSurface.survivalKm(spark, dir).collect().map(_.toSeq)
    val rcte = SqlSurface.survivalKmRcte(spark, dir)
      .select("t", "n_at", "d", "c", "s_ppm").collect().map(_.toSeq)
    assert(fold.nonEmpty)
    assert(fold.toSeq == rcte.toSeq)
  }

  test("holt_linear driver fold == the native recursive CTE") {
    val fold = SqlSurface.holtLinear(spark, dir).collect().map(_.toSeq)
    val rcte = SqlSurface.holtLinearRcte(spark, dir)
      .select("day", "y_c", "level_c", "trend_c", "forecast7_c")
      .collect().map(_.toSeq)
    assert(fold.nonEmpty)
    assert(fold.toSeq == rcte.toSeq)
  }

  test("rcte_levels matches driver-side arithmetic on the key-derived tree") {
    // plain-Scala model: walk each key's ancestor chain
    val maxKey = Tables.read(spark, dir, "part")
      .agg(org.apache.spark.sql.functions.max("p_partkey"))
      .head().getLong(0)
    val want = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    for (k <- 1L to maxKey) {
      var a = (k - 1) / 4
      var d = 1L
      var cont = true
      while (cont) {
        val (n, s) = want.getOrElse(d, (0L, 0L))
        want(d) = (n + 1, s + k)
        if (a >= 1) { a = (a - 1) / 4; d += 1 } else cont = false
      }
    }
    val got = SqlSurface.rcteLevels(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want.toMap)
  }

  test("rcte_levels restores cteRecursionRowLimit after running") {
    val key = "spark.sql.cteRecursionRowLimit"
    val before = spark.conf.get(key)
    SqlSurface.rcteLevels(spark, dir).collect()
    assert(spark.conf.get(key) == before,
      s"recursion guard leaked: $before -> ${spark.conf.get(key)}")
    assert(before.toLong < 200000000L,
      "default guard should be far below the raised query-scoped limit")
  }

  test("sql_udf_surface inlines SQL UDFs: no ScalaUDF, codegen intact") {
    import org.apache.spark.sql.catalyst.expressions.ScalaUDF
    val df = SqlSurface.sqlUdfSurface(spark, dir)
    val udfs = df.queryExecution.optimizedPlan.expressions.flatMap(
      _.collect { case u: ScalaUDF => u })
    // the analyzer must have macro-expanded the function bodies into
    // plain expressions (pushdown and whole-stage codegen see through)
    assert(udfs.isEmpty, s"SQL UDF left a black-box ScalaUDF: $udfs")
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("high", "low", "mid"))
  }

  test("pivot_sql_roundtrip: zero diff rows and cells re-sum to the base") {
    val rows = SqlSurface.pivotSqlRoundtrip(spark, dir).collect()
    val (diffRows, monthRows) = rows.partition(_.isNullAt(0))
    assert(diffRows.length === 1)
    assert(diffRows.head.getLong(6) === 0L, "PIVOT->UNPIVOT lost rows")
    // the wide cells must re-sum to the raw cent total
    val cellSum = monthRows.map(r =>
      (1 to 5).map(i => if (r.isNullAt(i)) 0L else r.getLong(i)).sum).sum
    val raw = Tables.read(spark, dir, "orders")
      .selectExpr("sum(CAST(round(o_totalprice * 100) AS LONG)) s")
      .collect().head.getLong(0)
    assert(cellSum === raw)
  }

  test("sql_script restores the scripting flag after running") {
    val key = "spark.sql.scripting.enabled"
    val before = spark.conf.getOption(key)
    val out = SqlSurface.sqlScript(spark, dir).collect()
    assert(out.length == 5, "one row per order priority")
    assert(spark.conf.getOption(key) == before,
      s"scripting flag leaked: $before -> ${spark.conf.getOption(key)}")
  }
}
