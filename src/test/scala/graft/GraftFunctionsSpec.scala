package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface: filter language + native kernels callable from
  * spark.sql, compiling at plan time to the same predicate trees as
  * the DataFrame path.
  */
class GraftFunctionsSpec extends AnyFunSuite {
  private lazy val spark = { GraftFunctions.register(TestSpark.spark); TestSpark.spark }

  test("evt_filter / evt_filter_all from SQL") {
    import spark.implicits._
    Seq(
      """{"k": 42}""", """{"k": "42"}""", """{"k": 99}""", """not json""")
      .toDF("j").createOrReplaceTempView("payloads")
    val got = spark.sql(
      """SELECT evt_filter(j, 'k<=50') a,
        |  evt_filter_all(j, 'k>=10', 'k<90') b,
        |  evt_filter_all(j) c
        |FROM payloads""".stripMargin)
      .collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)))
    assert(got.toSeq == Seq(
      (true, true, true),   // int 42
      (false, false, true), // string "42": strict typing
      (false, false, true), // 99
      (false, false, true))) // bad json never matches a filter
  }

  test("strict probes, vector kernels, rolling hash from SQL") {
    val r = spark.sql(
      """SELECT
        |  json_int_strict('{"a": {"b": 7}}', 'a.b'),
        |  json_int_strict('{"a": {"b": "7"}}', 'a.b'),
        |  json_string_strict('{"s": "x"}', 's'),
        |  vec_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)),
        |  vec_l2sq(array(1L, 2L), array(4L, 6L)),
        |  rolling_hash('hi')""".stripMargin).head()
    assert(r.getLong(0) == 7L)
    assert(r.isNullAt(1))
    assert(r.getString(2) == "x")
    assert(r.getLong(3) == 32L)
    assert(r.getLong(4) == 25L)
    assert(r.getLong(5) == (104L * 31 + 105) % 1000000007L)
  }

  test("non-literal filter string is rejected at plan time") {
    import spark.implicits._
    Seq(("""{"k": 1}""", "k<=50")).toDF("j", "f")
      .createOrReplaceTempView("dynamic_filters")
    val e = intercept[Exception](
      spark.sql("SELECT evt_filter(j, f) FROM dynamic_filters").collect())
    assert(e.getMessage.contains("literal"))
  }
}
