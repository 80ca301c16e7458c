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

  test("text-hash kernels from SQL match their built-in statements") {
    // simhash32 = md5 hex-char parity sums; cross-check one token by
    // hand against the md5 of 'abc'
    val r = spark.sql(
      """SELECT
        |  simhash32(array('abc')),
        |  minhash_sig(array('x', 'y'), 2),
        |  ordered_pairs(array(3L, 1L, 2L))""".stripMargin).head()
    val md5abc = "900150983cd24fb0d6963f7d28e17f72"
    val expected = md5abc.map(c => if (c.toInt % 2 == 1) '1' else '0').mkString
    assert(r.getString(0) == expected)
    val sig = r.getSeq[String](1)
    assert(sig == Seq(
      Seq("0|x", "0|y").map(s => org.apache.commons.codec.digest.DigestUtils.md5Hex(s)).min,
      Seq("1|x", "1|y").map(s => org.apache.commons.codec.digest.DigestUtils.md5Hex(s)).min))
    val pairs = r.getSeq[org.apache.spark.sql.Row](2)
      .map(p => (p.getLong(0), p.getLong(1)))
    assert(pairs == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("vec_sum aggregate and nearest_centroid from SQL") {
    import spark.implicits._
    Seq(
      ("a", Seq(1L, 2L)), ("a", Seq(10L, 20L)), ("b", Seq(5L, 5L)))
      .toDF("k", "v").createOrReplaceTempView("vs")
    val sums = spark.sql("SELECT k, vec_sum(v) s FROM vs GROUP BY k ORDER BY k")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sums("a") == Seq(11L, 22L) && sums("b") == Seq(5L, 5L))
    val nc = spark.sql(
      """SELECT
        |  nearest_centroid(array(1L, 1L), array(
        |    named_struct('c_id', 7L, 'cv', array(0L, 0L)),
        |    named_struct('c_id', 3L, 'cv', array(5L, 5L)))),
        |  nearest_centroid(array(1L, 1L), array(
        |    named_struct('c_id', 7L, 'cv', array(0L, 0L)),
        |    named_struct('c_id', 3L, 'cv', array(5L, 5L))), 7L)""".stripMargin)
      .head()
    assert(nc.getLong(0) == 7L) // nearest
    assert(nc.getLong(1) == 3L) // nearest excluding 7
  }

  test("kernel guards: dim mismatch loud, null centroid fields skipped") {
    // silent min-length truncation would mean quietly wrong distances
    val e = intercept[Exception](
      spark.sql("SELECT vec_dot(array(1L, 2L), array(1L))").collect())
    assert(e.getMessage.contains("dimension mismatch")
      || Option(e.getCause).exists(_.getMessage.contains("dimension mismatch")))
    // null c_id / null cv centroids are skipped, not NPE / id-0 reads
    val r = spark.sql(
      """SELECT nearest_centroid(array(1L, 2L), array(
        |  named_struct('c_id', CAST(NULL AS BIGINT), 'cv', array(1L, 2L)),
        |  named_struct('c_id', 7L, 'cv', CAST(NULL AS ARRAY<BIGINT>)),
        |  named_struct('c_id', 3L, 'cv', array(1L, 3L))))""".stripMargin)
      .head()
    assert(r.getLong(0) == 3L)
    // vec_sum over array<int> fails analysis (packed-int getLong would
    // otherwise misread silently)
    val t = intercept[Exception](
      spark.sql("SELECT vec_sum(a) FROM VALUES (array(1, 2)) t(a)").collect())
    assert(t.getMessage.toLowerCase.contains("vec_sum expects")
      || t.getMessage.toLowerCase.contains("type"))
  }

  test("ordered_pairs maxPairs cap and type checking") {
    // explicit cap form: a 3-element list expands to 3 pairs > cap 2
    val e = intercept[Exception](
      spark.sql("SELECT ordered_pairs(array(3L, 1L, 2L), 2)").collect())
    assert(e.getMessage.contains("cap or filter hot keys")
      || Option(e.getCause).exists(_.getMessage.contains("cap or filter hot keys")))
    // cap large enough: normal expansion
    val ok = spark.sql("SELECT ordered_pairs(array(3L, 1L, 2L), 10)").head()
      .getSeq[org.apache.spark.sql.Row](0).map(p => (p.getLong(0), p.getLong(1)))
    assert(ok == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    // wrong element type fails at analysis, not in the executor
    val t = intercept[Exception](
      spark.sql("SELECT ordered_pairs(array('a', 'b'))").collect())
    assert(t.getMessage.toLowerCase.contains("type"))
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
