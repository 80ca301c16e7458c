package graft.filters

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Property check: the Catalyst-compiled predicate must agree with the
  * transliterated reference evaluator ([[FilterEval]]) on generated
  * (filter string, JSON document) pairs. Deterministic seed so the
  * suite is stable offline.
  */
class FilterPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val fieldGen: Gen[String] =
    Gen.oneOf("k", "foo", "foo.bar", "a-b", "deep.er.path", "k.", ".k")
  private val opGen: Gen[String] = Gen.oneOf("=", ">", ">=", "<", "<=")
  private val valueGen: Gen[String] = Gen.oneOf(
    Gen.chooseNum(-5L, 105L).map(_.toString),
    Gen.oneOf("'a'", "'ABC'", "''", "'zz'", "'50'"),
    Gen.oneOf("2016-03-24", "20160324", "2015-12-31"))
  private val filterGen: Gen[String] = for {
    f <- fieldGen; o <- opGen; v <- valueGen
  } yield s"$f$o$v"

  // Documents deliberately hit every type/shape the evaluator branches
  // on: ints, numeric strings, floats, bools, nulls, dates (all three
  // dash forms), invalid dates, nested objects, arrays, missing keys,
  // malformed JSON.
  private val leafGen: Gen[String] = Gen.oneOf(
    Gen.chooseNum(-5L, 105L).map(_.toString),
    Gen.chooseNum(0L, 100L).map(n => s""""$n""""),
    Gen.oneOf("9.5", "1.0", "true", "false", "null", "[1,2]", "{}"),
    Gen.oneOf(
      "\"a\"", "\"ABC\"", "\"zz\"", "\"\"",
      "\"2016-03-24\"", "\"20160324\"", "\"2016-0324\"",
      "\"2016-13-24\"", "\"2016-03-32\"", "\"INVALID\""))
  private val docGen: Gen[String] = Gen.oneOf(
    leafGen.map(v => s"""{"k": $v}"""),
    leafGen.map(v => s"""{"foo": $v}"""),
    leafGen.map(v => s"""{"foo": {"bar": $v}}"""),
    leafGen.map(v => s"""{"a-b": $v, "k": 1}"""),
    leafGen.map(v => s"""{"deep": {"er": {"path": $v}}}"""),
    // empty-string keys: 'k.' / '.k' fields resolve these literally
    leafGen.map(v => s"""{"k": {"": $v}}"""),
    leafGen.map(v => s"""{"": {"k": $v}}"""),
    Gen.const("""{"other": 1}"""),
    Gen.const("""not json at all"""))

  private def sample[T](g: Gen[T], n: Int, seedOffset: Long): Seq[T] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, rng.Seed(42L + seedOffset + i)))

  test("compiled Column == reference evaluator on 60 filters x 120 docs") {
    import org.apache.spark.sql.functions.{array, coalesce, lit, try_parse_json}
    import spark.implicits._
    val filters = sample(filterGen, 60, 0).distinct
    val docs = sample(docGen, 120, 1000).distinct
    val df = docs.toDF("j").cache()
    try {
      for (f <- filters) {
        val parsed = FilterParser.parse(f)
        val got = df
          .select(
            col("j"),
            FilterCompiler.compile(parsed, col("j")).as("native"),
            FilterCompiler.compileVariant(parsed, col("j")).as("variant"),
            // the dynamic fan-out's filters-as-data kernel: same
            // semantics with the filter string arriving at runtime
            coalesce(
              graft.functions.VariantFilterFunctions.variantFilters(
                try_parse_json(col("j")), array(lit(f))),
              lit(false)).as("kernel"))
          .collect()
          .map(r =>
            r.getString(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
          .toMap
        for (d <- docs) {
          val want = FilterEval.matches(d, Seq(f))
          val (nat, vrt, krn) = got(d)
          assert(
            nat == want && vrt == want && krn == want,
            s"filter [$f] doc [$d]: native=$nat variant=$vrt kernel=$krn model=$want")
        }
      }
    } finally df.unpersist()
  }
}
