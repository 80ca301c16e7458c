package graft.filters

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's semantic corpus (evtstrd_test/filter.py:8-93)
  * against the Catalyst-compiled predicates. The load-bearing cases are
  * the two-valued collapses: missing path => false, type mismatch =>
  * false, bad date in message => false.
  */
class FilterCompilerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Batch-evaluate one filter against several JSON docs through BOTH
    * compile paths (native codegen probes and variant built-ins),
    * asserting they agree.
    */
  private def eval(filter: String, docs: Seq[String]): Seq[Boolean] = {
    import spark.implicits._
    val parsed = FilterParser.parse(filter)
    docs.toDF("j")
      .select(
        FilterCompiler.compile(parsed, col("j")).as("n"),
        FilterCompiler.compileVariant(parsed, col("j")).as("v"))
      .collect()
      .map { r =>
        assert(r.getBoolean(0) == r.getBoolean(1),
          s"native/variant disagree for [$filter]")
        r.getBoolean(0)
      }
      .toSeq
  }
  private def eval1(filter: String, doc: String): Boolean =
    eval(filter, Seq(doc)).head

  test("missing path => false (filter.py:13-15, 55-57)") {
    assert(!eval1("foo.bar<='ABC'", """{"foo": {}}"""))
    assert(!eval1("foo<=10", """{}"""))
    assert(!eval1("foo.bar<=10", """{"nope": 1}"""))
  }

  test("type mismatch => false (filter.py:17-19, 59-61)") {
    // string filter vs int field
    assert(!eval1("foo.bar<='50'", """{"foo": {"bar": 13}}"""))
    // int filter vs string field — "50" must NOT match k<=50
    assert(!eval1("foo<=10", """{"foo": ""}"""))
    assert(!eval1("foo<=50", """{"foo": "13"}"""))
    // int filter vs float field (Python int type check)
    assert(!eval1("foo<=10", """{"foo": 9.5}"""))
    // int filter vs bool field (bools are not ints here)
    assert(!eval1("foo=1", """{"foo": true}"""))
  }

  test("string comparators (filter.py:21-37)") {
    val docs = Seq(
      """{"foo": {"bar": "AAA"}}""",
      """{"foo": {"bar": "ABC"}}""",
      """{"foo": {"bar": "CAA"}}""")
    assert(eval("foo.bar<='ABC'", docs) == Seq(true, true, false))
    assert(eval("foo.bar<'ABC'", docs) == Seq(true, false, false))
    assert(eval("foo.bar>'ABC'", docs) == Seq(false, false, true))
    assert(eval("foo.bar>='ABC'", docs) == Seq(false, true, true))
    assert(eval("foo.bar='ABC'", docs) == Seq(false, true, false))
  }

  test("int comparators (filter.py:63-79)") {
    val docs =
      Seq("""{"foo": 9}""", """{"foo": 10}""", """{"foo": 11}""")
    assert(eval("foo=10", docs) == Seq(false, true, false))
    assert(eval("foo<=10", docs) == Seq(true, true, false))
    assert(eval("foo>=10", docs) == Seq(false, true, true))
    assert(eval("foo<10", docs) == Seq(true, false, false))
    assert(eval("foo>10", docs) == Seq(false, false, true))
  }

  test("string equality (filter.py:81-84)") {
    assert(!eval1("foo='bar'", """{"foo": "baz"}"""))
    assert(eval1("foo='bar'", """{"foo": "bar"}"""))
  }

  test("date filter (filter.py:86-89)") {
    assert(!eval1("foo=2016-03-24", """{"foo": "2000-01-01"}"""))
    assert(eval1("foo=2016-03-24", """{"foo": "2016-03-24"}"""))
    // compact + mixed-dash message forms parse (evtstrd/date.py:4)
    assert(eval1("foo=2016-03-24", """{"foo": "20160324"}"""))
    assert(eval1("foo=2016-03-24", """{"foo": "2016-0324"}"""))
    // bad date in message => false, not error
    assert(!eval1("foo=2016-03-24", """{"foo": "2016-13-24"}"""))
    assert(!eval1("foo=2016-03-24", """{"foo": "2016-03-32"}"""))
    assert(!eval1("foo=2016-03-24", """{"foo": "INVALID"}"""))
    // date filter vs int field => false
    assert(!eval1("foo=2016-03-24", """{"foo": 20160324}"""))
    // leap-year calendar strictness
    assert(eval1("foo=2024-02-29", """{"foo": "2024-02-29"}"""))
    assert(!eval1("foo>=2024-01-01", """{"foo": "2023-02-29"}"""))
    // range comparisons
    assert(eval1("foo>=2016-03-24", """{"foo": "2016-03-25"}"""))
    assert(!eval1("foo<2016-03-24", """{"foo": "2016-03-24"}"""))
  }

  test("nested path int (filter.py:91-93)") {
    assert(eval1("foo.bar<=10", """{"foo": {"bar": 10}}"""))
  }

  test("malformed JSON payload => false") {
    assert(!eval1("foo=10", """not json"""))
    assert(!eval1("foo=10", """"""))
  }

  test("trailing-dot field never matches the parent key") {
    assert(!eval1("foo.<=10", """{"foo": 10}"""))
    assert(!eval1("foo.=1", """{"foo": 1}"""))
  }

  test("out-of-int64 literals: ordering folds over the int64 domain") {
    val huge = "99999999999999999999999999"
    assert(eval1(s"foo<=$huge", """{"foo": 5}"""))
    assert(eval1(s"foo<$huge", """{"foo": 9223372036854775807}"""))
    assert(!eval1(s"foo>=$huge", """{"foo": 5}"""))
    assert(!eval1(s"foo=$huge", """{"foo": 5}"""))
    assert(eval1(s"foo>=-$huge", """{"foo": -5}"""))
    // type strictness still applies
    assert(!eval1(s"foo<=$huge", """{"foo": "5"}"""))
    assert(!eval1(s"foo<=$huge", """{"foo": 5.5}"""))
  }

  test("integers wider than int64 in the payload never match") {
    assert(!eval1("foo>=1", """{"foo": 18446744073709551617}"""))
    assert(!eval1("foo=1", """{"foo": 18446744073709551617}"""))
  }

  test("conjunction: all filters must pass; empty list matches all") {
    import spark.implicits._
    val df = Seq("""{"k": 42}""").toDF("j")
    def run(fs: Seq[String]): Boolean =
      df.select(FilterCompiler.compileAll(fs, col("j")).as("r"))
        .head().getBoolean(0)
    assert(run(Seq("k>=10", "k<=50")))
    assert(!run(Seq("k>=10", "k<=40")))
    assert(run(Nil))
  }
}
