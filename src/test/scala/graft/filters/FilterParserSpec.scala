package graft.filters

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's parser/date unit corpus verbatim:
  * evtstrd_test/filter.py:41-53 (parse errors + round-trip) and
  * evtstrd_test/date.py:9-28.
  */
class FilterParserSpec extends AnyFunSuite {

  test("round-trip: str(parse(s)) == s") {
    for (s <- Seq("foo='bar'", "foo.bar<='ABC'", "k<=50", "a-b.c>=2016-03-24"))
      assert(FilterParser.parse(s).toString == s)
  }

  test("parses comparators with correct precedence of >= <= over > <") {
    assert(FilterParser.parse("foo>=10").op == CmpOp.Ge)
    assert(FilterParser.parse("foo<=10").op == CmpOp.Le)
    assert(FilterParser.parse("foo>10").op == CmpOp.Gt)
    assert(FilterParser.parse("foo<10").op == CmpOp.Lt)
    assert(FilterParser.parse("foo=10").op == CmpOp.Eq)
  }

  test("dot path splits to segments; dashes allowed in fields") {
    assert(FilterParser.parse("foo.bar<=10").path == Seq("foo", "bar"))
    assert(FilterParser.parse("a-b.c-d=1").path == Seq("a-b", "c-d"))
    // trailing dot keeps its empty segment (reference jsonget path
    // "foo/" resolves the empty-string key, i.e. almost never)
    assert(FilterParser.parse("foo.=1").path == Seq("foo", ""))
  }

  test("integer literals beyond int64 parse (Python ints are unbounded)") {
    assert(FilterParser.parse("k<=99999999999999999999999999").value ==
      FilterValue.BigIntVal(BigInt("99999999999999999999999999")))
    assert(FilterParser.parse("k>=-99999999999999999999999999").value ==
      FilterValue.BigIntVal(BigInt("-99999999999999999999999999")))
  }

  test("value types: quoted string, date, int") {
    assert(FilterParser.parse("f='bar'").value == FilterValue.Str("bar"))
    assert(FilterParser.parse("f=''").value == FilterValue.Str(""))
    assert(FilterParser.parse("f=10").value == FilterValue.IntVal(10L))
    assert(FilterParser.parse("f=-7").value == FilterValue.IntVal(-7L))
    assert(
      FilterParser.parse("f=2016-03-24").value ==
        FilterValue.DateVal(LocalDate.of(2016, 3, 24)))
    assert( // compact and mixed-dash date forms (evtstrd/date.py:4)
      FilterParser.parse("f=20160324").value ==
        FilterValue.DateVal(LocalDate.of(2016, 3, 24)))
    assert(
      FilterParser.parse("f=2016-0324").value ==
        FilterValue.DateVal(LocalDate.of(2016, 3, 24)))
  }

  test("parse errors (reference ValueError cases, filter.py:41-53)") {
    for (bad <- Seq(
        "INVALID", // no comparator
        "foo=bar", // unquoted string
        "foo='bar", // unterminated quote
        "foo='", // len<2 quote rule
        "foo=2000-12-32", // out-of-range date is not a date nor an int
        "Foo=10", // uppercase field rejected by [a-z.-]+
        "foo2=10", // digits not allowed in field
        "=10", // empty field
        "foo=10.5" // float literals unsupported
      ))
      assertThrows[FilterSyntaxException](FilterParser.parse(bad))
  }

  test("iso date corpus (evtstrd_test/date.py:9-28)") {
    assert(IsoDate.parse("2015-04-13").contains(LocalDate.of(2015, 4, 13)))
    assert(IsoDate.parse("20150413").contains(LocalDate.of(2015, 4, 13)))
    assert(IsoDate.parse("").isEmpty)
    assert(IsoDate.parse("INVALID").isEmpty)
    assert(IsoDate.parse("20151304").isEmpty) // month 13
    assert(IsoDate.parse("2000-12-32").isEmpty) // day 32
    assert(IsoDate.parse("2015-04-13x").isEmpty)
  }

  test("year zero rejected like Python MINYEAR=1; matches no path") {
    // java.time would accept year 0; datetime.date and the compiled
    // Spark/DuckDB date paths do not — the gate keeps all four
    // evaluation paths in agreement
    assert(IsoDate.parse("0000-01-01").isEmpty)
    // as a filter literal it is neither date nor int => 400
    assertThrows[FilterSyntaxException](FilterParser.parse("d=0000-01-01"))
    // as a payload value under a date filter it matches nowhere
    assert(!FilterEval.matches("""{"d":"0000-01-01"}""", Seq("d<2020-01-01")))
  }

  test("eval is total: malformed filter-as-data matches nothing") {
    // on the subscriptions-as-data path a bad filter row must not
    // throw inside the streaming plan — it just never matches
    assert(!FilterEval.matches("""{"k": 1}""", Seq("k<<1")))
    // and the empty filter list matches before payload inspection
    // (all([]) is True even for an unparseable payload)
    assert(FilterEval.matches("not json at all", Nil))
  }
}
