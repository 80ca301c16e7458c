package graft.filters

import java.time.LocalDate

/** AST + parser for the reference's filter mini-language.
  *
  * Grammar (reference: evtstrd/filters.py:65-96):
  *   filter  := field op value
  *   field   := [a-z.-]+        (dots separate nested JSON path segments)
  *   op      := = | >= | <= | < | >
  *   value   := 'string' | iso-date | int
  *
  * Value parsing (evtstrd/filters.py:75-82 `_parse_value`): a token of
  * length >= 2 that starts AND ends with a single quote is a string
  * literal (quotes stripped, no escapes); otherwise try ISO date;
  * otherwise parse as int; otherwise it is a syntax error (surfaced as
  * HTTP 400 in the reference, evtstrd/http_server.py:149-152).
  */
sealed abstract class CmpOp(val sym: String)
object CmpOp {
  case object Eq extends CmpOp("=")
  case object Gt extends CmpOp(">")
  case object Ge extends CmpOp(">=")
  case object Lt extends CmpOp("<")
  case object Le extends CmpOp("<=")
  val all: Seq[CmpOp] = Seq(Eq, Gt, Ge, Lt, Le)
}

sealed trait FilterValue
object FilterValue {
  final case class Str(v: String) extends FilterValue
  final case class IntVal(v: Long) extends FilterValue
  final case class DateVal(v: LocalDate) extends FilterValue

  /** Integer literal outside int64 range (Python ints are unbounded,
    * so the reference accepts these — evtstrd/filters.py:82). Matchable
    * payload values are int64, so comparisons constant-fold: a huge
    * positive literal satisfies every `<`/`<=`, no `>`/`>=`/`=`, and
    * vice versa for huge negative.
    */
  final case class BigIntVal(v: BigInt) extends FilterValue
}

/** One parsed filter. `path` is the dot-split field; `raw` is kept for
  * round-tripping (evtstrd/filters.py:20,29-30 keeps the original
  * string for display).
  */
final case class EventFilter(
    path: Seq[String],
    op: CmpOp,
    value: FilterValue,
    raw: String) {
  override def toString: String = raw
}

/** Invalid filter string (reference: ValueError => HTTP 400). */
final class FilterSyntaxException(msg: String)
    extends IllegalArgumentException(msg)

/** Strict ISO date parsing per evtstrd/date.py:4-16: regex
  * `^(\d{4})-?(\d{2})-?(\d{2})$` (each dash independently optional, so
  * mixed forms like `2015-0413` are accepted) then calendar-range
  * validation. Returns None for any invalid input.
  */
object IsoDate {
  private val Re = """^(\d{4})-?(\d{2})-?(\d{2})$""".r

  def parse(s: String): Option[LocalDate] = s match {
    case Re(y, m, d) =>
      // Python's datetime.date has MINYEAR = 1; java.time accepts
      // year 0. Without this gate "0000-01-01" parses here but not in
      // the reference or the compiled Spark/DuckDB date paths —
      // the four evaluation paths must agree on every input.
      if (y.toInt < 1) None
      else
        try Some(LocalDate.of(y.toInt, m.toInt, d.toInt))
        catch { case _: java.time.DateTimeException => None }
    case _ => None
  }
}

object FilterParser {
  // evtstrd/filters.py:65 — alternation order means `>=`/`<=` win over
  // bare `>`/`<` via regex backtracking, same as Python's re.
  private val FilterRe = """^([a-z.-]+)(=|>=|<=|<|>)(.*)$""".r
  // Python int() accepts surrounding whitespace, a sign, and single
  // underscores between digits.
  private val PyIntRe = """^[+-]?\d(?:_?\d)*$""".r

  def parse(string: String): EventFilter = string match {
    case FilterRe(field, opSym, valueStr) =>
      val op = CmpOp.all.find(_.sym == opSym).get
      // -1 limit keeps trailing empty segments: the reference maps
      // "foo." to jsonget path "foo/", whose empty final segment is a
      // literal ""-key lookup — it matches only a payload that
      // actually has an empty-string key there (so in practice it
      // almost never matches, but it is not a parse error).
      EventFilter(field.split("\\.", -1).toSeq, op, parseValue(valueStr), string)
    case _ =>
      throw new FilterSyntaxException(s"invalid filter '$string'")
  }

  /** evtstrd/filters.py:75-82. */
  def parseValue(v: String): FilterValue =
    if (v.length >= 2 && v.startsWith("'") && v.endsWith("'"))
      FilterValue.Str(v.substring(1, v.length - 1))
    else
      IsoDate.parse(v) match {
        case Some(d) => FilterValue.DateVal(d)
        case None =>
          val t = v.trim
          if (PyIntRe.matches(t)) {
            val b = BigInt(t.replace("_", ""))
            if (b.isValidLong) FilterValue.IntVal(b.toLong)
            else FilterValue.BigIntVal(b)
          } else throw new FilterSyntaxException(s"invalid filter value '$v'")
      }
}
