package graft.filters

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiles a parsed [[EventFilter]] into a Catalyst `Column` predicate
  * over a JSON-string payload column — the Spark-native analog of the
  * reference's compile-once-evaluate-per-event closures
  * (evtstrd/filters.py:85-96, evtstrd/http_server.py:145-153).
  *
  * Semantics preserved exactly (evtstrd/filters.py:22-27,32-37):
  *   - missing path               => false (never null, never error)
  *   - runtime type mismatch      => false (an int filter only matches a
  *     JSON integer — a JSON string "50" does NOT match `k<=50`; a string
  *     filter only matches a JSON string; a date filter only matches a
  *     JSON string that parses as a strict ISO date)
  *   - string comparison is code-point order (Python unicode compare ==
  *     Spark's binary UTF-8 compare)
  *
  * Implementation: the payload is parsed once to a VARIANT (Spark 4
  * `parse_json`); `schema_of_variant` provides the strict runtime type
  * probe that `get_json_object` cannot (it erases the string/number
  * distinction). Every compiled predicate is finally collapsed with
  * `coalesce(pred, false)` because the reference is two-valued while
  * Spark SQL is three-valued.
  */
object FilterCompiler {
  /** Bracket-style variant path, e.g. `$['foo']['bar']` — field chars
    * are restricted to [a-z-] by the grammar so no quoting is needed.
    * Empty segments (trailing-dot fields like `foo.`) render as
    * `['']`, a literal empty-string-key lookup — the same semantics
    * as the native probe, FilterEval, and the oracle's JSON-Pointer
    * rendering.
    */
  private def variantPath(path: Seq[String]): String =
    "$" + path.map(p => s"['$p']").mkString

  private val IntSchemas = Seq("TINYINT", "SMALLINT", "INT", "BIGINT")

  /** Matches IsoDate: 4 digits, optional dash, 2 digits, optional dash,
    * 2 digits. Parsing strategy shared with the DuckDB oracle: strip
    * dashes then strict-parse `yyyyMMdd` (returns null on out-of-range
    * month/day with ANSI off — verified by FilterCompilerSpec).
    */
  private[filters] val DateRegex = "^\\d{4}-?\\d{2}-?\\d{2}$"

  private def cmp(op: CmpOp, l: Column, r: Column): Column = op match {
    case CmpOp.Eq => l === r
    case CmpOp.Gt => l > r
    case CmpOp.Ge => l >= r
    case CmpOp.Lt => l < r
    case CmpOp.Le => l <= r
  }

  /** An out-of-int64 literal against the int64 payload domain:
    * every int payload is below a huge positive literal and above a
    * huge negative one; equality never holds.
    */
  private[filters] def hugeLiteralMatches(op: CmpOp, positive: Boolean): Boolean =
    (op, positive) match {
      case (CmpOp.Lt | CmpOp.Le, true) => true
      case (CmpOp.Gt | CmpOp.Ge, false) => true
      case _ => false
    }

  /** Compile against an already-parsed VARIANT column (preferred: parse
    * the payload once, evaluate many filters against it).
    */
  def compileOnVariant(f: EventFilter, v: Column): Column = {
    val leaf = try_variant_get(v, variantPath(f.path), "variant")
    val sch = schema_of_variant(leaf)
    val pred = f.value match {
      case FilterValue.IntVal(n) =>
        sch.isin(IntSchemas: _*) &&
          cmp(f.op, try_variant_get(v, variantPath(f.path), "bigint"), lit(n))
      case FilterValue.BigIntVal(b) =>
        if (hugeLiteralMatches(f.op, b > 0)) sch.isin(IntSchemas: _*)
        else lit(false)
      case FilterValue.Str(s) =>
        sch === "STRING" &&
          cmp(f.op, try_variant_get(v, variantPath(f.path), "string"), lit(s))
      case FilterValue.DateVal(d) =>
        val raw = try_variant_get(v, variantPath(f.path), "string")
        // try_to_date: null on out-of-range month/day (ANSI-safe) ==
        // the reference's raise => no-match (evtstrd/filters.py:22-27).
        sch === "STRING" && raw.rlike(DateRegex) &&
          cmp(
            f.op,
            call_function(
              "try_to_date",
              regexp_replace(raw, "-", ""),
              lit("yyyyMMdd")),
            lit(java.sql.Date.valueOf(d)))
    }
    coalesce(pred, lit(false))
  }

  /** Compile against a JSON-string column using the native codegen'd
    * probe expressions ([[graft.functions.JsonStrictLong]] /
    * [[JsonStrictString]]) — one Jackson pass per predicate, inside
    * whole-stage codegen. This is the default production path; the
    * variant-based composition below is the all-builtins alternative,
    * held to the same corpus + property suites.
    */
  def compile(f: EventFilter, jsonCol: Column): Column = {
    import graft.functions.JsonStrictFunctions._
    val pred = f.value match {
      case FilterValue.IntVal(n) =>
        cmp(f.op, jsonIntStrict(jsonCol, f.path), lit(n))
      case FilterValue.BigIntVal(b) =>
        if (hugeLiteralMatches(f.op, b > 0))
          jsonIntStrict(jsonCol, f.path).isNotNull
        else lit(false)
      case FilterValue.Str(s) =>
        cmp(f.op, jsonStringStrict(jsonCol, f.path), lit(s))
      case FilterValue.DateVal(d) =>
        val raw = jsonStringStrict(jsonCol, f.path)
        raw.rlike(DateRegex) &&
          cmp(
            f.op,
            call_function(
              "try_to_date",
              regexp_replace(raw, "-", ""),
              lit("yyyyMMdd")),
            lit(java.sql.Date.valueOf(d)))
    }
    coalesce(pred, lit(false))
  }

  def compile(filterString: String, jsonCol: Column): Column =
    compile(FilterParser.parse(filterString), jsonCol)

  /** AND of all filters; empty list => always true
    * (evtstrd/listener.py:62 — `all([]) == True`).
    */
  def compileAll(filters: Seq[String], jsonCol: Column): Column =
    filters
      .map(s => compile(FilterParser.parse(s), jsonCol))
      .reduceOption(_ && _)
      .getOrElse(lit(true))

  /** Variant-based compile (all built-in Spark functions). */
  def compileVariant(f: EventFilter, jsonCol: Column): Column =
    compileOnVariant(f, try_parse_json(jsonCol))

  def compileAllOnVariant(filters: Seq[String], v: Column): Column =
    filters
      .map(s => compileOnVariant(FilterParser.parse(s), v))
      .reduceOption(_ && _)
      .getOrElse(lit(true))
}
