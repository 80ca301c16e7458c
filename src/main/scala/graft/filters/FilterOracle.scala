package graft.filters

/** Generates the DuckDB-SQL equivalent of a compiled filter predicate,
  * so the driver's DuckDB oracle and the Spark plan share one source of
  * truth for the filter-language semantics (missing/mistyped => false,
  * strict type matching, strict date parsing).
  */
object FilterOracle {
  /** JSON *Pointer* rendering (DuckDB accepts both `$.a.b` and
    * `/a/b`): unlike the `$.`-path syntax, a pointer can address
    * empty-string keys (`foo.` => `/foo/`), so the oracle resolves
    * them exactly like the production native probe and FilterEval do.
    * Grammar restricts segments to [a-z-], so no `~`/`/` escaping is
    * ever needed.
    */
  private def jsonPath(path: Seq[String]): String =
    "/" + path.mkString("/")

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  /** DuckDB boolean expression (never NULL) for one filter over a JSON
    * varchar column expression.
    */
  def predicate(f: EventFilter, jsonExpr: String): String = {
    val p = jsonPath(f.path)
    val typ = s"json_type($jsonExpr, ${sqlStr(p)})"
    val core = f.value match {
      case FilterValue.IntVal(n) =>
        // TRY_CAST: a UBIGINT-range payload (> int64) nulls out here
        // and the Spark side's canConvertToLong check matches that
        s"$typ IN ('UBIGINT','BIGINT') AND " +
          s"TRY_CAST(json_extract_string($jsonExpr, ${sqlStr(p)}) AS BIGINT) ${f.op.sym} $n"
      case FilterValue.BigIntVal(b) =>
        if (FilterCompiler.hugeLiteralMatches(f.op, b > 0))
          s"$typ IN ('UBIGINT','BIGINT') AND " +
            s"TRY_CAST(json_extract_string($jsonExpr, ${sqlStr(p)}) AS BIGINT) IS NOT NULL"
        else "false"
      case FilterValue.Str(s) =>
        s"$typ = 'VARCHAR' AND " +
          s"json_extract_string($jsonExpr, ${sqlStr(p)}) ${f.op.sym} ${sqlStr(s)}"
      case FilterValue.DateVal(d) =>
        val raw = s"json_extract_string($jsonExpr, ${sqlStr(p)})"
        s"$typ = 'VARCHAR' AND regexp_matches($raw, '^\\d{4}-?\\d{2}-?\\d{2}$$') AND " +
          s"CAST(try_strptime(regexp_replace($raw, '-', '', 'g'), '%Y%m%d') AS DATE) ${f.op.sym} DATE '$d'"
    }
    s"COALESCE(($core), false)"
  }

  def predicate(filterString: String, jsonExpr: String): String =
    predicate(FilterParser.parse(filterString), jsonExpr)

  /** AND of all filters; empty => TRUE. */
  def predicateAll(filters: Seq[String], jsonExpr: String): String =
    if (filters.isEmpty) "true"
    else filters.map(predicate(_, jsonExpr)).mkString("(", " AND ", ")")
}
