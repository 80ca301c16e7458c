package graft.filters

import org.apache.spark.types.variant.{Variant, VariantUtil}
import org.apache.spark.unsafe.types.VariantVal

/** Filter-language evaluation over an already-parsed VARIANT payload —
  * the executor-side kernel behind the dynamic fan-out residual
  * (filters-as-data, [[graft.functions.VariantFilters]]). The event's
  * JSON payload is parsed ONCE per event row (try_parse_json before
  * the subscription join); each joined (event, subscription) pair then
  * walks the compact variant binary, instead of re-parsing the JSON
  * string per pair as the r2 Scala UDF did.
  *
  * Semantics are identical to [[FilterEval]] (the Jackson model
  * evaluator, property-checked against this one in
  * FilterPropertySpec): missing path / type mismatch / unparseable
  * date => false; string compare is code-point order; the int domain
  * is int64 (a JSON integer beyond int64 parses to variant DECIMAL,
  * which the strict LONG type gate rejects — same as the other three
  * evaluation paths). One deliberate divergence inherited from the
  * variant representation: a payload with duplicate JSON keys makes
  * `try_parse_json` return null (=> no match), where Jackson takes
  * the last value — the same strictness the compiled variant path
  * (FilterCompiler.compileOnVariant) already has.
  *
  * Parsed filters are memoized per JVM like FilterEval's
  * (evtstrd/filters.py:85 parses once per subscription).
  */
object VariantFilterEval extends Serializable {
  // bounded + total like FilterEval's: filter strings are DATA here
  // (kernel runs inside the streaming plan), so a malformed one must
  // become "matches nothing", never a query-killing throw, and the
  // memo must not grow without bound under subscription churn
  @transient private lazy val filterCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[EventFilter]]()

  private def parsed(s: String): Option[EventFilter] = {
    val cached = filterCache.get(s)
    if (cached != null) cached
    else {
      val f =
        try Some(FilterParser.parse(s))
        catch { case _: FilterSyntaxException => None }
      if (filterCache.size >= FilterEval.MaxCachedFilters)
        filterCache.clear()
      filterCache.putIfAbsent(s, f)
      f
    }
  }

  // comparison convention + op dispatch are FilterEval's — one source
  // of truth for both evaluators
  private def cmpCodePoints(a: String, b: String): Int =
    FilterEval.cmpCodePoints(a, b)
  private def applyOp(op: CmpOp, c: Int): Boolean = FilterEval.applyOp(op, c)

  /** Each segment must land on an object field; missing => null
    * (evtstrd/filters.py:22-27).
    */
  private def descend(root: Variant, path: Seq[String]): Variant = {
    var cur = root
    val it = path.iterator
    while (it.hasNext) {
      if (cur == null || cur.getType != VariantUtil.Type.OBJECT) return null
      cur = cur.getFieldByKey(it.next())
    }
    cur
  }

  def evalFilter(f: EventFilter, root: Variant): Boolean = {
    val node = descend(root, f.path)
    if (node == null) false
    else
      f.value match {
        case FilterValue.IntVal(v) =>
          // strict: only a JSON integer in int64 (variant LONG) —
          // floats are DOUBLE/DECIMAL, bools BOOLEAN, numeric strings
          // STRING (evtstrd/filters.py:47-53)
          node.getType == VariantUtil.Type.LONG &&
            applyOp(f.op, java.lang.Long.compare(node.getLong, v))
        case FilterValue.BigIntVal(b) =>
          node.getType == VariantUtil.Type.LONG &&
            FilterCompiler.hugeLiteralMatches(f.op, b > 0)
        case FilterValue.Str(v) =>
          node.getType == VariantUtil.Type.STRING &&
            applyOp(f.op, cmpCodePoints(node.getString, v))
        case FilterValue.DateVal(v) =>
          node.getType == VariantUtil.Type.STRING &&
            (IsoDate.parse(node.getString) match {
              case Some(d) => applyOp(f.op, d.compareTo(v))
              case None => false // unparseable date => no match
            })
      }
  }

  /** All filters must pass; empty filter list => match
    * (evtstrd/listener.py:62). The caller handles null payloads
    * (unparseable JSON => null variant => no match via null
    * propagation).
    */
  def matches(
      v: VariantVal,
      filters: org.apache.spark.sql.catalyst.util.ArrayData): Boolean = {
    val root = new Variant(v.getValue, v.getMetadata)
    val n = filters.numElements()
    var i = 0
    while (i < n) {
      if (!filters.isNullAt(i)) {
        val ok = parsed(filters.getUTF8String(i).toString) match {
          case Some(f) => evalFilter(f, root)
          case None => false // malformed filter-as-data matches nothing
        }
        if (!ok) return false
      }
      i += 1
    }
    true
  }
}
