package graft.filters

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Row-at-a-time reference evaluator for the filter language — a direct
  * transliteration of evtstrd/filters.py's closure semantics, used as
  * (a) the model oracle for the ScalaCheck property suite and (b) the
  * runtime evaluator for the *dynamic* fan-out path where filter strings
  * arrive as data (broadcast-join residual predicate), mirroring the
  * reference's per-listener compiled closures (evtstrd/listener.py:62).
  *
  * Jackson is used for JSON parsing (provided by the Spark classpath).
  * Thread-safe and serializable; parsed filters are memoized per JVM so
  * executor-side evaluation parses each distinct filter string once
  * (the reference parses once per subscription, evtstrd/filters.py:85).
  */
object FilterEval extends Serializable {
  @transient private lazy val mapper = new ObjectMapper()
  // Bounded: filter strings arrive as DATA on the dynamic path, so an
  // unbounded memo over churning per-user filters is a slow executor
  // leak. Clearing on overflow keeps correctness (pure function) and
  // re-parses only after 8k distinct live strings.
  private[filters] val MaxCachedFilters = 8192
  @transient private lazy val filterCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[EventFilter]]()

  /** None for a malformed filter string: on the subscribe path the
    * server already 400s it, but on the subscriptions-as-data path a
    * bad row must become "matches nothing" — a throw here would kill
    * the streaming query for every subscriber.
    */
  private[filters] def parsed(s: String): Option[EventFilter] = {
    val cached = filterCache.get(s)
    if (cached != null) cached
    else {
      val f =
        try Some(FilterParser.parse(s))
        catch { case _: FilterSyntaxException => None }
      if (filterCache.size >= MaxCachedFilters) filterCache.clear()
      filterCache.putIfAbsent(s, f)
      f
    }
  }

  /** Python code-point string comparison (== UTF-8 byte order).
    * Shared with [[VariantFilterEval]] — the comparison convention
    * must never diverge between the evaluators.
    */
  private[filters] def cmpCodePoints(a: String, b: String): Int = {
    val ai = a.codePoints().iterator()
    val bi = b.codePoints().iterator()
    while (ai.hasNext && bi.hasNext) {
      val c = Integer.compare(ai.nextInt(), bi.nextInt())
      if (c != 0) return c
    }
    java.lang.Boolean.compare(ai.hasNext, bi.hasNext)
  }

  private[filters] def applyOp(op: CmpOp, c: Int): Boolean = op match {
    case CmpOp.Eq => c == 0
    case CmpOp.Gt => c > 0
    case CmpOp.Ge => c >= 0
    case CmpOp.Lt => c < 0
    case CmpOp.Le => c <= 0
  }

  /** jsonget-style path descent: each segment must land on an object
    * field; missing => no match (evtstrd/filters.py:22-27).
    */
  private def descend(root: JsonNode, path: Seq[String]): Option[JsonNode] =
    path.foldLeft(Option(root)) {
      case (Some(n), seg) if n.isObject && n.has(seg) => Some(n.get(seg))
      case _ => None
    }

  def evalFilter(f: EventFilter, message: JsonNode): Boolean =
    descend(message, f.path) match {
      case None => false
      case Some(node) =>
        f.value match {
          case FilterValue.IntVal(v) =>
            // Python type check: json int only (not float, not bool,
            // not numeric string) — evtstrd/filters.py:47-53. Payload
            // domain is int64 (wider integers are rejected everywhere,
            // keeping all four evaluation paths consistent).
            node.isIntegralNumber && !node.isBoolean &&
              node.canConvertToLong &&
              applyOp(f.op, java.lang.Long.compare(node.longValue(), v))
          case FilterValue.BigIntVal(b) =>
            node.isIntegralNumber && !node.isBoolean &&
              node.canConvertToLong &&
              FilterCompiler.hugeLiteralMatches(f.op, b > 0)
          case FilterValue.Str(v) =>
            node.isTextual &&
              applyOp(f.op, cmpCodePoints(node.textValue(), v))
          case FilterValue.DateVal(v) =>
            node.isTextual && (IsoDate.parse(node.textValue()) match {
              case Some(d) => applyOp(f.op, d.compareTo(v))
              case None => false // unparseable date => no match
            })
        }
    }

  /** All filters must pass; empty filter list => match even for an
    * unparseable payload (all([]) is True before the payload is ever
    * inspected, evtstrd/listener.py:62); non-empty filters over bad
    * JSON => no match; a malformed filter string matches nothing.
    */
  def matches(json: String, filters: Seq[String]): Boolean = {
    if (filters.isEmpty) return true
    val root =
      try mapper.readTree(json)
      catch { case _: Exception => null }
    if (root == null) false
    else filters.forall(s => parsed(s).exists(f => evalFilter(f, root)))
  }
}
