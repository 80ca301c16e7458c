package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Statistics}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.LongType

/** Match direction of the as-of operator — the pandas `merge_asof
  * direction` triple:
  *   - [[AsOfDirection.Backward]]: greatest right time <= left time
  *     (`<` when strict) — the default, DuckDB `l.t >= r.t`.
  *   - [[AsOfDirection.Forward]]: smallest right time >= left time
  *     (`>` when strict) — DuckDB `l.t <= r.t`.
  *   - [[AsOfDirection.Nearest]]: whichever of the backward/forward
  *     candidates has the smaller absolute gap, backward winning ties;
  *     with a tolerance each candidate is filtered by it BEFORE the
  *     pick. Strict mode is not defined for nearest.
  */
sealed trait AsOfDirection
object AsOfDirection {
  case object Backward extends AsOfDirection
  case object Forward extends AsOfDirection
  case object Nearest extends AsOfDirection
}

/** Whole-operator as-of join as a first-class Catalyst operator — the
  * (c) tier of the custom-operator ladder: LogicalPlan + SparkStrategy
  * + SparkPlan, registered per session via `experimental.extraStrategies`
  * or globally via [[graft.GraftExtensions]].
  *
  * Semantics: BACKWARD, INCLUSIVE by default — for every left row, the
  * single right row with the same key tuple and the greatest time <=
  * the left time (ties on equal right time resolved by right sort
  * order), left-outer (no match => right columns null). Exactly
  * DuckDB's `ASOF LEFT JOIN ... ON l.k1 = r.k1 [AND ...] AND l.t >= r.t`.
  * `strict` switches the comparison to `<`; `toleranceUs` voids
  * matches older than the gap (pandas merge_asof's mode pair).
  * `direction` generalizes to forward (smallest time at-or-after) and
  * nearest (smaller absolute gap of the two, backward on ties) — see
  * [[AsOfDirection]].
  *
  * Physical shape — the one you'd want at 100 TB:
  *   - `requiredChildDistribution` clusters both sides on the keys:
  *     ONE hash shuffle per side (AQE-coalescible), identical to a
  *     sort-merge join's exchange placement.
  *   - `requiredChildOrdering` sorts each partition by (keys..., time):
  *     in-partition sort, never a global one.
  *   - `doExecute` merges the two sorted streams with a forward-only
  *     cursor: O(|L|+|R|) per partition, ZERO row expansion — unlike
  *     the banded-equi-join rewrite (k-fold row explosion) or the
  *     union+window idiom (whole-stream window state). The alternative
  *     shapes live in `Advanced.asofJoin` / `rangeJoin` for comparison.
  *
  * Why a custom node: Spark has no as-of relation operator (Column.over
  * forms need a union; joins need banding), so this is genuinely
  * "semantics the built-in operators can't express" — compose-first was
  * tried (those two queries) and the merge shape is strictly narrower.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    strict: Boolean = false,
    toleranceUs: Option[Long] = None,
    direction: AsOfDirection = AsOfDirection.Backward)
  extends BinaryNode {

  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    "as-of requires one or more key columns, the same number per side")
  require(direction != AsOfDirection.Nearest || !strict,
    "nearest as-of does not define a strict mode (exclude exact matches " +
      "by filtering instead)")
  // enforced HERE, not only in the DataFrame helper: the node is
  // public (ExtensionsSpec constructs it directly) and the exec's key
  // ordering is built from the LEFT types — a mismatched right key
  // would silently misread its UnsafeRow instead of failing fast
  leftKeys.zip(rightKeys).foreach { case (a, b) =>
    require(RowOrdering.isOrderable(a.dataType),
      s"as-of key must be an orderable type, got ${a.dataType}")
    require(a.dataType == b.dataType,
      s"as-of key types must match per position: ${a.dataType} vs ${b.dataType}")
  }
  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    "as-of time columns must be BIGINT (unix micros)")
  require(toleranceUs.forall(_ >= 0), "as-of tolerance must be >= 0")
  // NOTE: side-disjointness of exprIds is checked in
  // [[AsOfJoinStrategy]] at planning time, NOT here — plan
  // CANONICALIZATION (e.g. CacheManager lookups) legitimately rebuilds
  // this node with both children's ids independently normalized to
  // 0..n-1, so a constructor require would reject every canonicalized
  // copy. Planning always sees real analyzer-minted ids.

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def maxRows: Option[Long] = left.maxRows

  /** One output row per left row — without this override the default
    * binary-node visitor estimates |left|·|right| bytes, which makes
    * any downstream join against the as-of output look
    * broadcast-ineligible.
    */
  override def stats: Statistics = Statistics(
    sizeInBytes = left.stats.sizeInBytes + right.stats.sizeInBytes,
    rowCount = left.stats.rowCount)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {

  /** Single-key convenience form of [[backwardMulti]]. */
  def backward(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      strict: Boolean = false,
      toleranceUs: Option[Long] = None): DataFrame =
    backwardMulti(
      left, right, Seq(leftKey), leftTime, Seq(rightKey), rightTime,
      strict, toleranceUs)

  /** Backward as-of join of two DataFrames on one or more key columns
    * (any orderable atomic types, matching per position) and a Long
    * time column (timestamps pre-lowered to unix micros keeps the
    * operator's comparisons integer-exact). Column names of the two
    * sides must be disjoint; the right side is re-aliased internally so
    * self-joins (both sides derived from one relation) get fresh
    * attribute ids.
    *
    * `strict = true` matches right times strictly BEFORE the left time
    * (`<` instead of `<=`); `toleranceUs = Some(d)` voids a match whose
    * gap exceeds d micros (the matched row is still the latest-eligible
    * one, so voiding it equals filtering candidates by the gap first) —
    * the pandas `merge_asof(allow_exact_matches, tolerance)` pair,
    * DuckDB's `>` comparator + a gap CASE.
    */
  def backwardMulti(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], leftTime: String,
      rightKeys: Seq[String], rightTime: String,
      strict: Boolean = false,
      toleranceUs: Option[Long] = None): DataFrame =
    joinMulti(
      left, right, leftKeys, leftTime, rightKeys, rightTime,
      strict, toleranceUs, AsOfDirection.Backward)

  /** Single-key convenience form of [[forwardMulti]]. */
  def forward(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      strict: Boolean = false,
      toleranceUs: Option[Long] = None): DataFrame =
    forwardMulti(
      left, right, Seq(leftKey), leftTime, Seq(rightKey), rightTime,
      strict, toleranceUs)

  /** FORWARD as-of: for every left row, the right row with the same
    * key tuple and the SMALLEST time >= the left time (`>` when
    * strict; ties on equal right time resolved by right sort order —
    * the FIRST such row). The symmetric merge of [[backwardMulti]];
    * `toleranceUs` voids matches further ahead than the gap.
    */
  def forwardMulti(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], leftTime: String,
      rightKeys: Seq[String], rightTime: String,
      strict: Boolean = false,
      toleranceUs: Option[Long] = None): DataFrame =
    joinMulti(
      left, right, leftKeys, leftTime, rightKeys, rightTime,
      strict, toleranceUs, AsOfDirection.Forward)

  /** Single-key convenience form of [[nearestMulti]]. */
  def nearest(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      toleranceUs: Option[Long] = None): DataFrame =
    nearestMulti(
      left, right, Seq(leftKey), leftTime, Seq(rightKey), rightTime,
      toleranceUs)

  /** NEAREST as-of: of the backward candidate (greatest time <= left)
    * and the forward candidate (smallest time >= left), the one with
    * the smaller absolute gap — backward wins ties. A tolerance
    * filters EACH candidate before the pick (pandas
    * `merge_asof(direction='nearest', tolerance=...)`). No strict
    * mode.
    */
  def nearestMulti(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], leftTime: String,
      rightKeys: Seq[String], rightTime: String,
      toleranceUs: Option[Long] = None): DataFrame =
    joinMulti(
      left, right, leftKeys, leftTime, rightKeys, rightTime,
      strict = false, toleranceUs, AsOfDirection.Nearest)

  private def joinMulti(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], leftTime: String,
      rightKeys: Seq[String], rightTime: String,
      strict: Boolean,
      toleranceUs: Option[Long],
      direction: AsOfDirection): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"as-of sides must have disjoint column names, both have: $overlap")
    val spark = left.sparkSession
    register(spark)
    // fresh exprIds for the right side: Alias always mints a new id, so
    // a self-join (left and right both reading the same relation) never
    // produces an output with duplicate attribute ids. The marker
    // metadata makes each alias non-redundant: RemoveRedundantAliases
    // strips same-name aliases under custom nodes (only Join gets the
    // rule's exclude-list protection), which would re-collide the ids
    // mid-optimization and fail the strategy's disjointness check.
    val marker = new org.apache.spark.sql.types.MetadataBuilder()
      .putBoolean("graft.asof.realias", value = true).build()
    val rAliased = right.select(right.columns.map(c => col(c).as(c, marker)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rAliased.queryExecution.analyzed
    // the session's resolver, not ==: under default case-insensitive
    // analysis a name that resolves via df.col must resolve here too
    val resolver = spark.sessionState.analyzer.resolver
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.filter(a => resolver(a.name, name)) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"no column '$name' in [${plan.output.map(_.name).mkString(", ")}]")
        case _ => throw new IllegalArgumentException(
          s"ambiguous column '$name': a side carries it more than once")
      }
    val lks = leftKeys.map(attr(lPlan, _))
    val rks = rightKeys.map(attr(rPlan, _))
    val (lt, rt) = (attr(lPlan, leftTime), attr(rPlan, rightTime))
    lks.zip(rks).foreach { case (a, b) =>
      require(RowOrdering.isOrderable(a.dataType),
        s"as-of key ${a.name} must be an orderable type, is ${a.dataType}")
      require(a.dataType == b.dataType,
        s"as-of key types differ: ${a.name} ${a.dataType} vs ${b.name} ${b.dataType}")
    }
    Seq(lt, rt).foreach { a =>
      require(a.dataType == LongType,
        s"as-of time columns must be BIGINT (unix micros), ${a.name} is ${a.dataType}")
    }
    PlanBridge.ofRows(
      spark,
      AsOfJoin(lPlan, rPlan, lks, rks, lt, rt, strict, toleranceUs, direction))
  }

  /** Idempotently add the planner strategy to a session. Synchronized:
    * extraStrategies is a plain var, and two concurrent `backward`
    * calls would otherwise race the read-modify-write. The check goes
    * through `planner.strategies`, which already includes
    * extension-injected strategies — a session built with
    * [[graft.GraftExtensions]] is left untouched instead of gaining a
    * redundant second copy.
    */
  def register(spark: SparkSession): Unit = registerLock.synchronized {
    if (!spark.sessionState.planner.strategies.contains(AsOfJoinStrategy)) {
      val exp = spark.experimental
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
    }
  }

  private val registerLock = new Object
}

/** Plans the logical [[AsOfJoin]]: a small right side (within
  * `spark.sql.autoBroadcastJoinThreshold`, the same knob that governs
  * broadcast joins) becomes [[BroadcastAsOfJoinExec]] — the common
  * "huge trades vs small prices" shape where shuffling and sorting
  * 100 TB of left rows just to meet a KB-scale right side is the
  * whole cost of the query. Everything else takes the shuffled
  * sorted-merge [[AsOfJoinExec]].
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lks, rks, lt, rt, strict, tol, dir) =>
      // a true self-join constructed directly from one relation
      // (skipping backwardMulti's re-alias) carries duplicate
      // attribute ids across sides; downstream resolution against the
      // node's output would be ambiguous — fail fast at planning
      // (the constructor can't check: canonicalized copies share ids
      // legitimately)
      require(l.outputSet.intersect(r.outputSet).isEmpty,
        "as-of sides share attribute ids (exprId) — re-alias one side " +
          "(select(col(c).as(c)) mints fresh ids) before constructing " +
          "the node")
      val threshold =
        org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      val size = r.stats.sizeInBytes
      if (threshold > 0 && size >= 0 && size <= threshold)
        BroadcastAsOfJoinExec(
          lks, rks, lt, rt, strict, tol, dir, planLater(l), planLater(r)) :: Nil
      else
        AsOfJoinExec(
          lks, rks, lt, rt, strict, tol, dir, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sorted-merge backward as-of join. Children are hash-clustered on
  * the keys and sorted by (keys..., time) — EnsureRequirements inserts
  * the exchanges/sorts, AQE coalesces them like any shuffled join — and
  * each partition pair merges with a forward-only right cursor holding
  * at most ONE buffered row (`best`): constant memory, no spill path
  * needed beyond the children's own sorts.
  *
  * Key tuples compare through the natural ascending interpreted
  * ordering over the key types (nulls first — identical to the
  * children's required sort), so the cursor advance agrees exactly
  * with the sort that feeds it. Null semantics match SQL comparisons:
  * a null in ANY key column or in the time, on either side, never
  * matches.
  */
/** Broadcast backward as-of join: the LEFT side is read in place —
  * no exchange, no sort, whatever partitioning and order it arrives
  * with — and the broadcast right side is indexed once per task into
  * a (key, time)-sorted array. Each left row then binary-searches for
  * the greatest right time <= (or < in strict mode) its own time
  * within its key group: O(|L| log |R|) with |R| bounded by the
  * broadcast threshold. Matching semantics are identical to
  * [[AsOfJoinExec]] — same null rules, same tolerance-at-emit, same
  * last-of-equal-times tie resolution (the sort is stable, so equal
  * (key, time) rows keep broadcast order and the upper-bound search
  * lands past the last of them).
  */
case class BroadcastAsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    strict: Boolean,
    toleranceUs: Option[Long],
    direction: AsOfDirection,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution ::
      BroadcastDistribution(IdentityBroadcastMode) :: Nil

  // left rows pass through untouched, in place and in order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" ->
      SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val broadcastRel = right.executeBroadcast[Array[InternalRow]]()
    val lKeyExprs = leftKeys.map(BindReferences.bindReference(_, left.output))
    val rKeyExprs = rightKeys.map(BindReferences.bindReference(_, right.output))
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val keyTypes = leftKeys.map(_.dataType)
    val rightWidth = right.output.length
    val outAttrs = output
    val isStrict = strict
    val hasTol = toleranceUs.isDefined
    val tol = toleranceUs.getOrElse(Long.MaxValue)
    // 0 = backward, 1 = forward, 2 = nearest (plain int for the hot loop)
    val mode = direction match {
      case AsOfDirection.Backward => 0
      case AsOfDirection.Forward => 1
      case AsOfDirection.Nearest => 2
    }
    left.execute().mapPartitions { lIter =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      // POSITIONAL output binding: JoinedRow lays values out in output
      // order, and binding by position (not exprId lookup) stays
      // correct even if an optimizer rewrite ever left equal ids on
      // both sides
      val proj = UnsafeProjection.create(
        outAttrs.zipWithIndex.map { case (a, i) =>
          BoundReference(i, a.dataType, a.nullable)
        })
      val lKeyProj = UnsafeProjection.create(lKeyExprs)
      val rKeyProj = UnsafeProjection.create(rKeyExprs)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      // Per-task index build over the shared broadcast rows (never
      // mutated in place — tasks share the array): drop rows that can
      // never match (null in any key column or null time), then a
      // STABLE sort by (key tuple, time). O(|R| log |R|) per task is
      // the price of zero work on the 100 TB side.
      val all = broadcastRel.value
      val kBuf = Array.newBuilder[InternalRow]
      val tBuf = Array.newBuilder[Long]
      val rBuf = Array.newBuilder[InternalRow]
      var i = 0
      while (i < all.length) {
        val r = all(i)
        val k = rKeyProj(r)
        if (!k.anyNull) {
          val tv = rt.eval(r)
          if (tv != null) {
            kBuf += k.copy(); tBuf += tv.asInstanceOf[Long]; rBuf += r
          }
        }
        i += 1
      }
      val keys0 = kBuf.result(); val times0 = tBuf.result()
      val rows0 = rBuf.result()
      val n = keys0.length
      val order = Array.tabulate[Integer](n)(Integer.valueOf)
      java.util.Arrays.sort(order, (a: Integer, b: Integer) => {
        val c = keyOrd.compare(keys0(a), keys0(b))
        if (c != 0) c else java.lang.Long.compare(times0(a), times0(b))
      })
      val keys = Array.tabulate(n)(j => keys0(order(j)))
      val times = Array.tabulate(n)(j => times0(order(j)))
      val rows = Array.tabulate(n)(j => rows0(order(j)))
      lIter.map { l =>
        numOutputRows += 1
        val lKey = lKeyProj(l)
        val lTimeV = if (lKey.anyNull) null else lt.eval(l)
        if (lKey.anyNull || lTimeV == null) proj(joined(l, nullRight))
        else {
          val t = lTimeV.asInstanceOf[Long]
          // ONE search serves both directions: rows at the cut's "below"
          // side rank c < 0, so idxB = lo - 1 is the LAST below-cut row
          // (the backward candidate) and idxF = lo the FIRST at-or-
          // above-cut row (the forward candidate). `backIncl` decides
          // which side equal times belong to: backward non-strict and
          // forward strict put them below (<= t); forward non-strict
          // puts them above so an exact match is found ahead. Nearest
          // uses below — an equal-time row is then the gap-0 backward
          // candidate, which wins the pick anyway (ties → backward).
          val backIncl = if (mode == 1) isStrict else mode == 2 || !isStrict
          var lo = 0; var hi = n
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            val c = {
              val ck = keyOrd.compare(keys(mid), lKey)
              if (ck != 0) ck
              else if (if (backIncl) times(mid) <= t else times(mid) < t) -1
              else 1
            }
            if (c < 0) lo = mid + 1 else hi = mid
          }
          val idxB = lo - 1
          val backOk = mode != 1 && idxB >= 0 &&
            keyOrd.compare(keys(idxB), lKey) == 0 && {
              // tolerance at emit, identical to the merge exec: the
              // found row has the MAXIMAL eligible time, so if even it
              // is too old every other candidate is older; a negative
              // gap is Long overflow (gap > Long.MaxValue) and voids
              val gap = t - times(idxB)
              !hasTol || (gap >= 0 && gap <= tol)
            }
          val idxF = lo
          val fwdOk = mode != 0 && idxF < n &&
            keyOrd.compare(keys(idxF), lKey) == 0 && {
              val gap = times(idxF) - t
              !hasTol || (gap >= 0 && gap <= tol)
            }
          val matched: InternalRow =
            if (mode == 0) { if (backOk) rows(idxB) else nullRight }
            else if (mode == 1) { if (fwdOk) rows(idxF) else nullRight }
            else {
              // nearest: smaller absolute gap wins, backward on ties;
              // an overflowed (negative) gap ranks as infinitely far
              def norm(g: Long) = if (g < 0) Long.MaxValue else g
              if (backOk && (!fwdOk ||
                  norm(t - times(idxB)) <= norm(times(idxF) - t)))
                rows(idxB)
              else if (fwdOk) rows(idxF)
              else nullRight
            }
          proj(joined(l, matched))
        }
      }
    }
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    strict: Boolean,
    toleranceUs: Option[Long],
    direction: AsOfDirection,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) ::
      ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // left rows pass through in order: downstream per-key sorts are free
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics = Map(
    "numOutputRows" ->
      SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lKeyExprs = leftKeys.map(BindReferences.bindReference(_, left.output))
    val rKeyExprs = rightKeys.map(BindReferences.bindReference(_, right.output))
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val keyTypes = leftKeys.map(_.dataType)
    val rightWidth = right.output.length
    val outAttrs = output
    // primitives copied OUTSIDE the closure: referencing the case-class
    // fields inside it would capture `this` and serialize the whole
    // plan subtree with every task
    val isStrict = strict
    val hasTol = toleranceUs.isDefined
    val tol = toleranceUs.getOrElse(Long.MaxValue)
    // 0 = backward, 1 = forward, 2 = nearest (plain int for the hot loop)
    val mode = direction match {
      case AsOfDirection.Backward => 0
      case AsOfDirection.Forward => 1
      case AsOfDirection.Nearest => 2
    }
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      // POSITIONAL output binding: JoinedRow lays values out in output
      // order, and binding by position (not exprId lookup) stays
      // correct even if an optimizer rewrite ever left equal ids on
      // both sides
      val proj = UnsafeProjection.create(
        outAttrs.zipWithIndex.map { case (a, i) =>
          BoundReference(i, a.dataType, a.nullable)
        })
      val lKeyProj = UnsafeProjection.create(lKeyExprs)
      val rKeyProj = UnsafeProjection.create(rKeyExprs)
      // the same nulls-first ascending ordering the children are
      // sorted with, so cursor advancement tracks the physical order
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      var rHead: InternalRow = null
      def advance(): Unit =
        rHead = if (rIter.hasNext) rIter.next() else null
      advance()
      // latest right row seen for key tuple `bestKey` (both copied:
      // sort iterators and projections reuse their row objects)
      var best: InternalRow = null
      var bestKey: InternalRow = null
      var bestTime = 0L
      lIter.map { l =>
        numOutputRows += 1
        val lKey = lKeyProj(l)
        val lTimeV = if (lKey.anyNull) null else lt.eval(l)
        if (lKey.anyNull || lTimeV == null) proj(joined(l, nullRight))
        else {
          val t = lTimeV.asInstanceOf[Long]
          if (best != null && keyOrd.compare(bestKey, lKey) != 0) best = null
          // ONE loop, ONE key projection per right-head visit: skip
          // tuples before this key (null-containing right keys can
          // never match and are skipped the same way), then pass this
          // key's rows up to the cut — backward/nearest BUFFER the last
          // passed row (`best`), forward just discards them (a later
          // left row has a later time, so they stay ineligible). Rows
          // at-or-past the cut stay for the next left row; in forward
          // mode the head IS the candidate and is NOT consumed (later
          // left rows may match the same row). The cut puts equal
          // times below for backward non-strict / forward strict /
          // nearest, above for the rest — mirroring the broadcast
          // exec's bound (nearest claims equal times as the gap-0
          // backward candidate, which wins the pick anyway).
          val consumeIncl =
            if (mode == 1) isStrict else mode == 2 || !isStrict
          var scanning = true
          while (scanning && rHead != null) {
            val rKey = rKeyProj(rHead)
            val cmp =
              if (rKey.anyNull) -1 else keyOrd.compare(rKey, lKey)
            if (cmp < 0) advance()
            else if (cmp == 0) {
              val rtV = rt.eval(rHead)
              if (rtV == null) advance() // null time never matches
              else {
                val rTime = rtV.asInstanceOf[Long]
                if (if (consumeIncl) rTime <= t else rTime < t) {
                  if (mode != 1) {
                    best = rHead.copy(); bestKey = lKey.copy(); bestTime = rTime
                  }
                  advance()
                } else scanning = false
              }
            } else scanning = false
          }
          // forward candidate: the unconsumed head, when it is this
          // key's first at-or-past-cut row (null keys/times can't
          // reach here unconsumed for an equal key — they advance)
          var fwdRow: InternalRow = null
          var fwdTime = 0L
          if (mode != 0 && rHead != null) {
            val rKey = rKeyProj(rHead)
            if (!rKey.anyNull && keyOrd.compare(rKey, lKey) == 0) {
              val rtV = rt.eval(rHead)
              if (rtV != null) {
                fwdRow = rHead; fwdTime = rtV.asInstanceOf[Long]
              }
            }
          }
          // tolerance check at emit equals pre-filtering candidates by
          // gap: `best` holds the MAXIMAL backward-eligible right time
          // (and the head the MINIMAL forward-eligible), so if even it
          // is too far every other candidate is farther. `best` stays
          // buffered — a later left row only voids it again, never
          // wrongly matches it. Eligible gaps are non-negative; a
          // negative difference is Long overflow (gap > Long.MaxValue)
          // and must void — but only when a tolerance is set (without
          // one, any gap keeps; for the nearest PICK an overflowed gap
          // ranks as infinitely far).
          val gapB = t - bestTime
          val backOk = mode != 1 && best != null &&
            (!hasTol || (gapB >= 0 && gapB <= tol))
          val gapF = fwdTime - t
          val fwdOk = mode != 0 && fwdRow != null &&
            (!hasTol || (gapF >= 0 && gapF <= tol))
          val out: InternalRow =
            if (mode == 0) { if (backOk) best else nullRight }
            else if (mode == 1) { if (fwdOk) fwdRow else nullRight }
            else {
              def norm(g: Long) = if (g < 0) Long.MaxValue else g
              if (backOk && (!fwdOk || norm(gapB) <= norm(gapF))) best
              else if (fwdOk) fwdRow
              else nullRight
            }
          proj(joined(l, out))
        }
      }
    }
  }
}
