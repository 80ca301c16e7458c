package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Statistics}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.LongType

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
    toleranceUs: Option[Long] = None)
  extends BinaryNode {

  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    "as-of requires one or more key columns, the same number per side")
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
      toleranceUs: Option[Long] = None): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"as-of sides must have disjoint column names, both have: $overlap")
    val spark = left.sparkSession
    register(spark)
    // fresh exprIds for the right side: Alias always mints a new id, so
    // a self-join (left and right both reading the same relation) never
    // produces an output with duplicate attribute ids
    val rAliased = right.select(right.columns.map(c => col(c).as(c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rAliased.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.filter(_.name == name) match {
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
      spark, AsOfJoin(lPlan, rPlan, lks, rks, lt, rt, strict, toleranceUs))
  }

  /** Idempotently add the planner strategy to a session. */
  def register(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
  }
}

/** Plans the logical [[AsOfJoin]] into [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lks, rks, lt, rt, strict, tol) =>
      AsOfJoinExec(
        lks, rks, lt, rt, strict, tol, planLater(l), planLater(r)) :: Nil
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
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    strict: Boolean,
    toleranceUs: Option[Long],
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
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
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
          // never match and are skipped the same way), then consume
          // this key's rows up to time t (strictly before t in strict
          // mode); later rows stay for the next left row (left times
          // ascend within the key)
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
                if (if (isStrict) rTime < t else rTime <= t) {
                  best = rHead.copy(); bestKey = lKey.copy(); bestTime = rTime
                  advance()
                } else scanning = false
              }
            } else scanning = false
          }
          // tolerance check at emit equals pre-filtering candidates by
          // gap: `best` holds the MAXIMAL eligible right time, so if
          // even it is too old every other eligible row is older. It
          // stays buffered — a later left row only voids it again,
          // never wrongly matches it. Eligibility means bestTime <= t,
          // so the true gap is non-negative; a negative difference is
          // Long overflow (gap > Long.MaxValue) and must void — but
          // only when a tolerance is set (without one, any gap keeps).
          val gap = t - bestTime
          val matched = best != null &&
            (!hasTol || (gap >= 0 && gap <= tol))
          proj(joined(l, if (matched) best else nullRight))
        }
      }
    }
  }
}
