package graft.queries

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, Window}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guardrails: the scale properties the suite claims are
  * asserted against the actual optimized plans, so a refactor that
  * quietly re-introduces a scale-killer (the round-2 `ntile_buckets`
  * global window) fails CI instead of surviving until a cluster run.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** An unpartitioned window funnels its whole input through ONE
    * partition. Since round 3 the suite plans none AT ALL — even over
    * KB-scale aggregates (chi_square's grand total moved to a
    * broadcast 1-row aggregate), so bench/test logs stay free of the
    * `WindowExec: No Partition Defined` warning and a refactor can
    * never smuggle a scale-killer back in behind a "small input"
    * argument that stops holding.
    */
  test("no query plans an unpartitioned window, over ANY input") {
    val offenders = for {
      (name, fn) <- SparkEntry.queries.toSeq
      w <- fn(spark, dir).queryExecution.optimizedPlan.collect {
        case w: Window if w.partitionSpec.isEmpty => w
      }
    } yield s"$name: ${w.windowExpressions.map(_.name).mkString(",")}"
    assert(offenders.isEmpty, s"global windows: $offenders")
  }

  /** The driver's comparator sorts result rows with pandas before
    * hashing; top-level ARRAY/MAP cells are unhashable there and kill
    * the comparison before values are even looked at (round-7
    * image_features/map_surface lesson — SURVEY §5.2). Arrays stay
    * legal INSIDE the engine; at the registered-query boundary they
    * must be stringified or exploded. Schema-only: no query executes.
    */
  test("no registered query emits a top-level ARRAY/MAP column") {
    import org.apache.spark.sql.types.{ArrayType, MapType}
    val offenders = for {
      (name, fn) <- SparkEntry.queries.toSeq
      f <- fn(spark, dir).schema.fields
      if f.dataType.isInstanceOf[ArrayType] || f.dataType.isInstanceOf[MapType]
    } yield s"$name.${f.name}: ${f.dataType.simpleString}"
    assert(offenders.isEmpty, s"array/map output columns: $offenders")
  }

  /** A CartesianProduct (shuffled all-pairs, BOTH sides big) is never
    * the plan a 100 TB operator should reach: every deliberate cross
    * join in the suite pairs a big side with a broadcast single-row
    * or panel-sized relation, which plans BroadcastNestedLoopJoin.
    * Pin that suite-wide so a refactor that loses a broadcast hint
    * (and silently re-plans the all-pairs shuffle) fails here.
    */
  test("no query plans a CartesianProduct, over ANY input") {
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val offenders = for {
      (name, fn) <- SparkEntry.queries.toSeq
      c <- physicalPlanNoAqe(fn(spark, dir)).collect {
        case c: CartesianProductExec => c
      }
    } yield name
    assert(offenders.isEmpty, s"cartesian products: $offenders")
  }

  test("bloom_prune_join filters the fact scan BELOW the join") {
    val plan = RuntimeFilters.bloomPruneJoin(spark, dir)
      .queryExecution.optimizedPlan
    val joins = plan.collect { case j: Join => j }
    assert(joins.nonEmpty)
    // the might_contain filter must live inside a join's subtree (scan
    // side), not above the join
    val inJoinSubtree = joins.exists(_.children.exists(_.collectFirst {
      case f: Filter if f.condition.exists(_.isInstanceOf[BloomFilterMightContain]) => f
    }.isDefined))
    val aboveJoin = plan.collectFirst {
      case f: Filter
        if f.condition.exists(_.isInstanceOf[BloomFilterMightContain]) &&
          f.collectFirst { case j: Join => j }.isDefined => f
    }.isDefined
    assert(inJoinSubtree, "might_contain filter not on the scan side")
    assert(!aboveJoin, "might_contain filter planned above the join")
  }

  test("pack_sequences: one shard shuffle feeds window and aggregate") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    val phys = physicalPlanNoAqe(TrainingPipeline.packSequences(spark, dir))
    val windows = phys.collect { case w: WindowExec => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty))
    val shuffles = phys.collect { case s: ShuffleExchangeExec => s }
    // shard hash shuffle + final orderBy range shuffle — the groupBy
    // must NOT add a third exchange (already co-partitioned on shard)
    assert(shuffles.size == 2, phys.toString.take(2000))
  }

  /** Build a physical plan with AQE off (so exchanges/windows appear
    * directly), restoring the shared session's prior setting after.
    */
  private def physicalPlanNoAqe(df: => org.apache.spark.sql.DataFrame) = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("group_topk plans WindowGroupLimit (map-side partial top-k)") {
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    val phys = physicalPlanNoAqe(Extended.groupTopk(spark, dir))
    val limits = phys.collect { case w: WindowGroupLimitExec => w }
    // partial (pre-shuffle) + final — without these the 5-partition
    // window would sort the whole fact table on 5 reducers
    assert(limits.size == 2, phys.toString.take(2000))
  }

  test("weighted_sample plans WindowGroupLimit (map-side partial top-k)") {
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    val phys = physicalPlanNoAqe(TrainingPipeline.weightedSample(spark, dir))
    val limits = phys.collect { case w: WindowGroupLimitExec => w }
    // partial (pre-shuffle) + final — the 20-value source key must
    // never see unfiltered rows on its reducers
    assert(limits.size == 2, phys.toString.take(2000))
  }

  test("kmv_distinct plans WindowGroupLimit (map-side partial k-minima)") {
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    val phys = physicalPlanNoAqe(Sketches.kmvDistinct(spark, dir))
    val limits = phys.collect { case w: WindowGroupLimitExec => w }
    // partial (pre-shuffle) + final — the sketch build must keep only
    // k minima per map task, never sort all hashes on 5 reducers
    assert(limits.size >= 2, phys.toString.take(2000))
  }

  test("decayed_topk plans WindowGroupLimit (map-side partial top-k)") {
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    val phys = physicalPlanNoAqe(Analytics.decayedTopk(spark, dir))
    val limits = phys.collect { case w: WindowGroupLimitExec => w }
    assert(limits.size >= 2, phys.toString.take(2000))
  }

  test("doc_keywords plans WindowGroupLimit (map-side partial top-3)") {
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    val phys = physicalPlanNoAqe(TextAnalysis.docKeywords(spark, dir))
    val limits = phys.collect { case w: WindowGroupLimitExec => w }
    assert(limits.size >= 2, phys.toString.take(2000))
  }

  test("q18 top-100 plans TakeOrderedAndProject; qualifying keys broadcast") {
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val phys = physicalPlanNoAqe(Relational.q18LargeOrders(spark, dir))
    assert(
      phys.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      phys.toString.take(2000))
    // survivors + customer both ride as broadcast builds — the orders
    // probe never shuffles
    assert(
      phys.collect { case b: BroadcastHashJoinExec => b }.size >= 2,
      phys.toString.take(2000))
  }

  test("phrase_search postings filter to the two terms below the adjacency join") {
    val plan = TextAnalysis.phraseSearch(spark, dir)
      .queryExecution.optimizedPlan
    val joins = plan.collect { case j: Join => j }
    assert(joins.nonEmpty)
    // each join input carries the term filter — the token stream
    // never reaches the join unfiltered
    val filteredBelow = joins.head.children.forall(_.collectFirst {
      case f: Filter if f.condition.toString.contains("term") => f
    }.nonEmpty)
    assert(filteredBelow, plan.toString.take(2000))
  }

  test("ohlc_bars boundary join-backs broadcast the day grid") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val phys = physicalPlanNoAqe(Analytics.ohlcBars(spark, dir))
    // two boundary join-backs + the final grid joins — all broadcast,
    // the event stream itself never shuffles for a join
    assert(
      phys.collect { case b: BroadcastHashJoinExec => b }.size >= 2,
      phys.toString.take(2000))
  }

  test("countmin_freq and geo_radius_join probe broadcasts (no cartesian)") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    for (plan <- Seq(
        physicalPlanNoAqe(Sketches.countminFreq(spark, dir)),
        physicalPlanNoAqe(Geo.geoRadiusJoin(spark, dir)))) {
      // the 192-cell sketch / ×9-exploded grid side must broadcast —
      // the big side reads straight through
      assert(plan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
        plan.toString.take(2000))
      assert(!plan.toString.contains("CartesianProduct"),
        plan.toString.take(2000))
    }
  }

  test("dedup_incremental broadcasts the batch side; index never shuffles") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val phys = physicalPlanNoAqe(Dedup.dedupIncremental(spark, dir))
    // candidate generation must be a broadcast hash probe on the
    // index band scan — the 100 TB side reads straight through
    val bjs = phys.collect { case j: BroadcastHashJoinExec => j }
    assert(bjs.nonEmpty, phys.toString.take(2000))
    assert(bjs.exists(_.leftKeys.exists(_.references.exists(
      _.name == "bkey"))), "band-bucket join is not the broadcast one")
    // the only exchanges allowed: the verify joins + final sort —
    // none keyed by the band bucket (that would shuffle the index)
    val shuffles = phys.collect { case s: ShuffleExchangeExec => s }
    assert(!shuffles.exists(_.outputPartitioning.toString.contains("bkey")),
      "index bands shuffled by bucket key")
  }

  test("gap_fill plans no cartesian/nested-loop; all windows partitioned") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val phys = physicalPlanNoAqe(Extended.gapFill(spark, dir))
    assert(phys.collect { case c: CartesianProductExec => c }.isEmpty)
    assert(phys.collect { case c: BroadcastNestedLoopJoinExec => c }.isEmpty,
      "per-key spine must join co-partitioned, not nested-loop")
  }

  test("dedup_embedding_lsh joins on band buckets, never on label blocks") {
    val plan = Similarity.dedupEmbeddingLsh(spark, dir)
      .queryExecution.optimizedPlan
    val joins = plan.collect { case j: Join => j }
    assert(joins.nonEmpty)
    val joinKeys = joins.flatMap(_.condition.toSeq.flatMap(_.references))
      .map(_.name).toSet
    assert(joinKeys.contains("bkey"), s"bucket key missing from joins: $joinKeys")
    assert(!joinKeys.contains("label"),
      "LSH variant must not fall back to label blocking")
  }

  test("cdc_apply is a pure max-struct aggregate — no window over the log") {
    val plan = Incremental.cdcApply(spark, dir).queryExecution.optimizedPlan
    assert(plan.collect { case w: Window => w }.isEmpty,
      "last-write-wins must not sort/window the change log")
    assert(plan.collect { case a: Aggregate => a }.nonEmpty)
  }

  test("skew_report's cumulative join broadcasts the tiny histogram") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val phys = physicalPlanNoAqe(Statistics.skewReport(spark, dir))
    // the inequality cumulative is a broadcast nested-loop over the
    // KB-scale size histogram — never a cartesian of unbroadcast sides
    assert(phys.collect { case c: CartesianProductExec => c }.isEmpty)
    assert(phys.collect { case j: BroadcastNestedLoopJoinExec => j }.nonEmpty)
  }

  test("q21_waiting chains residual semi+anti equi-joins on orderkey") {
    val plan = Relational.q21Waiting(spark, dir).queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
    val semi = plan.collect { case j: Join if j.joinType == LeftSemi => j }
    val anti = plan.collect { case j: Join if j.joinType == LeftAnti => j }
    assert(semi.size == 1 && anti.size == 1)
    // both legs must keep the orderkey equality (equi probe, never a
    // nested-loop over the inequality alone) AND carry the suppkey
    // inequality as the residual
    (semi ++ anti).foreach { j =>
      val c = j.condition.get.toString
      assert(c.contains("l_orderkey"), s"no equi key: $c")
      assert(c.contains("NOT") && c.contains("l_suppkey"), s"no residual: $c")
    }
  }

  test("q17_small_qty broadcasts the part-grain stats back on the probe") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val phys = physicalPlanNoAqe(Relational.q17SmallQty(spark, dir))
    // the decorrelated avg-per-part relation joins back as a broadcast
    // hash join whose residual is the cross-multiplied below-average
    // compare — the probe side never shuffles for it
    val withResidual = phys.collect {
      case j: BroadcastHashJoinExec
        if j.condition.exists(_.toString.contains("* 5")) => j
    }
    assert(withResidual.nonEmpty, "stats join-back not broadcast+residual")
  }

  test("q19_disjunctive pushes per-table OR weakenings to both scans") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val phys = physicalPlanNoAqe(Relational.q19Disjunctive(spark, dir))
    val pushed = phys.collect { case s: FileSourceScanExec =>
      s.metadata.getOrElse("Location", "") ->
        s.metadata.getOrElse("PushedFilters", "")
    }.toMap
    val li = pushed.collectFirst { case (k, v) if k.contains("lineitem") => v }
    val pt = pushed.collectFirst { case (k, v) if k.contains("part.") => v }
    // WHAT PUSHES (pinned): the optimizer CNF-extracts each table's
    // weakening of the cross-table OR-of-ANDs — the quantity-band
    // union reaches the lineitem scan, the brand×size disjunction the
    // part scan — so parquet row-group min/max pruning works on both
    // sides. WHAT DOESN'T: the cross-table disjunction itself, which
    // evaluates post-scan as the join filter (it references both
    // sides, so no scan can host it).
    assert(li.exists(f => f.contains("Or(") && f.contains("l_quantity")),
      s"lineitem scan lost the quantity-band union: $li")
    assert(pt.exists(f => f.contains("Or(") && f.contains("p_brand")),
      s"part scan lost the brand/size disjunction: $pt")
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val joinResidual = phys.collect {
      case j: BroadcastHashJoinExec => j.condition.map(_.toString)
    }.flatten
    assert(joinResidual.exists(c => c.contains("p_brand")
      && c.contains("l_quantity")),
      s"full cross-table disjunction not at the join: $joinResidual")
  }

  test("existence_join plans Spark's ExistenceJoin variant (IN-or-predicate)") {
    import org.apache.spark.sql.catalyst.plans.ExistenceJoin
    val plan = SqlSurface.existenceJoin(spark, dir)
      .queryExecution.optimizedPlan
    val existence = plan.collect {
      case j: Join if j.joinType.isInstanceOf[ExistenceJoin] => j
    }
    // the OR branch forbids a semi-join rewrite: the IN must join in
    // as a boolean flag, not filter rows — if this ever plans as
    // LeftSemi the other branch's rows are being dropped
    assert(existence.nonEmpty, s"no ExistenceJoin in:\n$plan")
    val semis = plan.collect {
      case j: Join if j.joinType.toString == "LeftSemi" => j
    }
    assert(semis.isEmpty, "IN-or-predicate must not rewrite to semi join")
  }

  test("q6_forecast is a pure pruned scan: filters pushed, 4 of 11 columns") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val phys = physicalPlanNoAqe(Relational.q6Forecast(spark, dir))
    val scans = phys.collect { case s: FileSourceScanExec => s }
    assert(scans.size == 1, s"q6 must be a single scan, got ${scans.size}")
    val pushed = scans.head.metadata.getOrElse("PushedFilters", "")
    // the date window and quantity cap push; the discount-band
    // predicate is a function of the column (round(d*100)) so it
    // CANNOT push — it evaluates post-scan, which is the documented
    // trade for an exact integer band compare
    assert(pushed.contains("l_shipdate") && pushed.contains("l_quantity"),
      s"q6 scan lost its pushed filters: $pushed")
    val readSchema = scans.head.metadata.getOrElse("ReadSchema", "")
    val cols = Seq(
      "l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
    assert(cols.forall(readSchema.contains), s"q6 ReadSchema: $readSchema")
    assert(!readSchema.contains("l_orderkey") &&
      !readSchema.contains("l_returnflag"),
      s"q6 reads columns it never uses: $readSchema")
  }

  test("scd2_history second window runs over compacted islands") {
    val plan = Analytics.scd2History(spark, dir).queryExecution.optimizedPlan
    // all windows partition on user_id (Spark plans lag flags, the
    // running island sum, and the lead close as separate Window nodes
    // — one per frame spec), and an Aggregate (the island compaction)
    // sits below the outer lead window
    val windows = plan.collect { case w: Window => w }
    assert(windows.size == 3, windows.map(_.windowExpressions.map(_.name)))
    assert(windows.forall(_.partitionSpec.nonEmpty))
    val outer = windows.head
    assert(outer.collectFirst { case a: Aggregate => a }.isDefined,
      "lead window must consume the compacted island aggregate")
  }
}
