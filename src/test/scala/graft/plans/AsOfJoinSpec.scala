package graft.plans

import graft.TestSpark
import graft.queries.NativePlans
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native as-of operator: semantics model-checked against a plain
  * declarative formulation, edge cases pinned, and the physical plan
  * asserted to be the narrow shape the operator exists for (one
  * exchange per side, a merge node, no row expansion).
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  import spark.implicits._

  /** Declarative reference: left join on key + time<=, then keep the
    * max (time, id) candidate per left row. Quadratic in hot keys —
    * that's WHY the operator exists — but a trustworthy oracle.
    */
  private def reference(left: DataFrame, right: DataFrame): DataFrame =
    left.join(
        right,
        col("k") === col("rk") && col("rt") <= col("t"),
        "left")
      .groupBy(col("id"), col("k"), col("t"))
      .agg(max(struct(col("rt"), col("rv"))).as("m"))
      .select(
        col("id"), col("k"), col("t"),
        col("m.rt").as("rt"), col("m.rv").as("rv"))

  private def asRows(df: DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])

  /** Run the assertions once per physical strategy: threshold -1
    * forces the shuffled sorted-merge exec, the default threshold lets
    * the (tiny) right sides here take the broadcast binary-search exec.
    * Both must agree on every semantic edge.
    */
  private def bothPaths(f: => Unit): Unit = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1"); f
      spark.conf.set(key, (10L * 1024 * 1024).toString); f
    } finally spark.conf.set(key, prev)
  }

  private val left = Seq(
    // (id, k, t)
    (1L, 10L, 100L), // before any right row for the key
    (2L, 10L, 200L), // exactly AT a right time: inclusive match
    (3L, 10L, 250L), // between right rows
    (4L, 10L, 900L), // after all right rows
    (5L, 20L, 500L), // key with no right rows at all
    (6L, 30L, 500L)  // key whose right rows are all later
  ).toDF("id", "k", "t")

  private val right = Seq(
    (10L, 200L, "a"),
    (10L, 240L, "b"),
    (10L, 300L, "c"),
    (30L, 600L, "z")
  ).toDF("rk", "rt", "rv")

  test("backward as-of matches the declarative reference on edges") {
    bothPaths {
      val got = AsOfJoin.backward(left, right, "k", "t", "rk", "rt")
        .select(col("id"), col("k"), col("t"), col("rt"), col("rv"))
      assert(asRows(got) === asRows(reference(left, right)))
      // and the specific edge expectations, spelled out
      val byId = got.collect().map(r => r.getLong(0) -> r.toSeq).toMap
      assert(byId(1L)(3) == null && byId(1L)(4) == null)
      assert(byId(2L)(3) == 200L && byId(2L)(4) == "a") // inclusive
      assert(byId(3L)(3) == 240L && byId(3L)(4) == "b")
      assert(byId(4L)(3) == 300L && byId(4L)(4) == "c")
      assert(byId(5L)(3) == null)
      assert(byId(6L)(3) == null)
    }
  }

  test("null keys and null times never match, on either side") {
    bothPaths {
      val l = Seq(
        (1L, Some(10L), Some(100L)),
        (2L, None, Some(100L)),     // null key
        (3L, Some(10L), None)       // null time
      ).toDF("id", "k", "t")
      val r = Seq(
        (Some(10L), Some(50L), "m"),
        (Some(10L), None, "nullt"), // null right time: skipped
        (None, Some(1L), "nullk")   // null right key: skipped
      ).toDF("rk", "rt", "rv")
      val got = AsOfJoin.backward(l, r, "k", "t", "rk", "rt")
        .select(col("id"), col("rv")).collect()
        .map(row => row.getLong(0) -> row.get(1)).toMap
      assert(got(1L) == "m")
      assert(got(2L) == null)
      assert(got(3L) == null)
    }
  }

  test("per-key state resets: a key break discards the buffered match") {
    bothPaths {
      val l = Seq((1L, 10L, 500L), (2L, 11L, 500L)).toDF("id", "k", "t")
      val r = Seq((10L, 100L, "for10")).toDF("rk", "rt", "rv")
      val got = AsOfJoin.backward(l, r, "k", "t", "rk", "rt")
        .select(col("id"), col("rv")).collect()
        .map(row => row.getLong(0) -> row.get(1)).toMap
      assert(got(1L) == "for10")
      assert(got(2L) == null) // key 11 must NOT inherit key 10's match
    }
  }

  test("plan: merge node present, one exchange per side, no expansion") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // force the shuffled path: this test pins the MERGE exec's shape
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val phys = AsOfJoin.backward(left, right, "k", "t", "rk", "rt")
        .queryExecution.executedPlan
      assert(phys.collect { case e: AsOfJoinExec => e }.size == 1)
      assert(phys.collect { case s: ShuffleExchangeExec => s }.size == 2)
      // no Generate/explode, no extra join: the whole plan is scans,
      // exchanges, sorts and the merge
      import org.apache.spark.sql.execution.GenerateExec
      import org.apache.spark.sql.execution.joins.BaseJoinExec
      assert(phys.collect { case g: GenerateExec => g }.isEmpty)
      assert(phys.collect { case j: BaseJoinExec => j }.isEmpty)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("plan: small right side broadcasts — ZERO exchange on the left") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      import org.apache.spark.sql.execution.SortExec
      import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
      val phys = AsOfJoin.backward(left, right, "k", "t", "rk", "rt")
        .queryExecution.executedPlan
      assert(phys.collect { case e: BroadcastAsOfJoinExec => e }.size == 1)
      // the 100 TB side is read IN PLACE: no shuffle, no sort anywhere
      assert(phys.collect { case s: ShuffleExchangeExec => s }.isEmpty)
      assert(phys.collect { case s: SortExec => s }.isEmpty)
      assert(phys.collect { case b: BroadcastExchangeExec => b }.size == 1)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("strict mode: equal times do not match; earlier ones still do") {
    bothPaths {
      val got = AsOfJoin.backward(left, right, "k", "t", "rk", "rt",
          strict = true)
        .select(col("id"), col("rt"), col("rv")).collect()
        .map(r => r.getLong(0) -> (r.get(1), r.get(2))).toMap
      assert(got(2L) == ((null, null))) // t=200 == rt=200: excluded now
      assert(got(3L) == ((240L, "b")))  // strictly-before still matches
      assert(got(4L) == ((300L, "c")))
    }
  }

  test("tolerance voids stale matches but keeps fresh ones") {
    bothPaths {
      val got = AsOfJoin.backward(left, right, "k", "t", "rk", "rt",
          toleranceUs = Some(50L))
        .select(col("id"), col("rt")).collect()
        .map(r => r.getLong(0) -> r.get(1)).toMap
      assert(got(2L) == 200L) // gap 0 <= 50
      assert(got(3L) == 240L) // gap 10 <= 50
      assert(got(4L) == null) // gap 600 > 50: voided
      // and a later left row of the same key is voided independently,
      // not corrupted by the earlier void
      val l2 = Seq((1L, 10L, 320L), (2L, 10L, 1000L)).toDF("id", "k", "t")
      val got2 = AsOfJoin.backward(l2, right, "k", "t", "rk", "rt",
          toleranceUs = Some(50L))
        .select(col("id"), col("rt")).collect()
        .map(r => r.getLong(0) -> r.get(1)).toMap
      assert(got2(1L) == 300L) // gap 20
      assert(got2(2L) == null) // same buffered match, now 700 stale
    }
  }

  test("tolerance gap overflow voids; no-tolerance keeps any gap") {
    // sentinel-scale times: true gap exceeds Long.MaxValue, so the
    // subtraction wraps negative — with a tolerance that must VOID
    // (review fix), without one it must still match
    bothPaths {
      val l = Seq((1L, 10L, Long.MaxValue - 10L)).toDF("id", "k", "t")
      val r = Seq((10L, Long.MinValue + 10L, "old")).toDF("rk", "rt", "rv")
      def run(tol: Option[Long]) =
        AsOfJoin.backward(l, r, "k", "t", "rk", "rt", toleranceUs = tol)
          .select(col("rv")).head().get(0)
      assert(run(Some(Long.MaxValue)) == null)
      assert(run(None) == "old")
    }
  }

  test("forward as-of: smallest time at-or-after, per-key, left-outer") {
    bothPaths {
      val got = AsOfJoin.forward(left, right, "k", "t", "rk", "rt")
        .select(col("id"), col("rt"), col("rv")).collect()
        .map(r => r.getLong(0) -> (r.get(1), r.get(2))).toMap
      assert(got(1L) == ((200L, "a"))) // next row ahead
      assert(got(2L) == ((200L, "a"))) // exactly AT: inclusive
      assert(got(3L) == ((300L, "c"))) // between rows: the later one
      assert(got(4L) == ((null, null))) // nothing ahead
      assert(got(5L) == ((null, null))) // key absent
      assert(got(6L) == ((600L, "z"))) // key whose rows are all later
    }
  }

  test("forward strict excludes equal times; forward tolerance voids far rows") {
    bothPaths {
      val strict = AsOfJoin.forward(left, right, "k", "t", "rk", "rt",
          strict = true)
        .select(col("id"), col("rt")).collect()
        .map(r => r.getLong(0) -> r.get(1)).toMap
      assert(strict(1L) == 200L)
      assert(strict(2L) == 240L) // t=200: the equal-time row is skipped
      val tol = AsOfJoin.forward(left, right, "k", "t", "rk", "rt",
          toleranceUs = Some(50L))
        .select(col("id"), col("rt")).collect()
        .map(r => r.getLong(0) -> r.get(1)).toMap
      assert(tol(1L) == null) // gap 100 > 50: voided
      assert(tol(2L) == 200L) // gap 0
      assert(tol(3L) == 300L) // gap 50 <= 50
      assert(tol(6L) == null) // gap 100: voided
    }
  }

  test("nearest as-of: smaller gap wins, backward takes ties") {
    bothPaths {
      val got = AsOfJoin.nearest(left, right, "k", "t", "rk", "rt")
        .select(col("id"), col("rt"), col("rv")).collect()
        .map(r => r.getLong(0) -> (r.get(1), r.get(2))).toMap
      assert(got(1L) == ((200L, "a"))) // only a forward candidate
      assert(got(2L) == ((200L, "a"))) // exact: gap-0 backward
      assert(got(3L) == ((240L, "b"))) // back gap 10 < fwd gap 50
      assert(got(4L) == ((300L, "c"))) // only a backward candidate
      assert(got(5L) == ((null, null)))
      assert(got(6L) == ((600L, "z"))) // only forward
      // exact tie: t=270 sits 30 from 240 and 30 from 300 — backward
      val tie = AsOfJoin.nearest(
          Seq((1L, 10L, 270L)).toDF("id", "k", "t"), right,
          "k", "t", "rk", "rt")
        .select(col("rt")).head().get(0)
      assert(tie == 240L)
      // tolerance filters each side before the pick
      val tol = AsOfJoin.nearest(left, right, "k", "t", "rk", "rt",
          toleranceUs = Some(40L))
        .select(col("id"), col("rt")).collect()
        .map(r => r.getLong(0) -> r.get(1)).toMap
      assert(tol(3L) == 240L) // gap 10 passes
      assert(tol(4L) == null) // gap 600: both sides out of tolerance
      assert(tol(1L) == null) // fwd gap 100 > 40
    }
  }

  test("nearest + strict is rejected at node construction") {
    val r = right.select(right.columns.map(c => col(c).as(c)): _*)
    def attr(df: DataFrame, n: String) =
      df.queryExecution.analyzed.output.find(_.name == n).get
    val e = intercept[IllegalArgumentException](
      AsOfJoin(
        left.queryExecution.analyzed, r.queryExecution.analyzed,
        Seq(attr(left, "k")), Seq(attr(r, "rk")),
        attr(left, "t"), attr(r, "rt"),
        strict = true, direction = AsOfDirection.Nearest))
    assert(e.getMessage.contains("nearest"))
  }

  test("property: forward and nearest match declarative references") {
    import org.scalacheck.{Gen, rng}
    def sample[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
      (0 until n).flatMap(i =>
        g.apply(Gen.Parameters.default, rng.Seed(seed + i)))
    // forward reference: min (rt, rv) among same-key rows with rt >= t
    def refForward(l: DataFrame, r: DataFrame): DataFrame =
      l.join(r, col("k") === col("rk") && col("rt") >= col("t"), "left")
        .groupBy(col("id"), col("k"), col("t"))
        .agg(min(struct(col("rt"), col("rv"))).as("m"))
        .select(col("id"), col("m.rt").as("rt"), col("m.rv").as("rv"))
    // nearest reference: min (|rt-t|, rt, rv) among ALL same-key rows —
    // the global gap-minimal row is one of the two directional
    // candidates, and (gap, rt) ordering gives backward the tie
    def refNearest(l: DataFrame, r: DataFrame): DataFrame =
      l.join(r, col("k") === col("rk"), "left")
        .groupBy(col("id"), col("k"), col("t"))
        .agg(min(struct(
          abs(col("rt") - col("t")), col("rt"), col("rv"))).as("m"))
        .select(col("id"), col("m.rt").as("rt"), col("m.rv").as("rv"))
    val keyGen = Gen.chooseNum(1L, 8L)
    val timeGen = Gen.chooseNum(-50L, 50L)
    for (seed <- 0 to 2) {
      val leftRows = sample(Gen.zip(keyGen, timeGen), 120, 4000L * seed)
        .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val rightRows = sample(Gen.zip(keyGen, timeGen), 80, 99L * seed)
        .distinct.zipWithIndex
        .map { case ((k, t), i) => (k, t, s"r$i") }
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val l = leftRows.toDF("id", "k", "t")
      val r = rightRows.toDF("rk", "rt", "rv")
      val expF = asRows(refForward(l, r))
      val expN = asRows(refNearest(l, r))
      for (parts <- Seq(1, 3)) {
        bothPaths {
          val gotF = AsOfJoin.forward(
              l.repartition(parts), r.repartition(parts), "k", "t", "rk", "rt")
            .select(col("id"), col("rt"), col("rv"))
          assert(asRows(gotF) === expF, s"forward seed=$seed parts=$parts")
          val gotN = AsOfJoin.nearest(
              l.repartition(parts), r.repartition(parts), "k", "t", "rk", "rt")
            .select(col("id"), col("rt"), col("rv"))
          assert(asRows(gotN) === expN, s"nearest seed=$seed parts=$parts")
        }
      }
    }
  }

  test("ambiguous column names on one side fail loudly") {
    val dup = left.join(right, col("k") === col("rk"))
      .select(col("id"), col("k"), col("t"), col("rt").as("t2"))
      .withColumnRenamed("t2", "t") // two columns literally named t
    val e = intercept[IllegalArgumentException](
      AsOfJoin.backward(dup, right.select(col("rk").as("k2"),
        col("rt").as("rt2"), col("rv").as("rv2")), "k", "t", "k2", "rt2"))
    assert(e.getMessage.contains("ambiguous"))
  }

  test("logical stats: linear in the inputs, never the product") {
    val node = {
      val r = right.select(right.columns.map(c => col(c).as(c)): _*)
      def attr(df: org.apache.spark.sql.DataFrame, n: String) =
        df.queryExecution.analyzed.output.find(_.name == n).get
      AsOfJoin(
        left.queryExecution.analyzed, r.queryExecution.analyzed,
        Seq(attr(left, "k")), Seq(attr(r, "rk")),
        attr(left, "t"), attr(r, "rt"))
    }
    val s = node.stats.sizeInBytes
    assert(s == node.left.stats.sizeInBytes + node.right.stats.sizeInBytes)
    assert(s < node.left.stats.sizeInBytes * node.right.stats.sizeInBytes)
  }

  test("composite keys: (long, string) tuples merge correctly") {
    val l = Seq(
      (1L, 10L, "a", 100L), // matches (10,a,50)
      (2L, 10L, "b", 100L), // same long key, other segment
      (3L, 10L, "a", 20L),  // before the (10,a) row
      (4L, 11L, "a", 100L)  // key break on the FIRST column
    ).toDF("id", "k1", "k2", "t")
    val r = Seq(
      (10L, "a", 50L, "ra"),
      (10L, "b", 60L, "rb"),
      (11L, "b", 10L, "rb11")
    ).toDF("rk1", "rk2", "rt", "rv")
    bothPaths {
      val got = AsOfJoin.backwardMulti(
          l, r, Seq("k1", "k2"), "t", Seq("rk1", "rk2"), "rt")
        .select(col("id"), col("rv")).collect()
        .map(row => row.getLong(0) -> row.get(1)).toMap
      assert(got == Map(1L -> "ra", 2L -> "rb", 3L -> null, 4L -> null))
      // null in EITHER key column never matches
      val ln = Seq((1L, Some(10L), Some("a"), 100L), (2L, Some(10L), None, 100L))
        .toDF("id", "k1", "k2", "t")
      val gotN = AsOfJoin.backwardMulti(
          ln, r, Seq("k1", "k2"), "t", Seq("rk1", "rk2"), "rt")
        .select(col("id"), col("rv")).collect()
        .map(row => row.getLong(0) -> row.get(1)).toMap
      assert(gotN == Map(1L -> "ra", 2L -> null))
    }
  }

  test("column names resolve case-insensitively like the session analyzer") {
    // df.col("K") resolves under default case-insensitive analysis;
    // backwardMulti's attr lookup must agree (ADVICE r3)
    val got = AsOfJoin.backward(left, right, "K", "T", "RK", "RT")
      .select(col("id"), col("rv")).collect()
      .map(row => row.getLong(0) -> row.get(1)).toMap
    assert(got(3L) == "b")
  }

  test("direct self-join construction with shared exprIds fails LOUDLY") {
    // constructing the node from ONE relation on both sides (skipping
    // backwardMulti's re-alias) must never silently mis-bind right
    // references to left ordinals (ADVICE r3). Today it fails loudly
    // on every path: through ofRows the analyzer re-ids the duplicated
    // side and the node's stale key references error at binding; a
    // path skipping analysis hits the strategy's disjointness require.
    val p = left.queryExecution.analyzed
    def a(n: String) = p.output.find(_.name == n).get
    val node = AsOfJoin(p, p, Seq(a("k")), Seq(a("k")), a("t"), a("t"))
    AsOfJoin.register(spark)
    val e = intercept[Exception](
      org.apache.spark.sql.graftbridge.PlanBridge.ofRows(spark, node).collect())
    assert(
      e.getMessage.contains("exprId") ||
        e.getMessage.contains("ATTRIBUTE_NOT_FOUND"),
      s"expected a loud binding/planning failure, got: ${e.getMessage}")
  }

  test("property: random data × partitionings matches the reference") {
    import org.scalacheck.{Gen, rng}
    def sample[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
      (0 until n).flatMap(i =>
        g.apply(Gen.Parameters.default, rng.Seed(seed + i)))
    val keyGen = Gen.chooseNum(1L, 8L)   // few keys => long per-key runs
    val timeGen = Gen.chooseNum(-50L, 50L) // negatives + heavy ties
    for (seed <- 0 to 2) {
      val leftRows = sample(Gen.zip(keyGen, timeGen), 120, 1000L * seed)
        .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      // dedupe right on (key, time): the operator contract (ties at
      // identical (key, time) are resolved by sort arrival, so callers
      // pre-aggregate — as asof_native does)
      val rightRows = sample(Gen.zip(keyGen, timeGen), 80, 77L * seed)
        .distinct.zipWithIndex
        .map { case ((k, t), i) => (k, t, s"r$i") }
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val l = leftRows.toDF("id", "k", "t")
      val r = rightRows.toDF("rk", "rt", "rv")
      val expected = asRows(reference(l, r))
      for (parts <- Seq(1, 3, 7)) {
        bothPaths {
          val got = AsOfJoin.backward(
              l.repartition(parts), r.repartition(parts), "k", "t", "rk", "rt")
            .select(col("id"), col("k"), col("t"), col("rt"), col("rv"))
          assert(asRows(got) === expected, s"seed=$seed parts=$parts")
        }
      }
    }
  }

  test("property: composite (long,string) keys with mid-stream nulls") {
    import org.scalacheck.{Gen, rng}
    def sample[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
      (0 until n).flatMap(i =>
        g.apply(Gen.Parameters.default, rng.Seed(seed + i)))
    val k1Gen = Gen.chooseNum(1L, 4L)
    // few segments incl. None: null key components interleave among
    // live keys in the sorted stream
    val k2Gen = Gen.oneOf(Some("x"), Some("y"), Some("z"), None)
    val timeGen = Gen.chooseNum(-40L, 40L)
    def ref(l: DataFrame, r: DataFrame): DataFrame =
      l.join(
          r,
          col("k1") === col("rk1") && col("k2") === col("rk2") &&
            col("rt") <= col("t"),
          "left")
        .groupBy(col("id"))
        .agg(max(struct(col("rt"), col("rv"))).as("m"))
        .select(col("id"), col("m.rt").as("rt"), col("m.rv").as("rv"))
    for (seed <- 0 to 1) {
      val lRows = sample(Gen.zip(k1Gen, k2Gen, timeGen), 100, 500L * seed)
        .zipWithIndex.map { case ((a, b, t), i) => (i.toLong, a, b, t) }
      val rRows = sample(Gen.zip(k1Gen, k2Gen, timeGen), 70, 37L * seed)
        .distinct.zipWithIndex
        .map { case ((a, b, t), i) => (a, b, t, s"r$i") }
        .groupBy(r => (r._1, r._2, r._3)).map(_._2.head).toSeq
      val l = lRows.toDF("id", "k1", "k2", "t")
      val r = rRows.toDF("rk1", "rk2", "rt", "rv")
      val expected = asRows(ref(l, r))
      for (parts <- Seq(1, 5)) {
        bothPaths {
          val got = AsOfJoin.backwardMulti(
              l.repartition(parts), r.repartition(parts),
              Seq("k1", "k2"), "t", Seq("rk1", "rk2"), "rt")
            .select(col("id"), col("rt"), col("rv"))
          assert(asRows(got) === expected, s"seed=$seed parts=$parts")
        }
      }
    }
  }

  test("mismatched key types fail fast at node construction") {
    import spark.implicits._
    val l = Seq((1L, "s", 5L)).toDF("id", "k", "t")
    val r0 = Seq((10L, 3L, "x")).toDF("rk", "rt", "rv")
    val r = r0.select(r0.columns.map(c => col(c).as(c)): _*)
    def attr(df: org.apache.spark.sql.DataFrame, n: String) =
      df.queryExecution.analyzed.output.find(_.name == n).get
    val e = intercept[IllegalArgumentException](
      AsOfJoin(
        l.queryExecution.analyzed, r.queryExecution.analyzed,
        Seq(attr(l, "k")), Seq(attr(r, "rk")), attr(l, "t"), attr(r, "rt")))
    assert(e.getMessage.contains("must match"))
  }

  test("asof_native query: AQE on/off agree on real data (self-join sides)") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    def rows() = NativePlans.asofNative(spark, dir).collect().map(_.toSeq).toSeq
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val aqeOn = rows()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val aqeOff = try rows()
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert(aqeOn.nonEmpty)
    assert(aqeOn == aqeOff)
  }

  test("asof_native agrees with the union+window idiom on real data") {
    // the declarative sibling (Advanced.asofJoin shape) computed over
    // the same deduped click relation
    val ev = graft.queries.Tables.events(spark, dir)
    val clicks = ev.where(col("event_type") === "click")
      .groupBy(col("user_id"), unix_micros(col("ts")).as("click_us"))
      .agg(max(col("event_id")).as("click_id"))
      .select(col("user_id"), col("click_us"), col("click_id"),
        lit("click").as("kind"), lit(null).cast("long").as("event_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("click_us"),
        lit(null).cast("long").as("click_id"),
        lit("purchase").as("kind"), col("event_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      // clicks sort before purchases at equal time => inclusive match
      .orderBy(col("click_us"), col("kind"))
      .rowsBetween(Long.MinValue, 0)
    val expected = clicks.unionByName(purchases)
      .withColumn("m_id", last(when(col("kind") === "click", col("click_id")),
        ignoreNulls = true).over(w))
      .withColumn("m_us", last(when(col("kind") === "click", col("click_us")),
        ignoreNulls = true).over(w))
      .where(col("kind") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("m_id").as("click_id"), col("m_us").as("click_us"))
      .orderBy("event_id")
      .collect().map(_.toSeq).toSeq
    val got = NativePlans.asofNative(spark, dir).collect().map(_.toSeq).toSeq
    assert(got == expected)
  }
}
