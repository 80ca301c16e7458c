package graft.queries

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions.{avg, col}
import org.scalatest.funsuite.AnyFunSuite

/** Smoke + cross-strategy checks at sf0.001. The authoritative
  * correctness gate is the driver's DuckDB oracle (tools/
  * check_oracle.py); these specs catch regressions fast and pin
  * relationships between strategies (compiled vs dynamic fan-out,
  * LSH vs exhaustive Jaccard).
  */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("every registered query runs and yields a schema at sf0.001") {
    for ((name, fn) <- SparkEntry.queries) {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty, name)
      assert(df.count() >= 0, name)
    }
  }

  test("every query has oracle SQL") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"missing oracle: $missing")
  }

  /** map_surface's big_keys emits stringified (driver comparator
    * contract); the LIST semantics — sorted keys of map_filter(v>100)
    * — stay pinned here element-wise against the flat relation.
    */
  test("map_surface big_keys string round-trips the sorted key list") {
    val flat = graft.queries.Tables.read(spark, dir, "orders")
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val want = flat.groupBy(_._1).view.mapValues(
      _.filter(_._3 > 100).map(_._2).sorted.toSeq).toMap
    val got = Extended.mapSurface(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val keys = r.getAs[String]("big_keys") match {
        case "" => Seq.empty[String]
        case s => s.split(",").toSeq
      }
      assert(keys === want(r.getAs[String]("status")), r.getAs[String]("status"))
    }
  }

  test("HLL sketch estimates within bounds (and bounds-booleans true)") {
    import org.apache.spark.sql.functions._
    // raw estimates, tighter than the oracle-checked 3x-rsd booleans
    val raw = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .collect()
    assert(raw.nonEmpty)
    for (r <- raw) {
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.1,
        s"approx=$approx exact=$exact")
    }
    val rows = Relational.sketchDistinct(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Boolean]("users_in_bounds"), r.toString)
      assert(r.getAs[Boolean]("events_in_bounds"), r.toString)
    }
  }

  test("percentile rank arithmetic == direct order statistics (sf0.001)") {
    // percentile_report picks the order statistic at rank ceil(p*n)
    // via histogram rank intervals; model it directly by sorting each
    // group's values in plain Scala
    import org.apache.spark.sql.functions._
    val vals = Tables.events(spark, dir)
      .select(col("event_type"), Quantize.cents(col("value")).as("vc"))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).sorted.toIndexedSeq).toMap
    def pick(s: IndexedSeq[Long], num: Long, den: Long): Double = {
      val n = s.size.toLong
      val r = ((num * n + den - 1) / den).max(1) // ceil(p*n), 1-based
      s((r - 1).toInt) / 100.0
    }
    val got = Advanced.percentileReport(spark, dir).collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val s = vals(r.getString(0))
      assert(r.getDouble(1) == pick(s, 1, 2), s"p50 ${r.getString(0)}")
      assert(r.getDouble(2) == pick(s, 9, 10), s"p90 ${r.getString(0)}")
      assert(r.getDouble(3) == pick(s, 99, 100), s"p99 ${r.getString(0)}")
    }
  }

  test("MAD outlier report == direct order-statistics model (sf0.001)") {
    // mad_outliers derives both medians via value histograms + rank
    // arithmetic; model it by sorting each group in plain Scala
    import org.apache.spark.sql.functions._
    val vals = Tables.events(spark, dir)
      .select(col("event_type"), Quantize.cents(col("value")).as("vc"))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).toIndexedSeq).toMap
    def lowerMedian(s: Seq[Long]): Long = {
      val sorted = s.sorted
      sorted(((sorted.size + 1) / 2 - 1).toInt)
    }
    val got = Statistics.madOutliers(spark, dir).collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val s = vals(r.getString(0))
      val m = lowerMedian(s)
      val mad = lowerMedian(s.map(v => math.abs(v - m)))
      val outliers = s.count(v => math.abs(v - m) > 5L * mad)
      assert(r.getAs[Long]("median_cents") == m, s"median ${r.getString(0)}")
      assert(r.getAs[Long]("mad_cents") == mad, s"mad ${r.getString(0)}")
      assert(r.getAs[Long]("n_outliers") == outliers.toLong,
        s"outliers ${r.getString(0)}")
    }
  }

  test("funnel stages are monotone and incremental_agg merges exactly") {
    import org.apache.spark.sql.functions._
    val f = Analytics.funnelSteps(spark, dir).collect().head
    assert(f.getLong(0) >= f.getLong(1) && f.getLong(1) >= f.getLong(2))
    // partial-merge == single-pass direct aggregation, in Spark itself
    // (the oracle proves it against DuckDB; this pins it within-engine
    // under whatever partitioning the test session picks)
    val merged = Incremental.incrementalAgg(spark, dir)
    val direct = Tables.events(spark, dir)
      .select(
        col("event_type"), to_date(col("ts")).as("d"),
        Quantize.cents(col("value")).as("vc"))
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("n"), sum(col("vc")).as("sum_vc"))
      .withColumn("avg_value", col("sum_vc").cast("double") / col("n") / 100.0)
      .orderBy("event_type", "d")
    assert(merged.collect().toSeq == direct.collect().toSeq)
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("histogram quartiles == window ntile on random data (ties, skew, tiny n)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // shapes that stress the rank arithmetic: heavy ties (few distinct
    // values), values straddling bin edges, n % 4 != 0, n < 4
    val datasets = Seq(
      Seq.fill(1000)(rnd.nextInt(7).toDouble), // massive ties
      Seq.fill(997)(rnd.nextDouble() * 5000.0), // n % 4 = 1
      Seq.fill(250)(math.floor(rnd.nextDouble() * 10) * 1000.0), // on edges
      Seq.fill(3)(rnd.nextDouble() * 100.0), // n < 4
      Seq.fill(500)(42.0)) // one single value
    for ((data, i) <- datasets.zipWithIndex) {
      val df = data.toDF("p")
      val got = Extended.quartileBuckets(df, binWidth = 100.0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      // ntile model in plain Scala (NOT a Spark global window, which
      // would put the very warning the histogram shape exists to avoid
      // into the test logs): bucket i of 4 gets n/4 (+1 while i <=
      // n%4) consecutive rows of the sorted column
      val sorted = data.sorted
      val n = sorted.size
      var idx = 0
      val want = (1 to 4).flatMap { b =>
        val sz = n / 4 + (if (b <= n % 4) 1 else 0)
        if (sz == 0) None
        else {
          val slice = sorted.slice(idx, idx + sz)
          idx += sz
          Some((b.toLong, sz.toLong, slice.head, slice.last))
        }
      }
      assert(got.toSeq == want, s"dataset $i (n=${data.size})")
    }
  }

  test("dynamic fan-out: null filters column matches unconditionally") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a subscription row whose filters column is NULL (not just empty)
    // must behave like the reference's zero-filter subscription —
    // matching every event of its subsystem even when the payload is
    // unparseable
    val events = Seq(
      ("jobs", """{"k": 1}""", 1L),
      ("jobs", "not json", 2L),
      ("other", """{"k": 1}""", 3L)).toDF("subsystem", "data", "event_id")
    val subs = Seq(
      (10L, "jobs", null: Seq[String]),
      (11L, "jobs", Seq("k<=50"))).toDF("sub_id", "subsystem", "filters")
    val got = graft.operators.Fanout
      .dynamic(events, subs, col("subsystem"), col("data"))
      .select("sub_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    // null-filters sub sees both jobs events (even the bad payload);
    // the filtered sub sees only the parseable matching one
    assert(got.toSeq == Seq((10L, 1L), (10L, 2L), (11L, 1L)))
  }

  test("capped ngram_jaccard engages on hot shingles and lower-bounds the exact run") {
    import org.apache.spark.sql.functions._
    // the cap must actually drop something at this SF, or the variant
    // proves nothing
    val maxDf = Dedup.shingles(spark, dir)
      .groupBy("shingle").count()
      .agg(max("count")).head().getLong(0)
    assert(maxDf > Dedup.HotShingleCap, s"maxDf=$maxDf never exceeds cap")
    val full = Dedup.ngramJaccard(spark, dir)
      .select("a", "b", "inter").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val capped = Dedup.ngramJaccardCapped(spark, dir)
      .select("a", "b", "inter").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(capped.nonEmpty)
    // capped inter only loses dropped-shingle evidence, so capped jacc
    // <= exact jacc: every surviving pair is in the exact result with
    // at-least-equal intersection
    for ((p, i) <- capped) {
      assert(full.contains(p), s"pair $p not in exact result")
      assert(i <= full(p), s"pair $p: capped inter $i > exact ${full(p)}")
    }
  }

  test("compiled and dynamic fan-out agree") {
    val c = RefSurface.fanout(spark, dir)
      .select("sub_id", "event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val d = RefSurface.fanoutDynamic(spark, dir)
      .select("sub_id", "event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(c.nonEmpty)
    assert(c.toSeq == d.toSeq)
  }

  test("string-typed filter subscription never matches integer props") {
    val subs = RefSurface.fanout(spark, dir)
      .select("sub_id").distinct().collect().map(_.getLong(0)).toSet
    assert(!subs.contains(4L), "sub 4 (k<='50' string filter) must match nothing")
  }

  test("minhash LSH finds a subset of exhaustive jaccard pairs") {
    val lsh = Dedup.minhashLsh(spark, dir)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.ngramJaccard(spark, dir)
      .where("jacc >= 0.5")
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(full))
  }

  test("salted skew join equals the unsalted aggregation") {
    import org.apache.spark.sql.functions._
    val salted = Extended.skewJoin(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val plain = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("event_id")).as("f"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(salted.nonEmpty)
    assert(salted.toSeq == plain.toSeq)
  }

  test("ntile buckets cover every order exactly once") {
    import org.apache.spark.sql.functions._
    val buckets = Extended.ntileBuckets(spark, dir).collect()
    assert(buckets.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val total = buckets.map(_.getLong(1)).sum
    assert(total == Tables.read(spark, dir, "orders").count())
    // quartile boundaries are monotone
    val byBucket = buckets.sortBy(_.getLong(0))
    for (Seq(lo, hi) <- byBucket.sliding(2).map(_.toSeq).toSeq if hi != null)
      assert(lo.getDouble(3) <= hi.getDouble(2) + 1e-9)
  }

  test("repetition_stats matches a brute-force model on generated docs") {
    // the sorted-run-length top-bigram scan replaced a quadratic
    // distinct×scan form; pin it to the transparent model, including
    // the empty / single-token / all-equal edge cases
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "ccc", "d4", "ee", "f")
    val gen = (0 until 40).map(i =>
      (0 until rnd.nextInt(30)).map(_ => vocab(rnd.nextInt(vocab.size))))
    val docs = (gen ++ Seq(Seq.empty, Seq("solo"), Seq.fill(9)("x")))
      .zipWithIndex
      .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }

    val tmp = java.nio.file.Files
      .createTempDirectory("graft-repstats").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")

    def model(text: String): (Long, Long, Long, Long) = {
      val tk = text.split("\\s+").filter(_.nonEmpty).toSeq
      val bg = tk.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toSeq
      val top =
        if (bg.isEmpty) 0L
        else bg.groupBy(identity).values.map(_.size).max.toLong
      (tk.size.toLong, tk.distinct.size.toLong,
        (bg.size - bg.distinct.size).toLong, top)
    }

    val got = TextAnalysis.repetitionStats(spark, tmp)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    for ((id, text) <- docs)
      assert(got(id) == model(text), s"doc $id: '$text'")
  }

  test("similarity shares ONE quantized vector relation; invalidate drops it") {
    Similarity.invalidateShared(spark, dir)
    val before = spark.sparkContext.getPersistentRDDs.size
    Similarity.knnBrute(spark, dir).collect()  // warms the shared vectors
    val afterFirst = spark.sparkContext.getPersistentRDDs.size
    assert(afterFirst == before + 1,
      s"expected one new persist ($before -> $afterFirst)")
    Similarity.knnIvf(spark, dir).collect()    // must reuse, not re-persist
    assert(spark.sparkContext.getPersistentRDDs.size == afterFirst)
    Similarity.invalidateShared(spark, dir)
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "invalidateShared must unpersist the shared vector relation")
  }

  test("pagerank: teleport floor, kinds, descending order, bipartite pull") {
    val rows = Graph.pagerank(spark, dir).collect()
    assert(rows.length == 25)
    val ranks = rows.map(_.getLong(2))
    // every node keeps at least its teleport mass
    assert(ranks.forall(_ >= 150000L))
    assert(ranks.sameElements(ranks.sortBy(-_)), "not rank-descending")
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("customer", "supplier")))
    // 100 suppliers aggregate 1500 customers' mass: the top of the
    // ranking must be supplier-dominated
    assert(rows.take(5).forall(_.getString(0) == "supplier"),
      rows.take(5).mkString(", "))
  }

  test("weighted_sample: k per stratum, dense ranks, longer docs favored") {
    val rows = TrainingPipeline.weightedSample(spark, dir).collect()
    val bySource = rows.groupBy(_.getString(0))
    assert(bySource.values.forall(_.length == 5), "expected k=5 per source")
    for ((_, g) <- bySource)
      assert(g.map(_.getLong(4)).sorted.sameElements(1L to 5L))
    // weight-proportional: sampled docs skew long vs the corpus
    val sampledMean = rows.map(_.getLong(2)).sum.toDouble / rows.length
    val corpus = Tables.read(spark, dir, "documents")
      .agg(avg(col("n_chars"))).head().getDouble(0)
    assert(sampledMean > corpus,
      s"sampled mean $sampledMean <= corpus mean $corpus")
  }

  test("assoc_rules matches a brute-force basket model") {
    val got = Association.assocRules(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // brute-force model over the collected (user, type) pairs
    val ut = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nu = ut.map(_._1).distinct.length.toLong
    val supp = ut.groupBy(_._2).map { case (t, g) => t -> g.length.toLong }
    val byUser: Seq[Seq[String]] =
      ut.groupBy(_._1).values.map(_.map(_._2).toSeq.sorted).toSeq
    val cnt = byUser
      .flatMap(ts => for (a <- ts; b <- ts if a < b) yield (a, b))
      .groupBy(identity).map { case (p, g) => p -> g.length.toLong }
    assert(got.keySet == cnt.keySet)
    for ((p @ (a, b), c) <- cnt) {
      val (gc, sup, conf, lift) = got(p)
      assert(gc == c, s"$p count")
      assert(sup == c * 1000000L / nu, s"$p support")
      assert(conf == c * 1000000L / supp(a), s"$p confidence")
      assert(lift == c * nu * 1000L / (supp(a) * supp(b)), s"$p lift")
    }
  }

  test("markov_transitions: rows normalize to ~1e6 ppm; step count exact") {
    val rows = Association.markovTransitions(spark, dir).collect()
    val byPrev = rows.groupBy(_.getString(0))
    for ((p, g) <- byPrev) {
      val s = g.map(_.getLong(3)).sum
      // floor division loses < 1 ppm per cell
      assert(s <= 1000000L && s > 1000000L - g.length, s"prev=$p sums to $s")
    }
    // each user contributes (events - 1) steps
    val ev = Tables.events(spark, dir)
    val expected = ev.count() - ev.select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(2)).sum == expected)
  }

  test("bom_rollup: root covers the forest; depth and leaf arithmetic") {
    val rows = Hierarchy.bomRollup(spark, dir).collect()
    val byKey = rows.map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val totalCents = Tables.read(spark, dir, "part")
      .agg(org.apache.spark.sql.functions.sum(
        Quantize.cents(col("p_retailprice")))).head().getLong(0)
    // root 0's subtree is the entire tree
    assert(byKey(0L) == ((0L, rows.length.toLong, totalCents)))
    // depth = number of (k-1) div 4 steps to reach the root
    for ((k, (d, _, _)) <- byKey) {
      var c = k; var steps = 0L
      while (c >= 1) { c = (c - 1) / 4; steps += 1 }
      assert(d == steps, s"depth of $k")
    }
    // leaves (no child key in range) have singleton subtrees
    val maxK = byKey.keys.max
    for ((k, (_, sn, _)) <- byKey if 4 * k + 1 > maxK)
      assert(sn == 1L, s"leaf $k")
  }

  test("shortest_path: bipartite parity and exact BFS model") {
    val rows = Graph.shortestPath(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // bipartite: customers at even hop counts, suppliers at odd
    for ((kind, entity, d) <- rows)
      assert(
        (kind == "customer") == (d % 2 == 0), s"$kind $entity dist $d")
    // exact BFS model over the collected edge list
    val li = Tables.read(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey"))
    val ord = Tables.read(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val pairs = li.join(ord, col("ok") === col("o_orderkey"))
      .select(
        (col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .map { case (k, g) => k -> g.map(_._2) }
    var dist = adj.keys.filter(n => n % 2 == 0 && n < 20)
      .map(_ -> 0L).toMap
    for (_ <- 1 to 4) {
      val step = dist.toSeq
        .flatMap { case (n, d) => adj(n).map(_ -> (d + 1)) }
      dist = (dist.toSeq ++ step).groupBy(_._1)
        .map { case (n, g) => n -> g.map(_._2).min }
    }
    val got = rows.map { case (kind, entity, d) =>
      (if (kind == "customer") entity * 2 else entity * 2 + 1) -> d
    }.toMap
    assert(got == dist)
  }

  test("hits: both sides normalized to max=1e6, positive, descending") {
    val rows = Graph.hits(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byKind = rows.groupBy(_._1)
    assert(byKind.keySet == Set("hub", "authority"))
    for ((kind, g) <- byKind) {
      val scores = g.map(_._3)
      assert(scores.max == 1000000L, s"$kind max")
      assert(scores.forall(_ > 0), s"$kind positivity")
      assert(scores.sameElements(scores.sortBy(-_)), s"$kind order")
    }
  }

  test("knn_recall: probing more cells never lowers recall; range sane") {
    val rows = Similarity.knnRecall(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(rows.keySet == Set(
      "knn_ivf", "knn_ivf_kmeans", "knn_ivf_probe2", "knn_ivf_pq",
      "knn_lsh", "knn_pq"))
    assert(rows.values.forall(v => v >= 0.0 && v <= 1.0), rows)
    // probe2 searches a STRICT superset of ivf's candidate cells
    assert(rows("knn_ivf_probe2") >= rows("knn_ivf"), rows)
  }

  test("invalidateShared drops ALL shared dedup relations") {
    // warm all three caches (shingle arrays + verified LSH pairs +
    // converged CC labels), snapshot the session's persisted-plan
    // count, invalidate, and require the count to DROP by three — a
    // stale shared relation after a table rewrite would silently serve
    // the old snapshot
    Dedup.dedupClusters(spark, dir).collect() // warms arr + pairs + labels
    val before = spark.sparkContext.getPersistentRDDs.size
    assert(before >= 3, s"expected all three shared persists, saw $before")
    Dedup.invalidateShared(spark, dir)
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before - 3,
      s"invalidateShared must unpersist all three relations ($before -> $after)")
  }

  test("dedup_clusters and dedup_keeper_map share ONE converged label table") {
    // the fixpoint loop must run once per (session, dir): after
    // clusters ran, keeper_map must not add a persisted relation (it
    // consumes the shared converged labels instead of re-looping)
    Dedup.invalidateShared(spark, dir)
    Dedup.dedupClusters(spark, dir).collect()
    val afterClusters = spark.sparkContext.getPersistentRDDs.keySet
    val keepers = Dedup.dedupKeeperMap(spark, dir)
    assert(keepers.count() > 0)
    // compare ID SETS, not counts: the ContextCleaner may concurrently
    // GC an unreferenced cached relation from an earlier test, so the
    // invariant is "keeper_map persists nothing NEW", not "same size"
    val newIds = spark.sparkContext.getPersistentRDDs.keySet -- afterClusters
    assert(newIds.isEmpty,
      s"keeper_map must reuse the shared labels (new persisted: $newIds)")
    // keeper invariants still hold on the shared path: every doc maps
    // to a keeper <= itself, keepers are their own keeper
    val bad = keepers.where(col("keeper") > col("doc_id")).count()
    assert(bad == 0, s"$bad docs with keeper > doc_id")
    Dedup.invalidateShared(spark, dir)
  }
}
