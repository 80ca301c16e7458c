package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Model checks for the iterative graph operators: the distributed
  * pipelines ([[Graph.pagerankOn]], [[Hierarchy.closureOf]]) must
  * agree EXACTLY (integer arithmetic) with tiny in-memory reference
  * implementations on seeded random inputs — the same
  * battery-vs-model discipline as `FilterPropertySpec`, covering
  * shapes the fixed test tables never produce (dangling nodes,
  * multi-root forests, skewed weights, chains deeper than the round
  * budget covers at the default data).
  */
class GraphPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pagerankModel(
      edges: Seq[(Long, Long, Long)], iterations: Int): Map[Long, Long] = {
    val tw = edges.groupBy(_._1).map { case (s, g) => s -> g.map(_._3).sum }
    var ranks: Map[Long, Long] =
      edges.map(_._1).distinct.map(_ -> 1000000L).toMap
    for (_ <- 1 to iterations) {
      val contribs = edges
        .filter(e => ranks.contains(e._1))
        .groupBy(_._2)
        .map { case (dst, g) =>
          dst -> g.map { case (s, _, w) =>
            ranks(s) * 85 * w / (tw(s) * 100)
          }.sum
        }
      ranks = contribs.map { case (d, c) => d -> (150000L + c) }
    }
    ranks
  }

  test("pagerankOn matches the integer model on seeded random digraphs") {
    import spark.implicits._
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val n = 5 + rnd.nextInt(20)
      val edges = (for {
        s <- 0L until n
        d <- 0L until n
        if s != d && rnd.nextInt(4) == 0 // sparse, dangling nodes likely
      } yield (s, d, 1L + rnd.nextInt(9))).toSeq
      if (edges.nonEmpty) {
        val df = edges.toDF("src", "dst", "w")
        val got = Graph.pagerankOn(df, iterations = 3)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = pagerankModel(edges, iterations = 3)
        assert(got == want, s"trial $trial: $edges")
      }
    }
  }

  test("pagerank shares ONE weighted edge relation per (session, dir)") {
    val dir = "/root/testdata/sf0.001"
    Graph.invalidateShared(spark, dir)
    val a = Graph.weightedTradeEdges(spark, dir)
    val b = Graph.weightedTradeEdges(spark, dir)
    // same INSTANCES: the outw shuffle + weight join + materializing
    // count ran once; bench warmup and both timed runs reuse them
    assert(a._1 eq b._1)
    assert(a._2 eq b._2)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Graph.invalidateShared(spark, dir)
    val dropped = before -- spark.sparkContext.getPersistentRDDs.keySet
    // raw bidirectional edges + outw + weighted edges all unpersist
    assert(dropped.size >= 3, s"expected the shared trio dropped: $dropped")
  }

  test("closureOf matches a BFS ancestor model on seeded random forests") {
    import spark.implicits._
    val rnd = new Random(7)
    for (trial <- 1 to 5) {
      val n = 8 + rnd.nextInt(40)
      // random forest: each node's parent is a strictly-smaller key
      // (or a root when nextInt hits 0) — arbitrary fan-out and depth
      val parent = (1L until n).flatMap { k =>
        if (rnd.nextInt(5) == 0) None
        else Some(k -> rnd.nextLong(k)) // parent in [0, k)
      }
      val depth = {
        val p = parent.toMap
        def d(k: Long): Int =
          p.get(k).map(1 + d(_)).getOrElse(0)
        (0L until n).map(d).max
      }
      val rounds = math.max(1,
        math.ceil(math.log(math.max(depth, 1)) / math.log(2)).toInt)
      val df = parent.toDF("node", "anc")
      val (closure, persisted) = Hierarchy.closureOf(df, rounds)
      val got = closure.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      persisted.foreach(_.unpersist())
      // model: all (node, proper ancestor) pairs by parent walking
      val p = parent.toMap
      val want = (1L until n).flatMap { k =>
        Iterator.iterate(p.get(k))(_.flatMap(p.get))
          .takeWhile(_.isDefined).map(a => (k, a.get))
      }.toSet
      assert(got == want, s"trial $trial depth=$depth rounds=$rounds")
    }
  }

  test("triangleCountOn matches brute-force enumeration on seeded random graphs") {
    import spark.implicits._
    val rnd = new Random(11)
    for (trial <- 1 to 5) {
      val n = 6 + rnd.nextInt(25)
      // undirected simple graph, a < b, density ~1/3 => skewed
      // degrees and plenty of triangles
      val edges = (for {
        a <- 0L until n
        b <- (a + 1) until n
        if rnd.nextInt(3) == 0
      } yield (a, b)).toSeq
      if (edges.nonEmpty) {
        val got = Graph.triangleCountOn(edges.toDF("a", "b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // model: O(n^3) scan over the adjacency set
        val es = edges.toSet
        val tri = for {
          a <- 0L until n; b <- (a + 1) until n; c <- (b + 1) until n
          if es((a, b)) && es((b, c)) && es((a, c))
        } yield (a, b, c)
        val want = tri.flatMap(t => Seq(t._1, t._2, t._3))
          .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
        assert(got == want, s"trial $trial n=$n edges=${edges.size}")
      }
    }
  }
}
