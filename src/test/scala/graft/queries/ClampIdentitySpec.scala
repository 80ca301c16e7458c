package graft.queries

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** `clamped_balance` rests on the one-sided-clamp identity
  * b_n = r_n − min(0, min_i r_i): the floor-at-zero sequential fold
  * (b = max(0, b + x)) equals a closed form over unclamped prefix
  * sums. Model-check the WINDOWED form against the literal fold on
  * seeded random transaction sequences.
  */
class ClampIdentitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("windowed clamp form == sequential fold on seeded random sequences") {
    import spark.implicits._
    val rnd = new Random(19)
    val rows = for {
      g <- 0L until 40
      i <- 0L until (1 + rnd.nextInt(25)).toLong
    } yield (g, i, (rnd.nextInt(41) - 20).toLong)
    val w = Window.partitionBy($"g").orderBy($"i")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = rows.toDF("g", "i", "x")
      .withColumn("r", sum($"x").over(w))
      .groupBy($"g")
      .agg((sum($"x") - least(lit(0L), min($"r"))).as("balance"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = rows.groupBy(_._1).map { case (g, txs) =>
      g -> txs.sortBy(_._2).map(_._3).foldLeft(0L)((b, x) => math.max(0L, b + x))
    }
    assert(got == want)
  }
}
