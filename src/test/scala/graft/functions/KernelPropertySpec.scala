package graft.functions

import graft.TestSpark
import org.apache.commons.codec.digest.DigestUtils
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Model checks for the custom codegen kernels against transparent
  * Scala reference implementations — the kernels run inside
  * whole-stage codegen, so a bug would corrupt results silently at
  * scale. Deterministic seeds keep the suite stable offline.
  */
class KernelPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val token: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n =>
      Gen.stringOfN(n, Gen.frequency(
        8 -> Gen.alphaNumChar,
        1 -> Gen.oneOf('é', 'ß', '中', '€'),
        1 -> Gen.oneOf('.', '-', '_'))))

  private def sample[T](g: Gen[T], n: Int, seedOffset: Long): Seq[T] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, rng.Seed(7L + seedOffset + i)))

  private def simhashModel(toks: Seq[String]): String = {
    val sums = new Array[Int](32)
    for (t <- toks; (c, j) <- DigestUtils.md5Hex(t).zipWithIndex)
      sums(j) += (if (c.toInt % 2 == 1) 1 else -1)
    sums.map(s => if (s > 0) '1' else '0').mkString
  }

  private def minhashModel(shingles: Seq[String], k: Int): Seq[String] =
    (0 until k).map(h => shingles.map(s => DigestUtils.md5Hex(s"$h|$s")).min)

  test("SimHash32 matches the hex-parity model on random token arrays") {
    import spark.implicits._
    val lists = sample(Gen.nonEmptyListOf(token), 60, 0)
    val got = lists.toDF("t")
      .select(TextHashFunctions.simhash32(col("t")))
      .as[String].collect().toSeq
    assert(got == lists.map(simhashModel))
  }

  test("MinHashSig matches the minwise model on random shingle arrays") {
    import spark.implicits._
    val lists = sample(Gen.nonEmptyListOf(token), 40, 1000)
    val got = lists.toDF("s")
      .select(TextHashFunctions.minhashSig(col("s"), 4))
      .as[Seq[String]].collect().toSeq
    assert(got == lists.map(minhashModel(_, 4)))
  }

  test("OrderedPairs matches sorted combinations, any input order") {
    import spark.implicits._
    val lists =
      sample(Gen.listOf(Gen.chooseNum(-1000L, 1000L)), 40, 2000)
    val got = lists.map(Tuple1(_)).toDF("ids")
      .select(PairFunctions.orderedPairs(col("ids")).as("p"))
      .collect()
      .map(_.getSeq[Row](0).map(r => (r.getLong(0), r.getLong(1))).toSeq)
      .toSeq
    val expected = lists.map { l =>
      val s = l.sorted
      for {
        i <- s.indices
        j <- (i + 1) until s.length
      } yield (s(i), s(j))
    }
    assert(got == expected)
  }

  test("kernels agree between interpreted eval and codegen paths") {
    // force the interpreted path via the kernel helpers directly
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val toks = Seq("alpha", "beta", "gamma", "beta")
    val arr = ArrayData.toArrayData(toks.map(UTF8String.fromString).toArray)
    assert(TextHashKernel.simhash32(arr).toString == simhashModel(toks))
    assert(
      TextHashKernel.minhashSig(arr, 3).toObjectArray(
        org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq == minhashModel(toks, 3))
  }
}
