package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the corpus-adaptive LSH banding contract for the embedding
  * near-dup family (`dedup_embedding_lsh` / `embedding_clusters`) —
  * the round-5 `weak`: with band width frozen at 8 bits, a 10× corpus
  * densified the fixed 2×2⁸ buckets and the candidate join grew
  * quadratic-in-bucket (measured 6.8× cost at 10× data). The fix is
  * [[Similarity.lshBandBits]]: bucket count 2^bits is independent of
  * the data, so deriving bits from a driver-side corpus count holds
  * expected per-bucket occupancy — and therefore pair count — flat.
  *
  * Two layers, mirroring how `ivf_balance` guards the IVF index:
  *  1. the ARITHMETIC guarantee (expected occupancy n/2^bits stays ≤
  *     the target across six orders of magnitude of n) — this is the
  *     scaling claim itself, valid at any n;
  *  2. the MEASURED occupancy of the real sf0.001/sf0.01 buckets —
  *     the distribution-skew spot check the arithmetic can't give
  *     (sign-bit buckets are only as balanced as the data).
  */
class LshBandingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("band bits derivation: expected occupancy ≤ target, monotone, floored") {
    val ns = Seq(1L, 100L, 500L, 1024L, 2000L, 20000L, 200000L,
      2000000L, 200000000L, 2000000000L)
    val bits = ns.map(Similarity.lshBandBits)
    // floor: small corpora keep the minimum width (sf0.01's n=500 must
    // derive 8 so round-5 hashes are unchanged by the adaptivity)
    assert(Similarity.lshBandBits(500L) == 8)
    // the 10× sweep's operating points (SCALE.md embedding rows)
    assert(Similarity.lshBandBits(2000L) == 9)
    assert(Similarity.lshBandBits(20000L) == 13)
    // monotone in n
    assert(bits == bits.sorted)
    // the scaling claim: expected occupancy n / 2^bits ≤ target once
    // past the floor (below the floor occupancy is even lower)
    ns.zip(bits).foreach { case (n, b) =>
      assert(n.toDouble / (1L << b) <= 4.0 + 1e-9,
        s"n=$n bits=$b expected occupancy ${n.toDouble / (1L << b)}")
    }
  }

  test("measured bucket occupancy stays near target on real corpora") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val n = Tables.read(spark, dir, "embeddings").count()
      val bits = Similarity.lshBandBits(n)
      val occ = Similarity.embLshBands(spark, dir, bits)
        .groupBy(col("band"), col("bkey"))
        .agg(count(lit(1)).as("c"))
        .agg(avg(col("c")).as("avg_occ"), max(col("c")).as("max_occ"))
        .head()
      val avgOcc = occ.getDouble(0)
      val maxOcc = occ.getLong(1)
      // avg is over USED buckets, so ≥ n/2^bits; 2× the target bounds
      // distribution skew, 16× bounds the single worst bucket (the
      // quadratic term in candidate-join cost)
      assert(avgOcc <= 8.0, s"$dir: avg occupancy $avgOcc (n=$n bits=$bits)")
      assert(maxOcc <= 64L, s"$dir: max occupancy $maxOcc (n=$n bits=$bits)")
    }
  }
}
