package graft.queries

import java.security.MessageDigest

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The grid-bucketed radius join must equal the brute-force all-pairs
  * model EXACTLY — this is the no-candidate-loss property of the 3×3
  * neighbor-cell expansion (a point within R of a cell's occupant can
  * only live in the 8 surrounding cells when the cell size is R).
  */
class GeoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def udeg(key: Long, off: Int): Long =
    java.lang.Long.parseLong(md5hex(key.toString).substring(off, off + 6), 16) % 1000000L

  test("geo_radius_join == brute-force all-pairs model (sf0.001)") {
    val R = 20000L
    val custs = Tables.read(spark, dir, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
    val supps = Tables.read(spark, dir, "supplier")
      .select("s_suppkey").collect().map(_.getLong(0))
    val model = custs.flatMap { c =>
      val (lat, lon) = (udeg(c, 0), udeg(c, 8))
      val near = supps.flatMap { s =>
        val (slat, slon) = (udeg(s, 0), udeg(s, 8))
        val d2 = (lat - slat) * (lat - slat) + (lon - slon) * (lon - slon)
        if (d2 <= R * R) Some((d2, s)) else None
      }
      if (near.isEmpty) None
      else {
        val packed = near.map { case (d2, s) => d2 * 1000000L + s }.min
        Some(c -> ((near.length.toLong, packed / 1000000L, packed % 1000000L)))
      }
    }.toMap

    val got = Geo.geoRadiusJoin(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == model, s"grid=${got.size} rows, brute=${model.size} rows")
    assert(model.nonEmpty) // the fixture actually exercises the join
  }
}
