package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Model checks for the round-6 fourth wave: the positional phrase
  * join must equal the naive sliding-window count (the definition it
  * replaces at scale), OHLC boundaries must come from the day's true
  * boundary instants, and the k-anonymity grid must partition the
  * table exactly.
  */
class Wave7Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("phrase_search equals the naive sliding-window phrase count") {
    // Plain-Scala model: tokenize each doc, count adjacent
    // ("table", "part") pairs, take the same top-20.
    val docs = Tables.read(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val want = docs.map { case (id, text) =>
      val t = text.split("\\s+").filter(_.nonEmpty)
      id -> t.sliding(2).count {
        case Array("table", "part") => true
        case _ => false
      }
    }.filter(_._2 > 0)
      .sortBy { case (id, n) => (-n, id) }
      .take(20).toSeq
    val got = TextAnalysis.phraseSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt)).toSeq
    assert(got == want)
  }

  test("ohlc_bars boundaries come from the day's true first/last instants") {
    val rows = Analytics.ohlcBars(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (open, high, low, close) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(low <= open && open <= high)
      assert(low <= close && close <= high)
      assert(r.getLong(1) > 0) // n_trades
    }
  }

  test("k_anonymity classes partition the customer table") {
    val rows = DataQuality.kAnonymity(spark, dir).collect()
    val total = rows.map(_.getLong(2)).sum
    val nCust = Tables.read(spark, dir, "customer").count()
    assert(total == nCust) // every row is in exactly one QI class
    for (r <- rows) {
      assert(r.getLong(3) >= 1 && r.getLong(3) <= r.getLong(2))
      assert(r.getBoolean(4) == (r.getLong(2) < 10))
    }
  }
}
