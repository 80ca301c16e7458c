package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity join via PREFIX FILTERING (the SSJoin /
  * PPJoin family, Chaudhuri et al. ICDE'06): the third member of the
  * near-dup candidate-generation trio beside banded MinHash
  * (approximate, bounded) and the capped posting-list expansion
  * (exact but lower-bounded). Prefix filtering is BOTH exact and
  * bounded-candidate: a pair can reach Jaccard >= t only if the two
  * docs share a shingle inside their df-ordered prefixes, so only
  * prefix postings expand into pairs — and prefixes are dominated by
  * RARE shingles (the global order puts low-df shingles first), which
  * is precisely what kills the hot-shingle quadratic traffic the
  * exact baseline suffers.
  */
object SetSimilarity {

  /** Jaccard threshold (ppm): pairs at >= 0.8 — the near-replica
    * band a crawl-dedup keep/drop decision uses.
    */
  private[queries] val ThresholdPpm = 800000L

  /** `jaccard_prefix_join`: all document pairs with exact shingle
    * Jaccard >= 0.8, found WITHOUT enumerating the exact baseline's
    * Σ df² co-shingle pairs.
    *
    * Plan shape (scale story): shingle df is one vocabulary-sized
    * aggregate; the prefix relation is a doc-PARTITIONED row_number
    * over (df, shingle) — never a global window — keeping the first
    * p = n - ceil(0.8·n) + 1 shingles of each doc (for t = 0.8
    * that's ~n/5 rows, a 5x posting shrink before any join); pair
    * expansion then runs over PREFIX postings only, where hot
    * stopword-class shingles can't appear unless a doc consists of
    * almost nothing else. Verification joins the two shingle arrays
    * (the shared DISK_ONLY relation — no re-shingling) and computes
    * the exact intersection narrowly. Lossless by the prefix-filter
    * lemma: jacc(x,y) >= t forces |x∩y| >= ceil(t·|x|) and
    * >= ceil(t·|y|), and the smallest common shingle in global
    * (df, shingle) order then sits inside BOTH prefixes, so the
    * candidate join cannot miss a qualifying pair — the oracle is
    * the plain exact all-pairs join.
    *
    * jacc_ppm is floor-division integer, so the DuckDB comparison is
    * bit-exact.
    */
  def jaccardPrefixJoin(spark: SparkSession, dir: String): DataFrame = {
    val docarr = Dedup.docShingleArraysShared(spark, dir)
    val sh = docarr.select(
      col("doc_id"), size(col("arr")).cast("long").as("n"),
      explode(col("arr")).as("shingle"))
    val df = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val prefix = sh
      .join(df, "shingle")
      .withColumn(
        "rk",
        row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(col("df"), col("shingle"))))
      // p = n - ceil(0.8 n) + 1; ceil(4n/5) = (4n+4) div 5 exactly
      .where(col("rk") <= col("n") - expr("(4 * n + 4) div 5") + 1)
      .select(col("shingle"), col("doc_id"), col("n"), col("rk").cast("long").as("rk"))
    // Candidate generation = one shingle-keyed self-join of the prefix
    // relation with PPJoin's two candidate-killers applied BEFORE the
    // pair distinct (measured: 122k raw candidate rows vs 256 true
    // pairs at sf0.1 — verification cost was 99% false positives):
    //  - length filter: jacc >= 0.8 forces 4*max(na,nb) <= 5*min(na,nb)
    //    (at i = min side, jacc = min/max);
    //  - positional filter: via match rank (ra, rb), the overlap can
    //    reach at most 1 + min(na-ra, nb-rb) shingles, which must meet
    //    the required overlap alpha = ceil(4(na+nb)/9) (from
    //    jacc_ppm >= 800000 cross-multiplied). Both prune-only-
    //    impossible bounds, so the join stays lossless: the smallest
    //    common shingle's row always survives for a qualifying pair.
    val cands = prefix.toDF("shingle", "a", "na", "ra")
      .join(prefix.toDF("shingle", "b", "nb", "rb"), "shingle")
      .where(col("a") < col("b"))
      .where(col("nb") * 5 >= col("na") * 4 && col("na") * 5 >= col("nb") * 4)
      .where(
        lit(1L) + least(col("na") - col("ra"), col("nb") - col("rb")) >=
          expr("(4 * (na + nb) + 8) div 9"))
      .select(col("a"), col("b"))
      .distinct()
    val arrs = docarr.select(col("doc_id"), col("arr"))
    cands
      .join(arrs.select(col("doc_id").as("a"), col("arr").as("arr_a")), "a")
      .join(arrs.select(col("doc_id").as("b"), col("arr").as("arr_b")), "b")
      .select(
        col("a"), col("b"),
        size(array_intersect(col("arr_a"), col("arr_b")))
          .cast("long").as("inter"),
        size(col("arr_a")).cast("long").as("na"),
        size(col("arr_b")).cast("long").as("nb"))
      .withColumn("jacc_ppm", expr("inter * 1000000 div (na + nb - inter)"))
      .where(col("jacc_ppm") >= ThresholdPpm)
      .orderBy("a", "b")
  }

  /** Oracle: the exact all-pairs Jaccard join (prefix filtering is
    * lossless, so the bounded plan must reproduce it bit-for-bit).
    */
  def jaccardPrefixJoinOracle: String =
    s"""WITH ${Dedup.ShinglesSql},
       |${Dedup.jaccSql()}
       |SELECT a, b, inter, na, nb,
       |  inter * 1000000 // (na + nb - inter) AS jacc_ppm
       |FROM jacc
       |WHERE inter * 1000000 // (na + nb - inter) >= $ThresholdPpm
       |ORDER BY a, b""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "jaccard_prefix_join", jaccardPrefixJoin,
      Some(jaccardPrefixJoinOracle)))
}
