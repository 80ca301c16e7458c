package graft.queries

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fifth wave of first-principles statistics models (rationale in
  * [[StatModelSpec]]): the multi-class evaluation pair over the
  * langid confusion matrix (per-class P/R/F1 and Cohen's κ — the
  * CONFUSION MATRIX is the given input, its own heuristic is a
  * feature not a statistic; the formulas are recomputed from their
  * definitions) and the Pareto/Lorenz inequality pair recomputed by
  * explicit sorting.
  */
class StatModelSpec5 extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, dir).collect()

  private def confusion(): Seq[(String, String, Long)] =
    TextAnalysis.textLangid(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))

  // ---------------------------------------------------------------
  // classifier_eval — per-class precision/recall/F1 + accuracy row
  // ---------------------------------------------------------------
  test("classifier_eval matches per-class P/R/F1 from the confusion matrix") {
    val cm = confusion()
    val classes = (cm.map(_._1) ++ cm.map(_._2)).distinct
    def tpFpFn(c: String): (BigInt, BigInt, BigInt) = {
      val tp = BigInt(cm.filter(x => x._1 == c && x._2 == c).map(_._3).sum)
      val fp = BigInt(cm.filter(x => x._2 == c && x._1 != c).map(_._3).sum)
      val fn = BigInt(cm.filter(x => x._1 == c && x._2 != c).map(_._3).sum)
      (tp, fp, fn)
    }
    val diag = BigInt(cm.filter(x => x._1 == x._2).map(_._3).sum)
    val errs = BigInt(cm.filter(x => x._1 != x._2).map(_._3).sum)
    val got = run("classifier_eval")
    assert(got.length == classes.size + 1)
    got.foreach { r =>
      val c = r.getAs[String]("lang")
      val (tp, fp, fn) =
        if (c == "zz_overall") (diag, errs, errs) else tpFpFn(c)
      assert(BigInt(r.getAs[Long]("tp")) == tp, c)
      assert(BigInt(r.getAs[Long]("fp")) == fp, c)
      assert(BigInt(r.getAs[Long]("fn")) == fn, c)
      // precision = tp/(tp+fp); recall = tp/(tp+fn);
      // F1 = 2PR/(P+R) ≡ 2tp/(2tp+fp+fn) (exact identity)
      if (tp + fp == 0) assert(r.isNullAt(r.fieldIndex("precision_ppm")), c)
      else assert(BigInt(r.getAs[Long]("precision_ppm")) ==
        tp * 1000000 / (tp + fp), c)
      if (tp + fn == 0) assert(r.isNullAt(r.fieldIndex("recall_ppm")), c)
      else assert(BigInt(r.getAs[Long]("recall_ppm")) ==
        tp * 1000000 / (tp + fn), c)
      if (2 * tp + fp + fn == 0) assert(r.isNullAt(r.fieldIndex("f1_ppm")), c)
      else assert(BigInt(r.getAs[Long]("f1_ppm")) ==
        2 * tp * 1000000 / (2 * tp + fp + fn), c)
    }
  }

  // ---------------------------------------------------------------
  // cohens_kappa — (po − pe)/(1 − pe), composed exactly
  // ---------------------------------------------------------------
  test("cohens_kappa matches the chance-corrected agreement definition") {
    val cm = confusion()
    val n = BigInt(cm.map(_._3).sum)
    val diag = BigInt(cm.filter(x => x._1 == x._2).map(_._3).sum)
    val classes = (cm.map(_._1) ++ cm.map(_._2)).distinct
    val peNum = classes.map { c =>
      BigInt(cm.filter(_._1 == c).map(_._3).sum) *
        BigInt(cm.filter(_._2 == c).map(_._3).sum)
    }.sum
    val got = run("cohens_kappa").head
    assert(BigInt(got.getAs[Long]("n")) == n)
    assert(BigInt(got.getAs[Long]("po_ppm")) == diag * 1000000 / n)
    assert(BigInt(got.getAs[Long]("pe_ppm")) == peNum * 1000000 / (n * n))
    // κ = (po − pe)/(1 − pe) = (diag·N − pe_num)/(N² − pe_num)
    if (n * n == peNum) assert(got.isNullAt(got.fieldIndex("kappa_ppm")))
    else {
      val num = diag * n - peNum
      val den = n * n - peNum
      val want =
        if (num < 0) -((-num) * 1000000 / den) else num * 1000000 / den
      assert(BigInt(got.getAs[Long]("kappa_ppm")) == want)
    }
  }

  // ---------------------------------------------------------------
  // abc_classification — Pareto classes by explicit descending sort
  // ---------------------------------------------------------------
  test("abc_classification matches the 80/95 Pareto cut by sorting") {
    val rev = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_partkey").cast("long"),
        round(col("l_extendedprice") * 100).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq
      .map { case (pk, xs) => (pk, xs.map(_._2).sum) }
      .sortBy { case (pk, r) => (-r, pk) } // revenue DESC, key ASC
    val t = BigInt(rev.map(r => BigInt(r._2)).sum.toString)
    var cum = BigInt(0)
    val classed = rev.map { case (_, r) =>
      cum += r
      val cls =
        if (cum * 5 <= t * 4) "A" else if (cum * 20 <= t * 19) "B" else "C"
      (cls, BigInt(r))
    }
    val got = run("abc_classification").sortBy(_.getAs[String]("abc_class"))
    got.foreach { row =>
      val c = row.getAs[String]("abc_class")
      val mine = classed.filter(_._1 == c)
      assert(row.getAs[Long]("n_parts") == mine.size, c)
      val revSum = mine.map(_._2).sum
      assert(BigInt(row.getAs[Long]("revenue_cents")) == revSum, c)
      assert(BigInt(row.getAs[Long]("share_ppm")) == revSum * 1000000 / t, c)
    }
    assert(got.map(_.getAs[Long]("n_parts")).sum == rev.size)
  }

  // ---------------------------------------------------------------
  // lorenz_deciles — cumulative value share of the bottom d/10 users
  // ---------------------------------------------------------------
  test("lorenz_deciles matches the Lorenz curve by sorted accumulation") {
    val perUser = Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .select(col("user_id").cast("long"),
        round(col("value") * 100).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.map(xs => xs.map(_._2).sum).toSeq
    val hist = perUser.groupBy(identity).toSeq
      .map { case (x, xs) => (x, xs.size.toLong) }
      .sortBy(_._1)
    val n = BigInt(perUser.size)
    val tv = perUser.map(BigInt(_)).sum
    // cumulative (population, value) after each distinct value row
    var cp = BigInt(0)
    var cv = BigInt(0)
    val cum = hist.map { case (x, c) =>
      cp += c; cv += BigInt(x) * c; (cp, cv)
    }
    val got = run("lorenz_deciles").sortBy(_.getAs[Long]("decile"))
    assert(got.length == 10)
    got.zipWithIndex.foreach { case (r, i) =>
      val d = BigInt(i + 1)
      assert(r.getAs[Long]("decile") == i + 1)
      // last value row whose cumulative population ≤ d·n/10
      val q = cum.filter(_._1 * 10 <= n * d)
      assert(q.nonEmpty, s"decile $d empty")
      val (mp, mv) = q.last
      assert(BigInt(r.getAs[Long]("cum_pop_ppm")) == mp * 1000000 / n, d)
      assert(BigInt(r.getAs[Long]("cum_value_ppm")) == mv * 1000000 / tv, d)
    }
  }
}
