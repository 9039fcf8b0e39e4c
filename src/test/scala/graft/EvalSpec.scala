package graft

import graft.ops.Eval

/** ROC-AUC (q185): the rank-sum identity proven against the P·N
  * pair-counting definition (brute force), tie handling, the
  * boundary values, and the report's class balance on testdata. */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def auc(labeled: (Double, Boolean)*): Double = {
    val df = labeled.zipWithIndex
      .map { case ((s, p), i) => (i.toLong, s, p, "x") }
      .toSeq.toDF("doc_id", "score", "pos", "stratum")
    Eval.aucByStratum(df).collect().head.getAs[Double]("auc")
  }

  /** The definition: P(score_pos > score_neg) + 0.5·P(tie). */
  private def aucPairs(labeled: Seq[(Double, Boolean)]): Double = {
    val pos = labeled.filter(_._2).map(_._1)
    val neg = labeled.filterNot(_._2).map(_._1)
    val s = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    BigDecimal(s / (pos.length * neg.length))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("perfect separation = 1, inverted = 0, coin flip on ties = 0.5") {
    assert(auc((0.9, true), (0.8, true), (0.2, false), (0.1, false)) == 1.0)
    assert(auc((0.1, true), (0.2, true), (0.8, false), (0.9, false)) == 0.0)
    assert(auc((0.5, true), (0.5, false), (0.5, true), (0.5, false)) == 0.5)
  }

  test("rank-sum equals the P·N pair definition on mixed tie sets") {
    val cases = Seq(
      Seq((0.3, true), (0.3, false), (0.7, true), (0.1, false), (0.7, false)),
      Seq((0.5, true), (0.2, false), (0.5, false), (0.9, true), (0.2, true),
        (0.2, false), (0.8, false)),
      Seq((1.0, true), (0.0, false), (0.5, true), (0.5, false), (0.5, true)))
    cases.foreach { c =>
      assert(auc(c: _*) == aucPairs(c), s"mismatch on $c")
    }
  }

  test("strata are independent: each stratum ranks only its own scores") {
    val df = Seq(
      (1L, 0.9, true, "a"), (2L, 0.1, false, "a"),   // a: perfect
      (3L, 0.1, true, "b"), (4L, 0.9, false, "b"))   // b: inverted
      .toDF("doc_id", "score", "pos", "stratum")
    val got = Eval.aucByStratum(df).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("auc")).toMap
    assert(got == Map("a" -> 1.0, "b" -> 0.0))
  }

  test("report: _all row pools the langs; counts add up; auc in [0,1]") {
    val rows = Eval.aucReport(spark, sfDir).collect()
    val all = rows.find(_.getString(0) == "_all").get
    val langs = rows.filterNot(_.getString(0) == "_all")
    assert(langs.nonEmpty)
    assert(langs.map(_.getLong(1)).sum == all.getLong(1))
    assert(langs.map(_.getLong(2)).sum == all.getLong(2))
    rows.foreach { r =>
      val a = r.getAs[Double]("auc")
      assert(a >= 0.0 && a <= 1.0)
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3))
    }
  }
}
