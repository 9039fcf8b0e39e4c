package graft

import graft.ops.{Bayes, CrossVal}

/** K-fold NB cross-validation (q188): from-scratch driver replay of
  * the leave-fold-out-by-subtraction training (independent
  * tokenizer/hash/rounding paths), the held-out property (fold f's
  * model must equal a model trained directly on the other folds),
  * and fold accounting. */
class CrossValSpec extends SparkSpec {
  import spark.implicits._

  private def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }
  private def tok(s: String): Seq[String] =
    s.toLowerCase.split("[^a-z0-9_]+").filter(_.nonEmpty).toSeq
  private def round(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Direct (non-subtraction) training on the folds != f, then
    * scoring fold f — the definitionally-held-out replay the
    * subtraction trick must equal. */
  private def replay(): Seq[(Long, Long, Long, Double, Double, Double)] = {
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect().toSeq
    val toks = docs.flatMap { case (id, src, text) =>
      tok(text).map(t => (id, id % CrossVal.K,
        Bayes.CuratedSources.contains(src), (hash60(t) % Bayes.Bins).toInt))
    }
    (0L until CrossVal.K.toLong).map { f =>
      val train = toks.filter(_._2 != f)
      val counts = train.groupBy(t => (t._3, t._4))
        .map { case (k, v) => k -> v.size.toLong }
      val totals = train.groupBy(_._3).map { case (k, v) => k -> v.size.toLong }
      val lp = (for { c <- Seq(true, false); b <- 0 until Bayes.Bins }
        yield (c, b) -> round(math.log(
          (counts.getOrElse((c, b), 0L) + 1.0)
            / (totals.getOrElse(c, 0L) + Bayes.Bins.toDouble)), 9)).toMap
      val w = (0 until Bayes.Bins)
        .map(b => b -> (lp((true, b)) - lp((false, b)))).toMap
      val heldOut = toks.filter(_._2 == f)
      val perDoc = heldOut.groupBy(_._1).map { case (id, ts) =>
        val s = ts.map(t => BigDecimal(w(t._4)).setScale(12,
          BigDecimal.RoundingMode.HALF_UP)).sum
        (id, ts.head._3, round(s.toDouble / ts.size, 6))
      }.toSeq
      val kept = perDoc.count(_._3 > 0.0)
      val correct = perDoc.count(d => (d._3 > 0.0) == d._2)
      val avg = perDoc.map(d => BigDecimal(d._3).setScale(6,
        BigDecimal.RoundingMode.HALF_UP)).sum
      (f, perDoc.size.toLong, kept.toLong,
        round(kept.toDouble / perDoc.size, 6),
        round(avg.toDouble / perDoc.size, 6),
        round(correct.toDouble / perDoc.size, 6))
    }
  }

  test("q188 equals a direct held-out driver replay (subtraction ≡ retraining)") {
    val got = CrossVal.nbCrossVal(spark, sfDir)
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got === replay())
    assert(got.size == CrossVal.K)
  }

  test("fold accounting: every scored doc appears in exactly one fold") {
    val got = CrossVal.nbCrossVal(spark, sfDir).collect()
    val totalScored = got.map(_.getLong(1)).sum
    val docsWithToks = Tables.documents(spark, sfDir)
      .select($"text").as[String].collect()
      .count(t => tok(t).nonEmpty)
    assert(totalScored == docsWithToks)
  }
}
