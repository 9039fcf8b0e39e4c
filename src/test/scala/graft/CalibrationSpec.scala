package graft

import graft.ops.{Bayes, Calibration, Curation}

/** Calibration audit (q189): driver replay of the decile/Brier math
  * off the query's own per-doc scores, bin-edge conventions, and the
  * Brier decomposition identity (total = Σ bin sums). */
class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  private def round(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q189 equals a driver replay over the scored docs") {
    val scored = Curation.scoreDocs(Tables.documents(spark, sfDir))
      .select($"doc_id", $"source", $"score")
      .as[(Long, String, Double)].collect().toSeq
    val rows = scored.map { case (_, src, score) =>
      val pos = Bayes.CuratedSources.contains(src)
      val bin = math.min(math.floor(score * 10).toInt, 9)
      val err = round((score - (if (pos) 1.0 else 0.0))
        * (score - (if (pos) 1.0 else 0.0)), 9)
      (bin, score, pos, err)
    }
    val expected = rows.groupBy(_._1).map { case (bin, rs) =>
      val n = rs.size
      val meanPred = round(rs.map(r => BigDecimal(r._2).setScale(6)).sum
        .toDouble / n, 6)
      val obsRate = round(rs.count(_._3).toDouble / n, 6)
      val brier = round(rs.map(r => BigDecimal(r._4).setScale(12)).sum
        .toDouble, 6)
      (bin, n.toLong, meanPred, obsRate, brier, round(meanPred - obsRate, 6))
    }.toSeq.sortBy(_._1)
    val got = Calibration.reliabilityReport(spark, sfDir)
      .as[(Int, Long, Double, Double, Double, Double)].collect().toSeq
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("bins partition the corpus: counts sum to all scored docs") {
    val got = Calibration.reliabilityReport(spark, sfDir).collect()
    val scored = Curation.scoreDocs(Tables.documents(spark, sfDir)).count()
    assert(got.map(_.getLong(1)).sum == scored)
    assert(got.forall(r => r.getInt(0) >= 0 && r.getInt(0) <= 9))
  }
}
