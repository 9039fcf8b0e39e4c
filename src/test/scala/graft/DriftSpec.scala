package graft

import graft.ops.{Curation, Drift}
import org.apache.spark.sql.functions._

/** PSI drift (q190): driver replay of the smoothed-share PSI off the
  * two snapshot generations' own scores, the grid completeness, and
  * PSI's sanity properties (identical distributions → 0). */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def round(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q190 equals a driver replay over the generations' scores") {
    val d = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"text")
    val oldScores = Curation.scoreDocs(d.filter(pmod($"doc_id", lit(5)) =!= 0))
      .select($"score").as[Double].collect()
    val newScores = Curation.scoreDocs(d.select($"doc_id", $"source",
      when(pmod($"doc_id", lit(7)) === 0, concat($"text", lit(" v2")))
        .otherwise($"text").as("text")))
      .select($"score").as[Double].collect()
    def bins(xs: Array[Double]): Map[Int, Long] =
      xs.groupBy(s => math.min(math.floor(s * 10).toInt, 9))
        .map { case (b, v) => b -> v.length.toLong }
    val ob = bins(oldScores); val nb = bins(newScores)
    val tOld = oldScores.length.toLong; val tNew = newScores.length.toLong
    val expected = (0 until 10).map { b =>
      val no = ob.getOrElse(b, 0L); val nn = nb.getOrElse(b, 0L)
      val pOld = (no + 1).toDouble / (tOld + 10).toDouble
      val pNew = (nn + 1).toDouble / (tNew + 10).toDouble
      (b, no, nn, round(pOld, 6), round(pNew, 6),
        round((pNew - pOld) * round(math.log(pNew / pOld), 9), 9))
    }
    val got = Drift.psiReport(spark, sfDir)
      .as[(Int, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got === expected)
    assert(got.size == 10, "the decile grid must be complete")
  }

  test("identical generations give PSI exactly 0 in every bin") {
    // ln(p/p) = 0 bin-wise — replay the formula against itself
    val counts = Seq(5L, 0L, 17L, 3L)
    val t = counts.sum
    counts.foreach { n =>
      val p = (n + 1).toDouble / (t + 10).toDouble
      assert(round((p - p) * round(math.log(p / p), 9), 9) == 0.0)
    }
  }
}
