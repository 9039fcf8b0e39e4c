package graft

import graft.ops.DpRelease
import org.apache.spark.sql.functions._

/** DP count release (q179): driver replay of the seeded Laplace
  * inverse CDF, and the calibration property (noise scale tracks
  * 1/ε across the sweep).
  */
class DpReleaseSpec extends SparkSpec {
  import spark.implicits._

  private def laplaceNoise(key: String, eps: Double): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    val hex = md.map(b => f"${b & 0xff}%02x").mkString.take(13)
    val u = java.lang.Long.parseLong(hex, 16) / math.pow(2.0, 52)
    val raw = -(1.0 / eps) * math.signum(u - 0.5) *
      math.log(1.0 - 2.0 * math.abs(u - 0.5))
    BigDecimal(raw).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("q179 equals a from-scratch seeded-Laplace replay") {
    val truth = Tables.customer(spark, sfDir)
      .groupBy($"c_nationkey".cast("long").as("nation"),
        $"c_mktsegment".as("segment"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, String, Long)].collect()
      .map { case (na, sg, n) => (na, sg) -> n }.toMap
    val got = DpRelease.dpCountRelease(spark, sfDir)
      .as[(String, Long, String, Double)].collect().toSeq
    assert(got.size == truth.size * DpRelease.Epsilons.size)
    got.foreach { case (eps, na, sg, released) =>
      val n = truth((na, sg))
      val want = BigDecimal(n + laplaceNoise(s"$na|$sg|$eps", eps.toDouble))
        .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(released === want, s"group ($na,$sg) eps=$eps")
    }
  }

  test("noise scale tracks 1/eps and both signs occur") {
    val truth = Tables.customer(spark, sfDir)
      .groupBy($"c_nationkey".cast("long").as("nation"),
        $"c_mktsegment".as("segment"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, String, Long)].collect()
      .map { case (na, sg, n) => (na, sg) -> n }.toMap
    val byEps = DpRelease.dpCountRelease(spark, sfDir)
      .as[(String, Long, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map { case (_, na, sg, r) =>
        r - truth((na, sg)) }).toMap
    val meanAbs = byEps.view.mapValues(ns =>
      ns.map(math.abs).sum / ns.length).toMap
    // E|Laplace(b)| = b = 1/eps: the 0.1 sweep must be ~10x noisier
    assert(meanAbs("0.1") > 3 * meanAbs("1.0"),
      s"calibration broken: $meanAbs")
    byEps.values.foreach { ns =>
      assert(ns.exists(_ > 0) && ns.exists(_ < 0), "one-sided noise")
    }
  }
}
