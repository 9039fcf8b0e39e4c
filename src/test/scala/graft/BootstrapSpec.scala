package graft

import graft.ops.{Bootstrap, Curation}
import org.apache.spark.sql.functions._

/** Poisson-bootstrap contract (q211): the seeded draw replays
  * bit-exactly in the driver, weights follow the Poisson(1) CDF, and
  * the published CI replays from the definitional resampling. */
class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  private def rnd(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Driver twin of the engine's seeded Poisson draw. */
  private def weightOf(key: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(13)
    val u = java.lang.Long.parseLong(hex, 16) / math.pow(2.0, 52)
    val k = Bootstrap.PoissonCdf.indexWhere(u < _)
    if (k < 0) Bootstrap.PoissonCdf.size else k
  }

  test("engine draw matches the driver md5 twin on 1000 keys") {
    val keys = (0 until 1000).map(i => s"$i|7")
    val got = keys.toDF("k")
      .select(Bootstrap.poissonW(Bootstrap.seededU(col("k"))))
      .as[Int].collect().toSeq
    assert(got === keys.map(weightOf))
  }

  test("weights are Poisson(1)-shaped: mean ~ 1, P(0) ~ 1/e") {
    val n = 20000
    val ws = (0 until n).map(i => weightOf(s"doc$i|0"))
    val mean = ws.sum.toDouble / n
    assert(math.abs(mean - 1.0) < 0.03, s"weight mean $mean drifted from 1")
    val p0 = ws.count(_ == 0).toDouble / n
    assert(math.abs(p0 - math.exp(-1)) < 0.02, s"P(w=0)=$p0 vs 1/e")
    assert(ws.max <= Bootstrap.PoissonCdf.size, "capped tail")
  }

  test("q211 replays from the definitional resampling, and CIs are sane") {
    val base = Curation.scoreDocs(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("source"), col("score")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val want = base.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, rows) =>
      val meanScore = rnd(rows.map(r => BigDecimal(r._3).setScale(6,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / rows.size, 6)
      val mbs = (0 until Bootstrap.B).flatMap { b =>
        val ws = rows.map(r => (r._3, weightOf(s"${r._1}|$b")))
        val nw = ws.map(_._2).sum
        if (nw == 0) None
        else Some(rnd(ws.map { case (s, w) => BigDecimal(s).setScale(6,
          BigDecimal.RoundingMode.HALF_UP) * w }.sum.toDouble / nw, 9))
      }
      // exact (n-1)p interpolation percentile — the q46 semantics
      def pct(p: Double): Double = {
        val s = mbs.sorted
        val idx = (s.size - 1) * p
        val lo = idx.toInt
        val frac = idx - lo
        if (lo + 1 >= s.size) s(lo) else s(lo) + frac * (s(lo + 1) - s(lo))
      }
      val nr = mbs.size.toDouble
      val sm = mbs.map(BigDecimal(_).setScale(9,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      val smm = mbs.map(m => BigDecimal(m * m).setScale(18,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      val se = rnd(math.sqrt((nr * smm - sm * sm) / (nr * (nr - 1.0))), 6)
      (src, rows.size.toLong, meanScore, rnd(pct(0.025), 6),
        rnd(pct(0.975), 6), se)
    }
    val got = Bootstrap.bootstrapCi(spark, sfDir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq === want)
    for ((_, _, mean, lo, hi, se) <- got) {
      assert(lo <= hi && se > 0.0)
      assert(mean >= lo - 10 * se && mean <= hi + 10 * se,
        "point estimate must sit near its own CI")
    }
  }
}
