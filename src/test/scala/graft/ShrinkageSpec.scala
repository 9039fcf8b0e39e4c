package graft

import graft.ops.{Curation, Shrinkage}
import org.apache.spark.sql.functions._

/** EB shrinkage contract (q221): pull-toward-the-pool property,
  * sample-size monotonicity, the degenerate-fit NULL guard, and a
  * from-scratch driver replay on real data. */
class ShrinkageSpec extends SparkSpec {
  import spark.implicits._

  private def rnd(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def eb(cells: Seq[(String, Long, Long)]) =
    Shrinkage.ebOf(cells.toDF("stratum", "n", "k")).collect()

  test("shrinkage pulls every stratum toward the pool; small n shrinks more") {
    val out = eb(Seq(("lo", 10L, 2L), ("hi", 10L, 8L),
      ("big_lo", 1000L, 200L), ("mid", 100L, 50L)))
    val m = out.head.getDouble(4)
    for (r <- out) {
      assert(!r.isNullAt(7), "fit must succeed on dispersed rates")
      val (raw, shrunk) = (r.getDouble(3), r.getDouble(7))
      assert(math.abs(shrunk - m) <= math.abs(raw - m) + 1e-9,
        s"${r.getString(0)}: shrinkage must move toward the pooled mean")
    }
    // same raw rate, different n: the small sample must shrink MORE
    val lo = out.find(_.getString(0) == "lo").get
    val bigLo = out.find(_.getString(0) == "big_lo").get
    assert(lo.getDouble(3) === bigLo.getDouble(3))
    assert(math.abs(lo.getDouble(7) - m) < math.abs(bigLo.getDouble(7) - m),
      "n=10 at rate 0.2 must end closer to the pool than n=1000")
  }

  test("degenerate dispersion (identical rates) yields NULL, raw stands") {
    val out = eb(Seq(("a", 10L, 5L), ("b", 100L, 50L), ("c", 40L, 20L)))
    for (r <- out) {
      assert(r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(7),
        "zero between-strata variance has no moment fit")
      assert(r.getDouble(3) === 0.5)
    }
  }

  test("q221 replays from the collected keep counts") {
    val cells = Curation.scoreDocs(Tables.documents(spark, sfDir))
      .groupBy(col("source")).agg(count(lit(1)).as("n"),
        sum(when(col("score") >= 0.5, 1L).otherwise(0L)).as("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val rates = cells.map { case (_, n, k) => rnd(k.toDouble / n, 6) }
    val s = rates.size.toDouble
    def dsum(vs: Seq[Double], sc: Int) = vs.map(BigDecimal(_)
      .setScale(sc, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val sr = dsum(rates, 6)
    val srr = dsum(rates.map(r => r * r), 12)
    val m = sr / s
    val v = (srr - sr * sr / s) / (s - 1.0)
    val fit = if (v > 0.0 && v < m * (1.0 - m))
      Some((rnd((m * (1.0 - m) / v - 1.0) * m, 9),
        rnd((m * (1.0 - m) / v - 1.0) * (1.0 - m), 9)))
    else None
    val want = cells.map { case (src, n, k) =>
      val raw = rnd(k.toDouble / n, 6)
      (src, n, k, raw, rnd(m, 6),
        fit.map(_._1), fit.map(_._2),
        fit.map { case (a, b) => rnd((k + a) / (n + a + b), 6) })
    }
    def opt(r: org.apache.spark.sql.Row, i: Int) =
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    val got = Shrinkage.ebKeepRates(spark, sfDir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), opt(r, 5), opt(r, 6), opt(r, 7)))
    assert(got.toSeq === want.toSeq)
    assert(want.exists(_._8.nonEmpty),
      "the real corpus must produce a usable fit")
  }
}
