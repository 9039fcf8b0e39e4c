package graft

import graft.ops.RobustStats
import org.apache.spark.sql.functions._

/** Robust-mean contract (q212): hand-checked winsorize/trim cases
  * (boundary values KEPT), a driver replay on real data, and the
  * winsorized-between property. */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  private def rnd(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hand case: asymmetric outlier moves raw but not trimmed mean") {
    // 1..99 plus a huge outlier: p05/p95 via (n-1)p interpolation
    val vals = ((1 to 99).map(_.toDouble) :+ 10000.0)
    val out = RobustStats.robustMeansOf(
      vals.map(("t", _)).toDF("event_type", "value")).collect()
    assert(out.length === 1)
    val r = out(0)
    val n = 100
    val sorted = vals.sorted
    def pct(p: Double): Double = {
      val idx = (n - 1) * p; val lo = idx.toInt; val f = idx - lo
      sorted(lo) + f * (sorted(lo + 1) - sorted(lo))
    }
    val p05 = rnd(pct(0.05), 6); val p95 = rnd(pct(0.95), 6)
    assert(r.getDouble(3) === p05 && r.getDouble(4) === p95)
    val raw = vals.sum / n
    assert(r.getDouble(2) === rnd(raw, 6))
    val trimmed = vals.filter(v => v >= p05 && v <= p95)
    assert(r.getDouble(6) === rnd(trimmed.sum / trimmed.size, 6))
    val winsor = vals.map(v => math.max(p05, math.min(p95, v)))
    assert(r.getDouble(5) === rnd(winsor.sum / n, 6))
    assert(r.getLong(7) === (n - trimmed.size).toLong)
    // the outlier dominates raw, not the robust centers (their
    // relative order is data-dependent — no claim between them)
    assert(r.getDouble(2) > r.getDouble(5) && r.getDouble(2) > r.getDouble(6))
  }

  test("boundary values equal to a cutoff are kept and unclamped") {
    // 21 values 0..20: p05 = 1.0 exactly, p95 = 19.0 exactly
    val vals = (0 to 20).map(_.toDouble)
    val r = RobustStats.robustMeansOf(
      vals.map(("t", _)).toDF("event_type", "value")).collect()(0)
    assert(r.getDouble(3) === 1.0 && r.getDouble(4) === 19.0)
    // kept band includes BOTH endpoints: 1..19 → 19 values, trims 2
    assert(r.getLong(7) === 2L)
    assert(r.getDouble(6) === rnd((1 to 19).sum.toDouble / 19, 6))
  }

  test("q212 replays from collected values, and winsor sits between") {
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, vs0) =>
      val vs = vs0.map(_._2)
      val sorted = vs.sorted
      def pct(p: Double): Double = {
        val idx = (sorted.size - 1) * p; val lo = idx.toInt; val f = idx - lo
        if (lo + 1 >= sorted.size) sorted(lo)
        else sorted(lo) + f * (sorted(lo + 1) - sorted(lo))
      }
      val p05 = rnd(pct(0.05), 6); val p95 = rnd(pct(0.95), 6)
      def dmean(xs: Seq[Double]): Double =
        rnd(xs.map(BigDecimal(_).setScale(10,
          BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / xs.size, 6)
      val band = vs.filter(v => v >= p05 && v <= p95)
      (t, vs.size.toLong, dmean(vs.toSeq), p05, p95,
        dmean(vs.map(v => math.max(p05, math.min(p95, v))).toSeq),
        dmean(band.toSeq), (vs.size - band.size).toLong)
    }
    val got = RobustStats.robustMeans(spark, sfDir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getLong(7)))
    assert(got.toSeq === want)
  }
}
