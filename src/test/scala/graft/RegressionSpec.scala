package graft

import graft.ops.{Curation, Regression}
import org.apache.spark.sql.functions._

/** Grouped-OLS contract (q208): exact recovery of a planted line,
  * degenerate-variance null guards, and a from-scratch driver replay
  * of the moment sums and closed forms. */
class RegressionSpec extends SparkSpec {
  import spark.implicits._

  private def rnd(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("a planted exact line is recovered: slope, intercept, r2 = 1") {
    // x and y binary-exact so the moment math has zero rounding play
    val xy = Seq(
      ("a", 0.5, 2.0), ("a", 1.0, 3.0), ("a", 1.5, 4.0), ("a", 2.0, 5.0))
      .toDF("source", "x", "y")
    val r = Regression.olsOf(xy).collect()
    assert(r.length === 1)
    assert(r(0).getDouble(2) === 2.0)   // slope: y = 2x + 1
    assert(r(0).getDouble(3) === 1.0)   // intercept
    assert(r(0).getDouble(4) === 1.0)   // r2
  }

  test("constant x yields null slope/intercept/r2, constant y yields r2 null") {
    val xy = Seq(("cx", 1.0, 2.0), ("cx", 1.0, 5.0),
      ("cy", 1.0, 3.0), ("cy", 2.0, 3.0)).toDF("source", "x", "y")
    val rows = Regression.olsOf(xy).collect().map(r => r.getString(0) -> r).toMap
    assert(rows("cx").isNullAt(2) && rows("cx").isNullAt(3) && rows("cx").isNullAt(4))
    // constant y: slope 0 and intercept defined, but r2 is 0/0 → null
    assert(rows("cy").getDouble(2) === 0.0)
    assert(rows("cy").getDouble(3) === 3.0)
    assert(rows("cy").isNullAt(4))
  }

  test("q208 matches a from-scratch driver replay of the moment sums") {
    val pts = Curation.scoredPoints(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    // (source, n_chars, score); x/y exactly as the op derives them
    val bySrc = pts.groupBy(_._1)
    val want = bySrc.toSeq.sortBy(_._1).map { case (src, rows) =>
      val xs = rows.map { case (_, nc, _) => rnd(math.log(1.0 + nc), 9) }
      val ys = rows.map(_._3)
      def dsum(vs: Seq[Double], scale: Int): Double =
        vs.map(v => BigDecimal(v).setScale(scale,
          BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      val n = rows.size.toDouble
      val sx = dsum(xs, 9); val sy = dsum(ys, 6)
      val sxy = dsum(xs.zip(ys).map { case (a, b) => a * b }, 15)
      val sxx = dsum(xs.map(a => a * a), 18)
      val syy = dsum(ys.map(b => b * b), 12)
      val cov = n * sxy - sx * sy
      val varX = n * sxx - sx * sx
      val varY = n * syy - sy * sy
      val slope = cov / varX
      (src, rows.size.toLong, rnd(slope, 6),
        rnd((sy - slope * sx) / n, 6),
        rnd(cov * cov / (varX * varY), 6))
    }
    val got = Regression.olsTrend(spark, sfDir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.toSeq === want)
  }
}
