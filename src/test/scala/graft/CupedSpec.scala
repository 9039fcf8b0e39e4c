package graft

import graft.ops.Cuped
import org.apache.spark.sql.functions._

/** CUPED contract (q222): the adjustment shrinks variance and
  * tightens the test on a correlated crafted cohort, the
  * zero-covariate guard, and a from-scratch driver replay on the
  * real split. */
class CupedSpec extends SparkSpec {
  import spark.implicits._

  private def rnd(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("a predictive covariate slashes variance and tightens the z") {
    // matched pairs: baseline and noise depend only on the PAIR
    // index, so the covariate is exactly balanced across arms (the
    // CUPED assumption) and only the +2 lift separates them
    val users = (0 until 200).map { i =>
      val arm = i % 2
      val pair = i / 2
      val x = (pair % 10).toLong * 3     // heterogeneous baseline
      val y = x + (pair % 3).toLong + (if (arm == 1) 2L else 0L)
      (arm, x, y)
    }.toDF("arm", "x", "y")
    val r = Cuped.cupedOf(users).collect()(0)
    assert(!r.isNullAt(4), "theta must fit")
    assert(r.getDouble(4) > 0.9 && r.getDouble(4) < 1.1,
      s"theta ${r.getDouble(4)} should recover the unit slope")
    assert(r.getDouble(7) > 0.8,
      s"variance reduction ${r.getDouble(7)} should be large")
    assert(math.abs(r.getDouble(9)) > math.abs(r.getDouble(8)),
      "the adjusted test must be tighter than the raw one")
    // CUPED must not move the lift estimate itself (balanced x):
    assert(math.abs((r.getDouble(6) - r.getDouble(5))
      - (r.getDouble(3) - r.getDouble(2))) < 0.2)
  }

  test("zero covariate variance: theta and adjusted columns are NULL, raw stands") {
    val users = (0 until 40).map(i => (i % 2, 5L, (i % 4).toLong))
      .toDF("arm", "x", "y")
    val r = Cuped.cupedOf(users).collect()(0)
    assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6)
      && r.isNullAt(7) && r.isNullAt(9))
    assert(!r.isNullAt(8), "the raw z is unaffected")
  }

  test("degenerate outcome variance and 1-user arms yield NULL tests, not NaN") {
    // constant y in both arms: every variance is 0 → z undefined
    val flat = (0 until 40).map(i => (i % 2, (i % 5).toLong, 3L))
      .toDF("arm", "x", "y")
    val r = Cuped.cupedOf(flat).collect()(0)
    assert(r.isNullAt(7) && r.isNullAt(8) && r.isNullAt(9))
    // a single-user arm has no sample variance at all
    val tiny = Seq((0, 1L, 2L), (1, 3L, 4L), (1, 5L, 6L))
      .toDF("arm", "x", "y")
    val t = Cuped.cupedOf(tiny).collect()(0)
    assert(t.isNullAt(8) && t.isNullAt(9),
      "n0 = 1 leaves both z statistics undefined")
  }

  test("q222 replays from the collected per-user counts") {
    val ev = Tables.events(spark, sfDir)
    val epoch = ev.agg(min(to_date(col("ts")))).head().getDate(0)
      .toLocalDate
    val users = ev.select(col("user_id"), to_date(col("ts")).as("d"),
        col("event_type")).collect()
      .groupBy(_.getLong(0)).toSeq.map { case (uid, rows) =>
        val ps = rows.filter(_.getString(2) == "purchase")
        val x = ps.count(_.getDate(1).toLocalDate.toEpochDay
          < epoch.toEpochDay + Cuped.PrePeriodDays).toLong
        (uid % 2, x, ps.size.toLong - x)
      }
    val n = users.size.toDouble
    def s(f: ((Long, Long, Long)) => Long) = users.map(u => BigInt(f(u))).sum.toDouble
    val (sx, sy) = (s(_._2), s(_._3))
    val sxy = users.map(u => BigInt(u._2) * u._3).sum.toDouble
    val sxx = users.map(u => BigInt(u._2) * u._2).sum.toDouble
    val mx = rnd(sx / n, 9)
    val theta = rnd((n * sxy - sx * sy) / (n * sxx - sx * sx), 9)
    def cell(arm: Long) = {
      val m = users.filter(_._1 == arm)
      val na = m.size.toDouble
      val ys = m.map(_._3.toDouble)
      val ystars = m.map(u => u._3 - theta * (u._2 - mx))
      def d(vs: Seq[Double], sc: Int) = vs.map(BigDecimal(_)
        .setScale(sc, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      val (sya, syya) = (d(ys, 0), d(ys.map(v => v * v), 0))
      val (ssa, sssa) = (d(ystars, 12), d(ystars.map(v => v * v), 12))
      (na, sya / na, (syya - sya * sya / na) / (na - 1.0),
        ssa / na, (sssa - ssa * ssa / na) / (na - 1.0))
    }
    val (c0, c1) = (cell(0), cell(1))
    val r = Cuped.cupedReport(spark, sfDir).collect()(0)
    assert(r.getLong(0) === c0._1.toLong && r.getLong(1) === c1._1.toLong)
    assert(r.getDouble(2) === rnd(c0._2, 6) && r.getDouble(3) === rnd(c1._2, 6))
    assert(r.getDouble(4) === theta)
    assert(r.getDouble(5) === rnd(c0._4, 6) && r.getDouble(6) === rnd(c1._4, 6))
    assert(r.getDouble(7) === rnd(1.0 - (c0._5 + c1._5) / (c0._3 + c1._3), 6))
    assert(r.getDouble(8) === rnd((c1._2 - c0._2)
      / math.sqrt(c0._3 / c0._1 + c1._3 / c1._1), 6))
    assert(r.getDouble(9) === rnd((c1._4 - c0._4)
      / math.sqrt(c0._5 / c0._1 + c1._5 / c1._1), 6))
  }
}
