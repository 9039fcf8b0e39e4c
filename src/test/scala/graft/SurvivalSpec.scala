package graft

import graft.ops.Survival
import org.apache.spark.sql.functions._

/** Kaplan–Meier contract (q219): the product-limit definition on a
  * crafted cohort, the terminal-death zero path, monotonicity, and a
  * from-scratch driver replay on real data — with both churn and
  * censoring pinned non-vacuous. */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private def rnd(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Driver KM with the op's exact rounding (per-term round-9 ln,
    * decimal sum, exp, round-6; terminal d=n → 0 forever). */
  private def kmDriver(spans: Seq[(Long, Boolean)]): Seq[(Long, Long, Long, Long, Double)] = {
    val byDur = spans.groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = spans.size.toLong
    var lnSum = BigDecimal(0)
    var hitZero = false
    byDur.map { case (t, es) =>
      val d = es.count(_._2).toLong
      val c = es.size - d
      val row = if (d == atRisk) { hitZero = true; (t, atRisk, d, c, 0.0) }
      else {
        if (!hitZero && d > 0)
          lnSum += BigDecimal(rnd(math.log(1.0 - d.toDouble / atRisk), 9))
        else if (!hitZero && d == 0)
          lnSum += BigDecimal(rnd(math.log(1.0), 9))
        (t, atRisk, d, c,
          if (hitZero) 0.0 else rnd(math.exp(lnSum.toDouble), 6))
      }
      atRisk -= es.size
      row
    }
  }

  private def kmOf(spans: Seq[(Long, Boolean)]) =
    Survival.kmOf(spans.toDF("duration", "churned")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))

  test("product-limit definition on a crafted cohort incl. the terminal zero") {
    // t=1: 4 at risk, 1 death → 0.75; t=2: censor only → 0.75;
    // t=3: 2 at risk, 2 deaths → 0 (the d=n terminal path)
    val spans = Seq((1L, true), (2L, false), (3L, true), (3L, true))
    val got = kmOf(spans)
    assert(got.toSeq === kmDriver(spans))
    assert(got.map(_._5).toSeq === Seq(
      rnd(math.exp(rnd(math.log(0.75), 9)), 6),
      rnd(math.exp(rnd(math.log(0.75), 9)), 6), 0.0))
  }

  test("q219 replays from collected spans; both KM paths are non-vacuous") {
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
    val horizonDay = ev.agg(max(to_date(col("ts")))).head().getDate(0)
    val spans = ev.groupBy(col("user_id")).agg(
      to_date(min(col("ts"))).as("f"), to_date(max(col("ts"))).as("l"))
      .collect().map { r =>
        val dur = (r.getDate(2).toLocalDate.toEpochDay
          - r.getDate(1).toLocalDate.toEpochDay)
        val gap = (horizonDay.toLocalDate.toEpochDay
          - r.getDate(2).toLocalDate.toEpochDay)
        (dur, gap > Survival.ChurnGapDays)
      }
    // the real query's duration is Spark datediff's INT — normalize
    val got = Survival.kaplanMeier(spark, sfDir)
      .select(col("duration").cast("long"), col("n_risk"),
        col("n_churned"), col("n_censored"), col("survival"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq === kmDriver(spans.toSeq))
    // the vacuity pin: the fixture must exercise BOTH paths
    assert(got.map(_._3).sum > 0, "some users churn")
    assert(got.map(_._4).sum > 0, "some lifetimes are censored")
    // survival is monotone nonincreasing in [0, 1], starting from all
    val s = got.map(_._5)
    assert(s.zip(s.drop(1)).forall { case (a, b) => b <= a + 1e-9 })
    assert(s.forall(v => v >= 0.0 && v <= 1.0))
    assert(got.head._2 === spans.length.toLong)
  }
}
