package graft

import graft.ops.AbTest
import org.apache.spark.sql.functions._

/** Two-proportion z-test contract (q220): the pooled formula on
  * crafted cells, the degenerate-variance guard, and a driver replay
  * of the real split — pinned non-degenerate. */
class AbTestSpec extends SparkSpec {
  import spark.implicits._

  private def rnd(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def zDriver(n0: Long, c0: Long, n1: Long, c1: Long): Double = {
    val r0 = c0.toDouble / n0; val r1 = c1.toDouble / n1
    val p = (c0 + c1).toDouble / (n0 + n1)
    (r1 - r0) / math.sqrt(p * (1.0 - p) * (1.0 / n0 + 1.0 / n1))
  }

  private def cellsDf(n0: Int, c0: Int, n1: Int, c1: Int) =
    (Seq.fill(c0)((0, 1)) ++ Seq.fill(n0 - c0)((0, 0))
      ++ Seq.fill(c1)((1, 1)) ++ Seq.fill(n1 - c1)((1, 0)))
      .toDF("arm", "conv")

  test("pooled z on crafted cells matches the formula; sign follows the lift") {
    val r = AbTest.zTestOf(cellsDf(100, 50, 100, 70)).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))
      === ((100L, 50L, 100L, 70L)))
    assert(r.getDouble(7) === rnd(zDriver(100, 50, 100, 70), 6))
    assert(r.getDouble(7) > 0 && r.getBoolean(8),
      "a 20-point lift on n=100 arms is significant")
    val flipped = AbTest.zTestOf(cellsDf(100, 70, 100, 50)).collect()(0)
    assert(flipped.getDouble(7) === -r.getDouble(7))
    // a tiny lift on small arms is NOT significant
    val weak = AbTest.zTestOf(cellsDf(50, 25, 50, 27)).collect()(0)
    assert(!weak.getBoolean(8))
  }

  test("degenerate pooled variance (all or none convert) yields NULL, not NaN") {
    for (df <- Seq(cellsDf(10, 10, 10, 10), cellsDf(10, 0, 10, 0))) {
      val r = AbTest.zTestOf(df).collect()(0)
      assert(r.isNullAt(7) && r.isNullAt(8))
    }
  }

  test("q220 replays from the collected purchase counts; the real split is non-degenerate") {
    val counts = Tables.events(spark, sfDir)
      .groupBy(col("user_id")).agg(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nu = counts.length.toLong
    val t = counts.map(_._2).sum
    def cell(arm: Long) = {
      val mine = counts.filter(_._1 % 2 == arm)
      (mine.length.toLong, mine.count(u => u._2 * nu > t).toLong)
    }
    val ((n0, c0), (n1, c1)) = (cell(0), cell(1))
    val r = AbTest.abTest(spark, sfDir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))
      === ((n0, c0, n1, c1)))
    assert(r.getDouble(2) === rnd(c0.toDouble / n0, 6))
    assert(r.getDouble(5) === rnd(c1.toDouble / n1, 6))
    assert(!r.isNullAt(7), "the real split must exercise the statistic")
    assert(r.getDouble(7) === rnd(zDriver(n0, c0, n1, c1), 6))
    assert(c0 + c1 > 0 && c0 + c1 < n0 + n1,
      "conversion must be neither empty nor universal")
  }
}
