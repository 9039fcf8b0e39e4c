package graft

import graft.ops.Zorder
import org.apache.spark.sql.functions._

/** Z-order layout properties (q91). The spec runs at sf0.01 — the
  * default sf0.001 slice has only 15 users, so the box predicates
  * would select nothing.
  */
class ZorderSpec extends SparkSpec {
  private val sf001 = "/root/testdata/sf0.01"

  test("morton interleave is a bijection on the 16-bit grid") {
    import spark.implicits._
    val grid = spark.range(1 << 11).select(col("id").as("x"))
      .crossJoin(spark.range(1 << 5).select(col("id").as("y")))
    val n = grid.select(Zorder.morton(col("x"), col("y")).as("z"))
      .agg(countDistinct($"z").cast("long").as("d"),
        max($"z").as("mx"), min($"z").as("mn"))
      .collect().head
    assert(n.getAs[Long]("d") === (1L << 16))
    assert(n.getAs[Long]("mn") === 0L && n.getAs[Long]("mx") === (1L << 16) - 1)
  }

  test("z-order is never the worst layout and tracks the per-box winner") {
    val rows = Zorder.zorderLayout(spark, sf001).collect()
      .map(r => (r.getAs[String]("layout"), r.getAs[String]("box")) ->
        r.getAs[Double]("touch_ratio")).toMap
    Zorder.Boxes.map(_._1).foreach { box =>
      val z = rows(("zorder", box))
      val linear = Seq(rows(("user_major", box)), rows(("time_major", box)))
      assert(z <= linear.max,
        s"$box: zorder $z worse than worst linear ${linear.max}")
      assert(z <= 2.0 * linear.min,
        s"$box: zorder $z not within 2x of best linear ${linear.min}")
    }
    // each linear layout must be catastrophic on its adversarial box
    assert(rows(("user_major", "wide_users")) >
      1.5 * rows(("zorder", "wide_users")))
    assert(rows(("time_major", "wide_days")) >
      1.5 * rows(("zorder", "wide_days")))
  }
}
