package graft

import graft.streaming.LateDrop
import org.apache.spark.sql.functions._

/** Watermark late drops (q197): the replay's kept/dropped split is
  * visible in the answer — windows behind the watermark carry
  * single counts (the late redelivery was dropped), still-open
  * windows double-count, and nothing re-emits twice. */
class LateDropSpec extends SparkSpec {
  // sf0.001's event density can't fill the 40-min late slice
  private val dir = "/root/testdata/sf0.01"

  test("dropped late rows leave old windows single-counted; kept ones double-count") {
    import spark.implicits._
    val out = LateDrop.streamedLateDrops(spark, dir)
      .as[(java.sql.Timestamp, String, Long)].collect()
    assert(out.nonEmpty)
    // no (window, type) group may appear twice in the append sink —
    // a re-emission would mean a dropped row actually updated state
    val keys = out.map(r => (r._1, r._2))
    assert(keys.distinct.length == keys.length,
      "append sink re-emitted a window: late rows updated evicted state")
    // total counted rows = all events + the max-row redelivery +
    // kept late rows (in (max-10min, max]) — strictly more than the
    // base table (the kept path ran), strictly less than base +
    // whole slice (the drop path ran)
    val ev = Tables.events(spark, dir)
    val base = ev.count()
    val mx = ev.agg(max($"ts")).collect()(0).getTimestamp(0)
    val slice = ev.filter($"ts" >=
      new java.sql.Timestamp(mx.getTime - 40 * 60 * 1000)).count()
    val total = out.map(_._3).sum
    assert(total > base, "kept late rows must double-count")
    assert(total < base + slice,
      "some late rows must have been dropped")
    // the advance row must be invisible (its window never closes)
    assert(!out.exists(_._2 == "advance"))
  }
}
