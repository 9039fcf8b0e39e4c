package graft

import graft.streaming.WindowedStats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

case class TimedEvent(ts: Timestamp, event_type: String)

class WindowedStatsSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Int) = new Timestamp(min * 60000L)

  test("watermarked tumbling window emits once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TimedEvent]
    val q = WindowedStats.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append").start()
    try {
      // three events inside window [0, 5)
      mem.addData(TimedEvent(t(1), "view"), TimedEvent(t(2), "view"),
        TimedEvent(t(3), "click"))
      q.processAllAvailable()
      // nothing emitted yet: watermark hasn't passed window end
      assert(spark.table("win_counts").count() === 0)
      // an event 20 min later pushes the watermark past [0, 5)
      mem.addData(TimedEvent(t(20), "view"))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .orderBy("w_start", "event_type").collect()
      assert(rows.map(r => (r.getTimestamp(0).getTime / 60000,
        r.getString(1), r.getLong(2))).toSeq ===
        Seq((0L, "click", 1L), (0L, "view", 2L)))
    } finally q.stop()
  }

  test("declared q159 e2e equals the closed-form emission rule") {
    import org.apache.spark.sql.functions._
    val res = WindowedStats.streamedWindowCounts(spark, sfDir)
      .as[(Timestamp, String, Long)].collect().toSeq
    // batch replay of the append-mode publication boundary: 5-min
    // epoch buckets; watermark = floor-to-ms(max ts) - 10 min;
    // window published iff end <= watermark
    val ev = Tables.events(spark, sfDir)
      .select(col("ts"), col("event_type"))
      .as[(Timestamp, String)].collect()
    val maxUs = ev.map(e => e._1.getTime * 1000
      + (e._1.getNanos / 1000) % 1000).max
    val wmUs = (maxUs / 1000 - 600000L) * 1000
    val expect = ev.groupBy { case (ts, et) =>
        val us = ts.getTime * 1000 + (ts.getNanos / 1000) % 1000
        (us / 300000000L, et)
      }
      .collect { case ((w, et), xs) if (w + 1) * 300000000L <= wmUs =>
        (new Timestamp(w * 300000L), et, xs.length.toLong) }
      .toSeq.sortBy(x => (x._1.getTime, x._2))
    assert(res == expect)
    assert(res.nonEmpty, "no windows published — vacuous replay")
    // trailing windows past the watermark stay unpublished (the
    // eviction boundary did real work)
    val lastAll = ev.map(e => e._1.getTime * 1000).max / 300000000L
    assert(!res.exists(_._1.getTime / 300000L == lastAll),
      "final (unflushable) window leaked into the append output")
  }
}
