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
}
