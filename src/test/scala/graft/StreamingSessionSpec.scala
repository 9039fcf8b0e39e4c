package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming session windows: the same `session_window` operator q64
  * runs in batch, driven by a watermarked stream — events within the
  * gap merge into one growing session, a gap closes it. */
class StreamingSessionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(3600000L + minute * 60000L)

  test("session_window on a stream merges within-gap events per key") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val sessions = mem.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "2 hours")
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_out").outputMode("complete").start()
    try {
      // user 1: two events 10 min apart (one session), then one 40 min
      // later (second session); user 2: single event
      mem.addData((1L, ts(0)), (1L, ts(10)), (1L, ts(50)), (2L, ts(5)))
      q.processAllAvailable()
      val rows = spark.table("sessions_out")
        .select($"user_id", $"n_events",
          unix_timestamp($"w.start").as("s"), unix_timestamp($"w.end").as("e"))
        .collect()
      val u1 = rows.filter(_.getLong(0) == 1L).sortBy(_.getLong(2))
      assert(u1.length === 2)
      assert(u1.head.getLong(1) === 2L) // merged pair
      assert(u1.head.getLong(3) === u1.head.getLong(2) + 10 * 60 + 1800)
      assert(u1.last.getLong(1) === 1L)
      assert(rows.filter(_.getLong(0) == 2L).map(_.getLong(1)).toSeq === Seq(1L))
    } finally q.stop()
  }

  test("batch session_window agrees with the lag-based sessionize islands") {
    // both formulations over the same slice must produce identical
    // (user, start, end, n) sessions
    val native = ops.Events.sessionWindows(spark, sfDir)
      .select($"user_id", $"s_start", $"s_end", $"n_events").collect().toSet
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy($"user_id").orderBy($"us")
    val lagBased = Tables.events(spark, sfDir)
      .filter($"user_id" < 10)
      .withColumn("us", unix_micros($"ts"))
      .withColumn("new_s",
        when(lag($"us", 1).over(byUser).isNull ||
          $"us" - lag($"us", 1).over(byUser) >= 1800000000L, 1L).otherwise(0L))
      .withColumn("sid", sum($"new_s").over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"sid")
      .agg((min($"us") / 1000000L).cast("long").as("s_start"),
        ((max($"us") + 1800000000L) / 1000000L).cast("long").as("s_end"),
        count(lit(1)).as("n_events"))
      .select($"user_id", $"s_start", $"s_end", $"n_events").collect().toSet
    assert(native === lagBased)
  }

  test("declared q161 e2e equals the batch session windows") {
    val res = graft.streaming.WindowedStats.streamedSessions(spark, sfDir)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val expect = ops.Events.sessionWindows(spark, sfDir)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(res == expect,
      "streamed session snapshot diverges from the batch session_window")
    // cross-batch merges happened: with 4 arbitrary slices some
    // session must span micro-batches, so a naive per-batch
    // sessionization could not produce this
    assert(res.exists(_._4 > 1), "no multi-event sessions — vacuous replay")
  }
}
