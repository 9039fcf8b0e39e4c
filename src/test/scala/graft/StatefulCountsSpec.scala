package graft

import graft.streaming.StatefulCounts
import graft.streaming.StatefulCounts.{UserEvent, UserSnapshot}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StatefulCountsSpec extends SparkSpec {
  import spark.implicits._

  test("mapGroupsWithState accumulates per-user counters across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[UserEvent]
    val q = StatefulCounts.runningCounts(mem.toDS())
      .writeStream.format("memory").queryName("user_counts")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData(UserEvent(1, "view"), UserEvent(1, "error"),
        UserEvent(2, "view"))
      q.processAllAvailable()
      mem.addData(UserEvent(1, "view"), UserEvent(2, "error"))
      q.processAllAvailable()
      // last snapshot per user reflects state carried across batches
      val last = spark.table("user_counts")
        .groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max("events").as("events"),
          org.apache.spark.sql.functions.max("errors").as("errors"))
        .orderBy("user_id").collect()
      assert(last.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq === Seq((1L, 3L, 1L), (2L, 2L, 1L)))
    } finally q.stop()
  }

  test("declared q160 e2e equals the batch per-user totals") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val res = StatefulCounts.streamedUserCounts(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    val expect = Tables.events(spark, sfDir)
      .groupBy(col("user_id")).agg(
        count(lit(1)).as("events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("errors"))
      .orderBy(col("user_id"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(res == expect,
      "materialized changelog diverges from batch totals")
    assert(res.exists(_._3 > 0), "no errors counted — vacuous replay")
  }
}
