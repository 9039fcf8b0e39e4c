package graft

import graft.streaming.StreamJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Stream-stream interval join (§2.I extension): watermarked
  * impressions x clicks with a bounded attribution window. */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(7200000L + minute * 60000L)

  test("clicks attribute to impressions only within the window") {
    implicit val sqlCtx = spark.sqlContext
    val imp = MemoryStream[(Long, Timestamp)]
    val clk = MemoryStream[(Long, Timestamp)]
    val joined = StreamJoin.attribution(
      imp.toDF().toDF("ad_id", "imp_ts"),
      clk.toDF().toDF("c_ad_id", "click_ts"))
    val q = joined.writeStream.format("memory")
      .queryName("attributed").outputMode("append").start()
    try {
      imp.addData((1L, ts(0)), (2L, ts(0)))
      clk.addData(
        (1L, ts(5)),   // inside window -> attributed
        (2L, ts(20)),  // outside 10-min window -> dropped
        (3L, ts(1)))   // no impression -> dropped
      q.processAllAvailable()
      val rows = spark.table("attributed")
        .select($"ad_id").as[Long].collect().toSeq
      assert(rows === Seq(1L))
    } finally q.stop()
  }

  test("declared q162 e2e equals the batch interval join") {
    import org.apache.spark.sql.functions._
    val res = StreamJoin.streamedAttribution(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    val ev = Tables.events(spark, sfDir)
    val v = ev.filter($"event_type" === "view")
      .select($"user_id".as("ad_id"), $"ts".as("imp_ts"))
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_ad_id"), $"ts".as("click_ts"))
    val expect = v.join(c,
        $"ad_id" === $"c_ad_id" && $"click_ts" >= $"imp_ts" &&
          $"click_ts" <= $"imp_ts" + expr("interval 60 minutes"))
      .groupBy($"ad_id").agg(
        count(lit(1)).as("n_attrib"),
        sum(unix_micros($"click_ts") - unix_micros($"imp_ts"))
          .as("gap_us_sum"))
      .orderBy($"ad_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(res == expect,
      "streamed attribution diverges from the batch interval join")
    assert(res.map(_._2).sum > 0, "no attributions — vacuous replay")
  }
}
