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
}
