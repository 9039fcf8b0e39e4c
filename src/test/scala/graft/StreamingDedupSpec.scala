package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class UrlEvent(url: String, ts: Timestamp)

/** Streaming dedup: dropDuplicates with a watermark — bounded state
  * (urls older than the watermark are GC'd), at-most-once emission
  * per url. The streaming twin of the batch frontier dedup (J3). */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Int) = new Timestamp(min * 60000L)

  test("dropDuplicates on stream emits each url once within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[UrlEvent]
    val q = mem.toDF()
      .withWatermark("ts", "30 minutes")
      .dropDuplicates("url")
      .writeStream.format("memory").queryName("dedup_urls")
      .outputMode("append").start()
    try {
      mem.addData(UrlEvent("https://a.test/1", t(1)),
        UrlEvent("https://a.test/2", t(2)))
      q.processAllAvailable()
      mem.addData(UrlEvent("https://a.test/1", t(3)), // dup within watermark
        UrlEvent("https://a.test/3", t(4)))
      q.processAllAvailable()
      val urls = spark.table("dedup_urls")
        .select("url").as[String].collect().sorted
      assert(urls.toSeq === Seq("https://a.test/1", "https://a.test/2",
        "https://a.test/3"))
    } finally q.stop()
  }
}
