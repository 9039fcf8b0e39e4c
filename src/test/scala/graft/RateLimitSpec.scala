package graft

import graft.streaming.RateLimit
import graft.streaming.RateLimit.{Candidate, Verdict}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Token-bucket politeness (streaming): exact admit/defer split per
  * micro-batch, state carried across batches, domains independent.
  */
class RateLimitSpec extends SparkSpec {
  import spark.implicits._

  private def urls(domain: String, n: Int, prefix: String = "u") =
    (1 to n).map(i => Candidate(domain, f"$prefix$i%02d"))

  test("token bucket admits capacity then defers; refills across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Candidate]
    val q = RateLimit.admit(mem.toDS())
      .writeStream.format("memory").queryName("admits")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: 8 candidates for one domain → 5 admitted (capacity), 3 deferred
      mem.addData(urls("a.test", 8): _*)
      q.processAllAvailable()
      val b1 = spark.table("admits").as[Verdict].collect()
      assert(b1.count(_.admitted) === 5)
      assert(b1.count(!_.admitted) === 3)
      // deterministic order: lexicographically first 5 urls admitted
      assert(b1.filter(_.admitted).map(_.url).sorted.toSeq ===
        (1 to 5).map(i => f"u$i%02d"))
      // batch 2: refill 3 tokens; 4 candidates → 3 admitted, 1 deferred
      mem.addData(urls("a.test", 4, "v"): _*)
      q.processAllAvailable()
      val b2 = spark.table("admits").as[Verdict].collect()
        .filter(_.url.startsWith("v"))
      assert(b2.count(_.admitted) === 3)
      assert(b2.count(!_.admitted) === 1)
      // a fresh domain in the same stream gets its own full bucket
      mem.addData(urls("b.test", 6): _*)
      q.processAllAvailable()
      val b3 = spark.table("admits").as[Verdict].collect()
        .filter(_.domain == "b.test")
      assert(b3.count(_.admitted) === 5)
      assert(b3.count(!_.admitted) === 1)
    } finally q.stop()
  }
}
