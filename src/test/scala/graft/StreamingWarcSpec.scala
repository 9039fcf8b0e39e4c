package graft

import graft.ops.Warc
import graft.streaming.WarcIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming WARC ingest e2e: container frames → record walk → route
  * → embed → upsert under Structured Streaming, with the same
  * per-domain health answer as the batch q142 rollup, and the
  * idempotent-merge guarantee across re-delivered frames. */
class StreamingWarcSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("WARC frames stream through route→embed→upsert; health matches the record definitions") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = tmp("warc_corpus") + "/state"
    val ckpt = tmp("warc_ckpt")
    val mem = MemoryStream[Warc.WarcFile]
    val q = WarcIngest.run(spark, mem.toDS(), corpus, ckpt)
    try {
      // two micro-batches: one gzip file (id 0), one plain (id 1)
      val keysA = (0L until Warc.RecordsPerFile)
      val keysB = (Warc.RecordsPerFile.toLong until 2L * Warc.RecordsPerFile)
      mem.addData(Warc.WarcFile(0L, Warc.encodeWarc(0L, keysA)))
      q.processAllAvailable()
      mem.addData(Warc.WarcFile(1L, Warc.encodeWarc(1L, keysB)))
      q.processAllAvailable()

      val state = spark.read.parquet(corpus)
      val allKeys = keysA ++ keysB
      // every response upserted exactly once, keyed by url
      assert(state.count() === allKeys.size)
      assert(state.select("url").distinct().count() === allKeys.size)
      // the embed stage ran: unit-norm 1024-d vectors on every row
      val dims = state.select(size(col("embedding"))).distinct()
        .as[Int].collect().toSeq
      assert(dims === Seq(1024), s"embedding dims: $dims")
      // per-domain health off the streamed corpus == the closed-form
      // record definitions (the q142 batch answer on these keys)
      val health = state.groupBy(col("domain")).agg(
          count(lit(1)).as("n_responses"),
          sum(when(col("http_status") === 200, 1L).otherwise(0L)).as("n_ok"),
          sum(when(col("http_status") >= 400, 1L).otherwise(0L)).as("n_err"),
          sum(when(col("from_gzip"), 1L).otherwise(0L)).as("from_gzip"))
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
      val expected = allKeys.groupBy(k => s"dom${k % 20}.test").map {
        case (dom, ks) =>
          dom -> ((ks.size.toLong,
            ks.count(k => k % 7 != 0 && k % 7 != 3).toLong,
            ks.count(k => k % 7 == 0 || k % 7 == 3).toLong,
            ks.count(k => (k / Warc.RecordsPerFile) % 2 == 0).toLong))
      }
      assert(health === expected)

      // at-least-once: redeliver file 0 — the url-keyed merge makes
      // the duplicate batch a no-op on row count
      mem.addData(Warc.WarcFile(0L, Warc.encodeWarc(0L, keysA)))
      q.processAllAvailable()
      assert(spark.read.parquet(corpus).count() === allKeys.size)
    } finally q.stop()
  }

  test("batch and streaming route produce identical page items") {
    val file = Warc.WarcFile(2L, Warc.encodeWarc(2L, 16L until 24L))
    val batch = WarcIngest.route(Seq(file).toDS())
      .orderBy("url").collect().toSeq
    // the same frame through a memory stream, captured raw
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Warc.WarcFile]
    val q = WarcIngest.route(mem.toDS())
      .writeStream.format("memory").queryName("warc_route")
      .outputMode("append").start()
    try {
      mem.addData(file)
      q.processAllAvailable()
      val streamed = spark.table("warc_route").orderBy("url").collect().toSeq
      assert(streamed === batch)
    } finally q.stop()
  }
}
