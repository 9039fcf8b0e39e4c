package graft

import graft.ops.Blocklist
import graft.expressions.MultiContains
import graft.streaming.BlocklistScreen
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming blocklist screening: the ingest-path gate must agree
  * bit-for-bit with the batch q146 audit — same automaton, same
  * counting semantics — and the running totals must converge to the
  * batch answer over any micro-batch arrival order. */
class StreamingBlocklistSpec extends SparkSpec {
  import spark.implicits._

  private def corpusDocs(n: Int): Seq[BlocklistScreen.Doc] =
    Tables.documents(spark, sfDir).limit(n)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
      .map { case (id, t) => BlocklistScreen.Doc(id, t) }

  test("per-doc screening decisions equal a batch automaton pass") {
    implicit val sqlCtx = spark.sqlContext
    // corpus docs all hit (the audit list is drawn from corpus
    // vocabulary); one synthetic clean doc exercises the PASS path
    val docs = corpusDocs(40) :+
      BlocklistScreen.Doc(999999L, "nothing objectionable whatsoever here")
    val mem = MemoryStream[BlocklistScreen.Doc]
    val q = BlocklistScreen.screen(mem.toDS())
      .writeStream.format("memory").queryName("bl_screen")
      .outputMode("append").start()
    try {
      // two micro-batches: decisions must not depend on batch cuts
      val (a, b) = docs.splitAt(docs.length / 2)
      mem.addData(a: _*); q.processAllAvailable()
      mem.addData(b: _*); q.processAllAvailable()
      val streamed = spark.table("bl_screen")
        .select(col("doc_id"), col("n_hits"), col("blocked"))
        .as[(Long, Long, Boolean)].collect().toMap2
      val batch = docs.toDF("doc_id", "text")
        .select(col("doc_id"),
          MultiContains.hits(col("text"), Blocklist.Patterns).as("hits"))
        .select(col("doc_id"),
          aggregate(col("hits"), lit(0L), (acc, x) => acc + x).as("n"))
        .as[(Long, Long)].collect().toMap
      assert(streamed.keySet == batch.keySet)
      batch.foreach { case (id, n) =>
        val (sn, blocked) = streamed(id)
        assert(sn == n, s"doc $id: stream hit count $sn vs batch $n")
        assert(blocked == (n > 0), s"doc $id: decision diverges")
      }
      // a corpus slice this size must exercise BOTH outcomes
      assert(batch.values.exists(_ > 0) && batch.values.exists(_ == 0L))
    } finally q.stop()
  }

  test("running per-pattern totals converge to the q146 batch audit") {
    implicit val sqlCtx = spark.sqlContext
    val docs = corpusDocs(60)
    val mem = MemoryStream[BlocklistScreen.Doc]
    val q = BlocklistScreen.runningAudit(mem.toDS())
      .writeStream.format("memory").queryName("bl_running")
      .outputMode("complete").start()
    try {
      // three uneven micro-batches
      val (a, rest) = docs.splitAt(7)
      val (b, c) = rest.splitAt(29)
      Seq(a, b, c).foreach { batch =>
        mem.addData(batch: _*); q.processAllAvailable()
      }
      val streamed = spark.table("bl_running")
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      // batch reference: the q146 aggregation over the same docs
      val patArr = array(Blocklist.Patterns.map(lit): _*)
      val batchRef = docs.toDF("doc_id", "text")
        .select(posexplode(
          MultiContains.hits(col("text"), Blocklist.Patterns))
          .as(Seq("idx", "n")))
        .select(element_at(patArr, col("idx") + 1).as("pattern"), col("n"))
        .groupBy(col("pattern")).agg(
          sum(when(col("n") > 0, 1L).otherwise(0L)).as("n_docs"),
          sum(col("n")).as("n_hits"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(streamed == batchRef,
        "running audit diverges from the batch q146 aggregation")
      assert(streamed.values.map(_._2).sum > 0, "no hits — vacuous corpus")
    } finally q.stop()
  }

  test("declared q158 e2e equals the batch q146 audit totals") {
    val res = BlocklistScreen.streamedAudit(spark, sfDir)
      .as[(String, Long, Long)].collect().toSeq
    val expect = Blocklist.blocklistAudit(spark, sfDir)
      .select(col("pattern"), col("n_docs"), col("n_hits"))
      .as[(String, Long, Long)].collect().toSeq
    assert(res == expect,
      "streamed snapshot diverges from the batch audit")
    assert(res.map(_._3).sum > 0, "no hits — vacuous corpus")
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
