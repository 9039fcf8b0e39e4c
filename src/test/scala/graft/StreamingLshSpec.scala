package graft

import graft.ops.Dedup
import graft.functions.TextOps
import graft.streaming.LshDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming MinHash-LSH near-dup detection: the typed streaming path
  * must band documents EXACTLY like the batch q24 formulation, and
  * the stateful bucket must assign arrival-aware canonical ids. */
class StreamingLshSpec extends SparkSpec {
  import spark.implicits._

  test("streaming band keys are bit-identical to the batch q24 formulation") {
    val base = Tables.documents(spark, sfDir).limit(20)
      .select(col("doc_id"), col("text"),
        TextOps.shingleHashesFromTokens(TextOps.tokens(col("text"))).as("sh"))
      .localCheckpoint() // stage sh: collapse would inline the hashing
    val sig = Dedup.minhashCoeffs.zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(col("sh"),
        x => (lit(a) * pmod(x, lit(Dedup.P31)) + lit(b)) % lit(Dedup.P31)))
        .as(s"m$i")
    }
    val banded = base.select(col("doc_id") +: col("text") +: sig: _*)
      .select(col("doc_id"), col("text"),
        array((0 until LshDedup.Bands).map { bi =>
          concat_ws("-",
            (0 until LshDedup.RowsPerBand)
              .map(ri => col(s"m${bi * LshDedup.RowsPerBand + ri}")): _*)
        }: _*).as("bands"))
      .as[(Long, String, Seq[String])].collect()
    banded.foreach { case (id, text, batchBands) =>
      val streamed = LshDedup.bandKeys(text)
      val expected = batchBands.zipWithIndex.map { case (b, i) => s"$i:$b" }
      assert(streamed == expected, s"doc $id band keys diverge")
    }
  }

  test("stateful buckets assign first-seen canonical ids across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[LshDedup.Doc]
    val q = LshDedup.assignCanonical(mem.toDS())
      .writeStream.format("memory").queryName("lsh_assign")
      .outputMode("append").start()
    try {
      val textA = "the quick brown fox jumps over the lazy dog again and again"
      val textB = "completely different content about distributed query engines"
      mem.addData(LshDedup.Doc(10L, textA), LshDedup.Doc(20L, textB))
      q.processAllAvailable()
      // exact duplicate of doc 10 arrives later → every band collides
      mem.addData(LshDedup.Doc(30L, textA))
      q.processAllAvailable()
      val rows = spark.table("lsh_assign")
        .as[LshDedup.Assignment].collect()
      assert(rows.count(_.doc_id == 10L) == LshDedup.Bands)
      // doc 30 is suppressed: all four bands answer canonical 10
      assert(rows.filter(_.doc_id == 30L).map(_.canonical_id).distinct
        .toSeq == Seq(10L))
      // the unrelated doc stays its own canonical
      assert(rows.filter(_.doc_id == 20L).forall(_.canonical_id == 20L))
    } finally q.stop()
  }

  test("declared q157 e2e equals a from-scratch pinned-order replay") {
    val res = LshDedup.streamedDedup(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // replay OUTSIDE Spark: Scala band keys, batch = id % StreamBatches,
    // canonical at arrival = min same-bucket id with batch <= mine
    val docs = Dedup.corpusNear(spark, sfDir)
      .as[(Long, String)].collect().toSeq
    val B = LshDedup.StreamBatches
    val inv = docs.flatMap { case (id, t) =>
      LshDedup.bandKeys(t).map(k => (k, id, id % B)) }
    val byKey = inv.groupBy(_._1)
    val perDoc = docs.map { case (id, t) =>
      val batch = id % B
      val mc = LshDedup.bandKeys(t)
        .map(k => byKey(k).filter(_._3 <= batch).map(_._2).min).min
      (batch, id, mc)
    }
    val expect = perDoc.groupBy(_._1).map { case (b, xs) =>
      (b, xs.size.toLong,
        xs.count(x => x._3 < x._2).toLong,
        xs.filter(x => x._3 < x._2).map(_._2).sum)
    }.toSeq.sortBy(_._1)
    assert(res == expect)
    // the stream must have found real suppressions (planted near-dups
    // land in later batches than their originals often enough)
    assert(res.map(_._3).sum > 0, "replay corpus produced no suppressions")
  }
}
