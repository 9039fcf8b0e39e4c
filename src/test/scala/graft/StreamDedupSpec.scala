package graft

import graft.functions.TextOps
import graft.streaming.StreamDedup
import org.apache.spark.sql.functions._

/** Streaming dropDuplicates dedup (q191): the copy families really
  * are fingerprint-identical with the intended batch shifts, the
  * stream admits exactly one row per fingerprint (in its first
  * batch), and redelivery of a whole batch is a no-op. */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  test("copy families collapse to the original fingerprint, with shifts 1/2/0") {
    val fps = StreamDedup.corpus(spark, sfDir)
      .select($"doc_id", TextOps.fingerprint($"text").as("fp"))
      .as[(Long, Long)].collect().toMap
    val originals = fps.keySet.filter(_ < 200001)
    originals.filter(_ % 7 == 0).foreach { id =>
      assert(fps(id + 200001) == fps(id), s"upper copy of $id must match")
      assert((id + 200001) % 4 == (id + 1) % 4)
    }
    originals.filter(_ % 9 == 0).foreach { id =>
      assert(fps(id + 400002) == fps(id), s"respaced copy of $id must match")
      assert((id + 400002) % 4 == (id + 2) % 4)
    }
    originals.filter(_ % 11 == 0).foreach { id =>
      assert(fps(id + 600000) == fps(id), s"tab copy of $id must match")
      assert((id + 600000) % 4 == id % 4)
    }
  }

  test("admitted set = one survivor per fingerprint, in its first batch") {
    StreamDedup.streamedExactDedup(spark, sfDir).collect() // runs the stream
    val base = graft.Scratch.dir("stream_dedup", sfDir)
    val admitted = spark.read.parquet(s"$base/admitted")
      .select($"doc_id", $"fp").as[(Long, Long)].collect()
    val all = StreamDedup.corpus(spark, sfDir)
      .select($"doc_id", TextOps.fingerprint($"text").as("fp"))
      .as[(Long, Long)].collect()
    // exactly one admitted row per distinct fingerprint
    assert(admitted.map(_._2).distinct.length == admitted.length)
    assert(admitted.map(_._2).toSet == all.map(_._2).toSet)
    // each survivor belongs to its fingerprint's first batch
    val firstBatch = all.groupBy(_._2)
      .map { case (fp, rows) => fp -> rows.map(_._1 % 4).min }
    admitted.foreach { case (id, fp) =>
      assert(id % 4 == firstBatch(fp),
        s"survivor $id not in fp $fp's first batch")
    }
  }

  test("suppressed accounting balances arrivals against distinct keys") {
    val rows = StreamDedup.streamedExactDedup(spark, sfDir).collect()
    val arrivals = rows.map(_.getAs[Long]("n_arrivals")).sum
    val admitted = rows.map(_.getAs[Long]("n_admitted")).sum
    val distinctFps = StreamDedup.corpus(spark, sfDir)
      .select(TextOps.fingerprint($"text")).distinct().count()
    assert(admitted == distinctFps)
    assert(arrivals - admitted ==
      rows.map(_.getAs[Long]("n_suppressed")).sum)
    assert(arrivals > admitted, "the planted copies must suppress something")
  }
}
