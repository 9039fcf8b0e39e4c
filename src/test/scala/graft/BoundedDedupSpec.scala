package graft

import graft.functions.TextOps
import graft.streaming.StreamDedup
import org.apache.spark.sql.functions._

/** Bounded-dedup contract (q223): the closed-form replay, and the
  * semantic DIFFERENCE from the unbounded store — the re-admitted
  * batch-3 keys are exactly keys the unbounded q191 semantics would
  * have suppressed forever. */
class BoundedDedupSpec extends SparkSpec {

  private lazy val out =
    StreamDedup.streamedBoundedDedup(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("q223 matches the closed form; both contract sides are non-vacuous") {
    val keys = Tables.documents(spark, sfDir)
      .select(TextOps.fingerprint(col("text")).as("key")).distinct()
      .collect().map(_.getLong(0))
    val n = keys.length.toLong
    val c3 = keys.count(_ % 3 == 0).toLong
    val c5 = keys.count(_ % 5 == 0).toLong
    assert(out.toSeq === Seq(
      (0, n, n, 0L),
      (1, c3 + 1, 1L, c3),
      (2, 1L, 1L, 0L),
      (3, c5 + 1, c5 + 1, 0L)))
    assert(c3 > 0, "the within-window suppression path must run")
    assert(c5 > 0, "the post-eviction re-admission path must run")
  }

  test("the re-admitted keys are ones the UNBOUNDED store would suppress") {
    // every batch-3 re-delivery key already arrived in batch 0: the
    // q191 (unbounded dropDuplicates) semantics would keep them
    // suppressed forever; the bounded store re-admits them — the
    // state-size-vs-idempotence trade made visible
    val keys = Tables.documents(spark, sfDir)
      .select(TextOps.fingerprint(col("text")).as("key")).distinct()
      .collect().map(_.getLong(0)).toSet
    val redelivered = keys.filter(_ % 5 == 0)
    assert(redelivered.nonEmpty && redelivered.subsetOf(keys))
    val batch3 = out.find(_._1 == 3).get
    assert(batch3._3 === redelivered.size.toLong + 1,
      "all re-deliveries (plus the advance key) were ADMITTED again")
  }
}
