package graft

import graft.ops.SuffixDedup
import org.apache.spark.sql.functions._

/** The ExactSubstr contract (q156): the distributed suffix sort must
  * mark exactly the positions a brute-force window count marks, and
  * the plan must stay a sort + linear scan — never an all-pairs
  * stage. */
class SuffixDedupSpec extends SparkSpec {
  import spark.implicits._

  private val L = 8 // small threshold so toy docs exercise the paths

  test("dup positions match a brute-force window count exactly") {
    // crafted corpus: a span shared across docs, a self-repetition
    // inside one doc, a doc shorter than L, and unique text
    val docs = Seq(
      (1L, "alpha", "the quick brown fox jumps over it"),
      (2L, "alpha", "SOMETHING the quick brown fox ends"),
      (3L, "beta", "zz ABCDEFGH more ABCDEFGH zz tail"),
      (4L, "beta", "short"),
      (5L, "gamma", "entirely unique content with no twin")
    ).toDF("doc_id", "source", "text")

    val got = SuffixDedup.dupPositions(docs, L)
      .as[(Long, String, Int)].collect().toSet

    // brute force: every L-window of every doc, counted corpus-wide
    val rows = docs.as[(Long, String, String)].collect()
    val counts = scala.collection.mutable.Map[String, Int]()
    for ((_, _, t) <- rows; p <- 0 to t.length - L)
      counts(t.substring(p, p + L)) = counts.getOrElse(t.substring(p, p + L), 0) + 1
    val want = (for {
      (id, src, t) <- rows
      p <- 0 to t.length - L
      if counts(t.substring(p, p + L)) >= 2
    } yield (id, src, p + 1)).toSet // 1-based, matching substr()

    assert(got === want)
    assert(want.nonEmpty, "fixture must actually contain duplicates")
    // the shared span marks positions in BOTH docs, the
    // self-repetition in ONE
    assert(want.exists(_._1 == 1L) && want.exists(_._1 == 2L))
    assert(want.exists(_._1 == 3L))
    // the short doc and the unique doc mark nothing
    assert(!want.exists(_._1 == 4L) && !want.exists(_._1 == 5L))
  }

  test("q156 rollup matches the dup-position set and runs on the corpus") {
    val out = SuffixDedup.exactSubstr(spark, sfDir).collect()
    assert(out.nonEmpty, "sf corpus should contain exact L-dups")
    // internal consistency: rollup == direct aggregation of positions
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
    val direct = SuffixDedup.dupPositions(docs)
      .groupBy($"source").agg(count(lit(1)), countDistinct($"doc_id"))
      .orderBy($"source").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      === direct.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("plan shape: one shuffle to buckets, no join, no all-pairs") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
    val plan = SuffixDedup.dupPositions(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"suffix dedup must not join:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"suffix dedup must not go all-pairs:\n$plan")
  }
}
