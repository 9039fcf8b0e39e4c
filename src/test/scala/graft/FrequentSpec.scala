package graft

import graft.ops.Frequent
import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** Misra-Gries exact frequent items (q163): the coverage guarantee
  * (no φ-frequent token ever escapes the candidate set), the bounded
  * summary size, the exactness of the final answer against a plain
  * full-vocabulary GROUP BY, and invariance to how the corpus is
  * partitioned — the property that carries the algorithm from 4 local
  * threads to 1000 executors unchanged.
  */
class FrequentSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce() = {
    val toks = Tables.documents(spark, sfDir)
      .select(explode(TextOps.tokens($"text")).as("tok"))
    val n = toks.count()
    toks.groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" * lit(Frequent.MgCounters + 1L) > lit(n))
      .orderBy($"cnt".desc, $"tok")
      .as[(String, Long)].collect().toSeq
  }

  test("q163 equals the full-vocabulary GROUP BY HAVING answer") {
    val got = Frequent.frequentTerms(spark, sfDir)
      .as[(String, Long)].collect().toSeq
    assert(got === bruteForce())
    assert(got.nonEmpty, "test corpus must exercise a non-empty answer")
  }

  test("summary never exceeds the counter budget and carries exact N") {
    val toks = (1 to 5000).map(i => s"t${i % 700}") // 700 > MgCounters keys
    val out = Frequent.mgSummarize(toks.iterator).toSeq
    val (sentinels, cands) = out.partition(_._1 == null)
    assert(sentinels === Seq((null, 5000L)))
    assert(cands.size <= Frequent.MgCounters)
  }

  test("coverage: a frequent token survives any adversarial stream") {
    // hot token interleaved with a churn of singletons engineered to
    // trigger constant decrement-all rounds
    val k = Frequent.MgCounters
    val hot = "hot"
    val rng = new scala.util.Random(7)
    val stream = rng.shuffle(
      (1 to 2000).map(i => s"cold$i") ++ Seq.fill(40)(hot))
    // 40 * (k+1) > 2040 holds, so MG must retain `hot`
    assert(40L * (k + 1) > stream.size)
    val cands = Frequent.mgSummarize(stream.iterator)
      .collect { case (t, _) if t != null => t }.toSet
    assert(cands.contains(hot))
  }

  test("final answer is invariant to corpus partitioning") {
    val expected = bruteForce()
    // exercise the distributed path under degenerate (1) and
    // fragmented (29) partitionings of the same corpus: the MG
    // intermediate differs, the verified answer must not
    for (parts <- Seq(1, 29)) {
      val docs = Tables.documents(spark, sfDir).repartition(parts)
      val toks = docs.select(explode(TextOps.tokens($"text")).as("tok"))
      val n = toks.count()
      val summaries = toks.as[String].mapPartitions(Frequent.mgSummarize)
        .toDF("tok", "n_part")
      assert(summaries.filter($"tok".isNull)
        .agg(sum($"n_part")).as[Long].head() === n)
      val cands = summaries.filter($"tok".isNotNull).select($"tok").distinct()
      val got = toks.join(broadcast(cands), Seq("tok"))
        .groupBy($"tok").agg(count(lit(1)).as("cnt"))
        .filter($"cnt" * lit(Frequent.MgCounters + 1L) > lit(n))
        .orderBy($"cnt".desc, $"tok")
        .as[(String, Long)].collect().toSeq
      assert(got === expected, s"parts=$parts")
    }
  }
}
