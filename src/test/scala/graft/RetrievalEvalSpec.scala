package graft

import graft.ops.RetrievalEval
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graded retrieval-eval contract (q205): full driver replay of the
  * metric math from the definitions, closed-form IDCG ≡ definitional
  * ideal re-ranking, and metric range/structure pins. */
class RetrievalEvalSpec extends SparkSpec {

  private def rnd(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The op's discount/gain in driver math. */
  private def disc(rank: Int): Double = rnd(math.log(rank + 1.0) / math.log(2.0), 9)
  private def gain(rel: Int): Double = math.pow(2.0, rel) - 1.0

  test("q205 metrics match a from-scratch driver replay of the definitions") {
    val rows = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val denom = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
      if (denom == 0.0) 0.0 else dot(a, b) / denom
    }
    val K = RetrievalEval.K
    val want = rows.filter(_._1 < RetrievalEval.NQueries).sortBy(_._1).map {
      case (qid, qlabel, qv) =>
        val scored = rows.filter(_._1 != qid).map { case (id, lab, v) =>
          val rel = if (lab == qlabel) 2
            else if (lab % 5 == qlabel % 5) 1 else 0
          (id, rel, cos(v, qv))
        }
        val run = scored.sortBy { case (id, _, sim) => (-sim, id) }.take(K)
        val dcg = run.zipWithIndex.map { case ((_, rel, _), i) =>
          BigDecimal(rnd(gain(rel) / disc(i + 1), 9)) }.sum
        val rr = run.zipWithIndex.collect {
          case ((_, rel, _), i) if rel >= 1 => rnd(1.0 / (i + 1), 9)
        }.sorted.lastOption.getOrElse(0.0)
        val n2 = scored.count(_._2 == 2)
        val n1 = scored.count(_._2 == 1)
        val idcg = (1 to K).map { i =>
          val g = if (i <= n2) gain(2) else if (i <= n2 + n1) gain(1) else 0.0
          BigDecimal(rnd(g / disc(i), 9))
        }.sum
        val hits1 = run.count(_._2 >= 1)
        val hits2 = run.count(_._2 == 2)
        (qid, qlabel, n2.toLong, n1.toLong,
          rnd(dcg.toDouble / idcg.toDouble, 6), rr,
          rnd(hits1.toDouble / K, 6), rnd(hits2.toDouble / n2, 6))
    }
    val got = RetrievalEval.retrievalEval(spark, sfDir).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(got.toSeq === want.toSeq)
  }

  test("closed-form IDCG equals the definitional ideal re-ranking") {
    val scored = ops.RetrievalEval.scoredRel(spark, sfDir).localCheckpoint()
    val K = RetrievalEval.K
    // definitional: re-rank ALL candidates by rel desc, take top-K
    val ideal = scored
      .withColumn("irank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("rel").desc, col("vec_id"))))
      .filter(col("irank") <= K)
      .groupBy(col("q_id"))
      .agg(sum(round(RetrievalEval.gain(col("rel"))
        / RetrievalEval.disc(col("irank")), 9)
        .cast("decimal(28,9)")).as("idcg_def"))
    // closed form: the op's rank ladder over pool counts
    val pools = scored.groupBy(col("q_id")).agg(
      sum(when(col("rel") === 2, 1L).otherwise(0L)).as("n2"),
      sum(when(col("rel") === 1, 1L).otherwise(0L)).as("n1"))
    val ladder = pools
      .select(col("q_id"), col("n2"), col("n1"),
        explode(sequence(lit(1), lit(K))).as("i"))
      .withColumn("g", when(col("i") <= col("n2"), RetrievalEval.gain(lit(2)))
        .when(col("i") <= col("n2") + col("n1"), RetrievalEval.gain(lit(1)))
        .otherwise(lit(0.0)))
      .groupBy(col("q_id"))
      .agg(sum(round(col("g") / RetrievalEval.disc(col("i")), 9)
        .cast("decimal(28,9)")).as("idcg_cf"))
    val joined = ideal.join(ladder, Seq("q_id")).collect()
    assert(joined.nonEmpty)
    for (r <- joined)
      assert(r.getDecimal(1) === r.getDecimal(2),
        s"IDCG mismatch for q_id=${r.getLong(0)}")
  }

  test("metric ranges and run structure hold for every query") {
    val out = RetrievalEval.retrievalEval(spark, sfDir).collect()
    assert(out.length === RetrievalEval.NQueries)
    for (r <- out) {
      val (ndcg, rr, p10, rec) =
        (r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))
      assert(ndcg >= 0.0 && ndcg <= 1.0)
      assert(rr >= 0.0 && rr <= 1.0)
      // rr is 0 or a rounded reciprocal of a rank 1..K
      val legalRr = 0.0 +: (1 to RetrievalEval.K).map(i => rnd(1.0 / i, 9))
      assert(legalRr.contains(rr))
      assert(p10 >= 0.0 && p10 <= 1.0)
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getLong(2) > 0, "every label has same-label pool members")
    }
  }
}
