package graft

import graft.functions.{Embeddings, TextOps}
import graft.ops.MaxSim
import org.apache.spark.sql.functions._

/** MaxSim contract (q202): the distributed score must equal the
  * definition Σ_q max_d ⟨E_q, E_d⟩ computed brute-force, and be
  * invariant to token multiplicity. */
class MaxSimSpec extends SparkSpec {
  import spark.implicits._

  /** Featurize a handful of tokens through the ENGINE's own
    * expression (the spec checks the aggregation structure, not the
    * featurizer — HashFeaturizeSpec owns that). */
  private def embed(toks: Seq[String]): Map[String, Seq[Double]] =
    toks.distinct.toDF("tok")
      .select(col("tok"),
        Embeddings.featurize(col("tok"), MaxSim.TokDims).as("v"))
      .as[(String, Seq[Double])].collect().toMap

  private def tokenize(s: String): Seq[String] =
    s.toLowerCase.split("[^a-z0-9_]+").filter(_.nonEmpty).toSeq

  test("q202 score equals the brute-force MaxSim definition") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val emb = embed(docs.flatMap(d => tokenize(d._2)).toSeq ++
      MaxSim.Queries.flatMap(q => tokenize(q._2)))
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    val want = (for {
      (qid, qtext) <- MaxSim.Queries
      (did, dtext) <- docs
      dtoks = tokenize(dtext).distinct if dtoks.nonEmpty
    } yield {
      val score = tokenize(qtext).distinct.map(qt =>
        dtoks.map(dt => dot(emb(qt), emb(dt))).max).sum
      ((qid, did), BigDecimal(score).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    }).toMap

    val got = MaxSim.maxSimRerank(spark, sfDir).collect()
    assert(got.length === MaxSim.Queries.size * MaxSim.K)
    for (r <- got) {
      val key = (r.getLong(0), r.getLong(2))
      assert(math.abs(r.getDouble(3) - want(key)) < 1e-9, s"$key")
    }
    // the K winners per query are the true top-K of the brute-force map
    for ((qid, _) <- MaxSim.Queries) {
      val wantTop = want.collect { case ((q, d), s) if q == qid => (d, s) }
        .toSeq.sortBy { case (d, s) => (-s, d) }.take(MaxSim.K).map(_._1)
      val gotTop = got.filter(_.getLong(0) == qid)
        .sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
      assert(gotTop === wantTop, s"q=$qid")
    }
  }

  test("score is invariant to token multiplicity") {
    val docs = Seq((1L, "fast table fast fast table"), (2L, "fast table"))
    val qToks = Seq("fast", "scan")
    val emb = embed(docs.flatMap(d => tokenize(d._2)) ++ qToks)
    def score(dtext: String): Double = {
      def dot(a: Seq[Double], b: Seq[Double]) =
        a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      qToks.map(qt =>
        tokenize(dtext).distinct.map(dt => dot(emb(qt), emb(dt))).max).sum
    }
    assert(math.abs(score(docs(0)._2) - score(docs(1)._2)) < 1e-12)
  }
}
