package graft

import graft.ops.Novelty
import org.apache.spark.sql.functions._

/** Semantic guarantees of the novelty wave (q151/q152), checked
  * against a from-scratch Scala replay of the tokenize → 8-shingle →
  * first-owner attribution over the collected documents (strings,
  * not hashes — a hash collision would surface as a count mismatch).
  */
class NoveltySpec extends SparkSpec {

  /** Replay of TextOps.tokens + 8-shingles, on plain Scala strings. */
  private def shingleSet(text: String): Set[String] = {
    val toks = text.toLowerCase.split("[^a-z0-9_]+").filter(_.nonEmpty)
    if (toks.length < Novelty.Shingle) Set(toks.mkString(" "))
    else toks.sliding(Novelty.Shingle).map(_.mkString(" ")).toSet
  }

  private def docShingles(): Map[Long, Set[String]] =
    Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> shingleSet(r.getAs[String]("text")))
      .toMap

  test("novelty: per-doc counts match a string-level replay") {
    val docs = docShingles()
    val df = docs.values.toSeq.flatten.groupBy(identity)
      .map { case (g, occ) => g -> occ.size }
    val firstOwner = docs.toSeq.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
    val rows = Novelty.noveltyScore(spark, sfDir, Int.MaxValue).collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val gs = docs(id)
      assert(r.getAs[Long]("n_grams") == gs.size)
      assert(r.getAs[Long]("n_exclusive") == gs.count(df(_) == 1))
      assert(r.getAs[Long]("n_first") == gs.count(firstOwner(_) == id))
      assert(r.getAs[Long]("n_exclusive") <= r.getAs[Long]("n_first"))
      assert(math.abs(r.getAs[Double]("novelty") -
        gs.count(df(_) == 1).toDouble / gs.size) < 1e-6)
    }
    // the ranking is ascending by novelty and the default cut is its prefix
    val ordered = rows.map(r =>
      (r.getAs[Double]("novelty"), r.getAs[Long]("doc_id")))
    assert(ordered.sameElements(ordered.sorted))
    val top = Novelty.noveltyScore(spark, sfDir).collect()
    assert(top.map(_.getAs[Long]("doc_id")).toSeq ==
      rows.take(Novelty.TopK).map(_.getAs[Long]("doc_id")).toSeq)
    // the data exercises both ends: some derivative, some fully novel
    assert(ordered.head._1 < 1.0 && ordered.last._1 == 1.0)
  }

  test("saturation: batch curve conserves docs, instances, vocabulary") {
    val docs = docShingles()
    val maxId = docs.keys.max
    def batchOf(id: Long): Long =
      math.min(Novelty.Batches - 1L, id * Novelty.Batches / (maxId + 1))
    val rows = Novelty.gramSaturation(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("batch")).toSeq ==
      rows.map(_.getAs[Long]("batch")).toSeq.sorted)
    // conservation: docs, gram instances, and total vocabulary
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.size)
    assert(rows.map(_.getAs[Long]("n_gram_instances")).sum ==
      docs.values.map(_.size.toLong).sum)
    val vocab = docs.values.reduce(_ ++ _)
    assert(rows.map(_.getAs[Long]("n_new_grams")).sum == vocab.size)
    assert(rows.last.getAs[Long]("cum_unique_grams") == vocab.size)
    // per-batch replay: new grams = vocabulary minus all earlier batches
    val byBatch = docs.groupBy { case (id, _) => batchOf(id) }
    var seen = Set.empty[String]
    rows.foreach { r =>
      val b = r.getAs[Long]("batch")
      val bDocs = byBatch.getOrElse(b, Map.empty)
      assert(r.getAs[Long]("n_docs") == bDocs.size)
      val bGrams = bDocs.values.foldLeft(Set.empty[String])(_ ++ _)
      assert(r.getAs[Long]("n_new_grams") == (bGrams -- seen).size)
      seen ++= bGrams
      assert(r.getAs[Long]("cum_unique_grams") == seen.size)
    }
    // cumulative curve is monotone and the ratio is bounded
    val cums = rows.map(_.getAs[Long]("cum_unique_grams"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(rows.forall { r =>
      val ratio = r.getAs[Double]("new_ratio")
      ratio >= 0 && ratio <= 1.0
    })
  }
}
