package graft

import graft.ops.{Mining, Quant, Ranking, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Semantic guarantees of the retrieval/diagnostics wave (q115-q118):
  * JL projection unbiasedness and sign-rule fidelity, hard-negative
  * label and top-k guarantees vs brute force, RRF fusion replay from
  * the two source rankings, and the Hill estimator vs a driver-side
  * recompute.
  */
class RetrievalSpec extends SparkSpec {

  private lazy val vecs: Map[Long, Array[Double]] =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
      .toMap

  test("jl projection: distortion centers on 1, every pair audited") {
    val row = Quant.jlProject(spark, sfDir).collect().head
    val n = math.min(Quant.JlSample, vecs.size).toLong
    assert(row.getAs[Long]("n_pairs") == n * (n - 1) / 2,
      "audit did not cover every sample pair")
    val avg = row.getAs[Double]("avg_ratio")
    assert(avg > 0.9 && avg < 1.1, s"JL estimate biased: avg ratio $avg")
    assert(row.getAs[Double]("min_ratio") > 0.0)
    assert(row.getAs[Double]("frac_within_20pct") > 0.5,
      "distortion spread incompatible with a working ±1/√k projection")
  }

  test("jl projection: sign matrix follows the md5 rule, ±1 only") {
    assert(Quant.jlSigns.length == Quant.JlK)
    assert(Quant.jlSigns.forall(_.length == Quant.JlD))
    assert(Quant.jlSigns.flatten.forall(s => s == 1.0 || s == -1.0))
    // both polarities present in every output coordinate's row
    Quant.jlSigns.zipWithIndex.foreach { case (rw, j) =>
      assert(rw.contains(1.0) && rw.contains(-1.0), s"row $j degenerate")
    }
    // spot-check the derivation against an independent recompute
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest("jl3_7".getBytes("UTF-8"))
    var h = 0L
    (0 until 7).foreach(k => h = (h << 8) | (d(k) & 0xffL))
    h = (h << 4) | ((d(7) & 0xffL) >> 4)
    assert(Quant.jlSigns(3)(7) == (if (h % 2 == 0) 1.0 else -1.0))
  }

  test("hard negatives: labels differ, and each pick beats every unpicked candidate") {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val labels = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val rows = Similarity.hardNegatives(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == (0L until Similarity.HnQueries).toSet)
    byQ.foreach { case (q, rs) =>
      assert(rs.length == Similarity.HnK)
      assert(rs.forall(_.getAs[Int]("n_label") != labels(q)),
        s"query $q mined a same-label 'negative'")
      val picked = rs.map(_.getAs[Long]("n_id")).toSet
      val floor = rs.map(_.getAs[Double]("sim")).min
      // no unpicked other-label vector scores above the worst pick
      labels.collect { case (id, l) if l != labels(q) && !picked.contains(id) =>
        val s = BigDecimal(cos(vecs(id), vecs(q)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(s <= floor + 1e-9,
          s"query $q: candidate $id (sim $s) beats floor $floor")
      }
    }
  }

  test("rrf fusion: scores replay from the two source rankings") {
    val bm = Ranking.bm25(spark, sfDir).collect()
      .sortBy(r => (-r.getAs[Double]("score"), r.getAs[Long]("doc_id")))
      .map(_.getAs[Long]("doc_id")).zipWithIndex
      .map { case (d, i) => (d, i + 1) }.toMap
    val tf = Ranking.tfidf(spark, sfDir).collect()
      .sortBy(r => (-r.getAs[Double]("cosine"), r.getAs[Long]("doc_id")))
      .map(_.getAs[Long]("doc_id")).zipWithIndex
      .map { case (d, i) => (d, i + 1) }.toMap
    val rows = Ranking.rrfFusion(spark, sfDir).collect()
    assert(rows.nonEmpty)
    var last = Double.MaxValue
    rows.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      val want = bm.get(d).map(k => 1.0 / (Ranking.RrfC + k)).getOrElse(0.0) +
        tf.get(d).map(k => 1.0 / (Ranking.RrfC + k)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") - want) < 1e-9)
      assert(r.getAs[Double]("rrf") <= last + 1e-12, "not sorted by rrf")
      last = r.getAs[Double]("rrf")
      assert(bm.contains(d) || tf.contains(d), s"doc $d in neither list")
    }
    // a doc on both lists must outrank a doc on one list at same depth
    val both = rows.filter(r => r.getAs[java.lang.Long]("rank_bm25") != null
      && r.getAs[java.lang.Long]("rank_tfidf") != null)
    assert(both.nonEmpty, "no overlap between lexical and semantic lists")
  }

  test("zipf tail: alpha matches a driver-side Hill recompute") {
    val toks = Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextOps.tokens(col("text"))).as("t"))
      .collect().map(_.getString(0))
    val freqs = toks.groupBy(identity).view.mapValues(_.size.toLong)
      .values.toSeq.sorted(Ordering[Long].reverse)
    val cut = freqs.take(TextAnalysis.HillK + 1)
    val fThr = cut.last.toDouble
    val k = cut.length - 1
    val sum = cut.take(k).filter(_.toDouble > fThr)
      .map(f => BigDecimal(math.log(f / fThr))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum
    val alpha = BigDecimal(1.0 + k / sum.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = TextAnalysis.zipfTail(spark, sfDir).collect().head
    assert(row.getAs[Long]("n_tokens") == toks.length.toLong)
    assert(row.getAs[Long]("k") == k.toLong)
    assert(row.getAs[Long]("f_thr") == fThr.toLong)
    assert(math.abs(row.getAs[Double]("alpha") - alpha) < 1e-6)
  }
}
