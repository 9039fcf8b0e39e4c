package graft

import graft.ops.Mining
import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** Semantic guarantees of the corpus-mining suite (q111-q114):
  * stupid-backoff scores vs a from-scratch driver replay, anchor-text
  * totals vs a link-count replay, PMI vs brute-force counts, and the
  * boilerplate-removal df guarantee (the planted footer always dies,
  * unique prose survives).
  */
class MiningSpec extends SparkSpec {

  private def toks(s: String): Seq[String] =
    s.toLowerCase.split("[^a-z0-9_]+").filter(_.nonEmpty).toSeq

  private lazy val docs: Array[(Long, String)] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))

  test("stupid backoff: operator scores match a from-scratch replay; backoff fires") {
    val train = docs.filter(_._1 % 2 == 0).map { case (_, t) => toks(t) }
    val uni = train.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = train.flatMap(ts => ts.zip(ts.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tri = train.flatMap(ts => ts.lazyZip(ts.drop(1)).lazyZip(ts.drop(2)).toSeq)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = train.map(_.size.toLong).sum.toDouble

    def score(w1: String, w2: String, w3: String): Double =
      tri.get((w1, w2, w3)) match {
        case Some(c3) => c3.toDouble / bi((w1, w2)).toDouble
        case None => bi.get((w2, w3)) match {
          case Some(c2) => Mining.Alpha * c2.toDouble / uni(w2).toDouble
          case None => uni.get(w3) match {
            case Some(c1) => Mining.Alpha * Mining.Alpha * c1.toDouble / n
            case None => Mining.Alpha * Mining.Alpha * 0.5 / n
          }
        }
      }

    val expected = docs.filter(_._1 % 2 == 1).flatMap { case (id, t) =>
      val ts = toks(t)
      if (ts.size < 3) None else {
        val tgs = ts.lazyZip(ts.drop(1)).lazyZip(ts.drop(2)).toSeq
        val lps = tgs.map { case (a, b, c) =>
          BigDecimal(math.log(score(a, b, c)))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP) }
        val nb = tgs.count(tg => !tri.contains(tg)).toLong
        Some((id, (tgs.size.toLong, nb,
          (lps.sum / tgs.size).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)))
      }
    }.toMap

    val rows = Mining.stupidBackoff(spark, sfDir).collect()
    assert(rows.length == math.min(10, expected.size))
    rows.foreach { r =>
      val (nt, nb, avg) = expected(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_trigrams") == nt)
      assert(r.getAs[Long]("n_backoff") == nb)
      assert(math.abs(r.getAs[Double]("avg_logprob") - avg) < 2e-6)
    }
    // held-out split must actually exercise the backoff chain
    assert(rows.exists(_.getAs[Long]("n_backoff") > 0),
      "no unseen trigram in the held-out half — backoff path dead")
  }

  test("anchor text: per-target totals match a link replay; ranks well-formed") {
    val links = Tables.lineitem(spark, sfDir)
      .select(pmod(col("l_partkey"), lit(2000)).as("dst"))
      .groupBy("dst").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val top = links.toSeq.sortBy { case (d, c) => (-c, d) }.take(10).toMap

    val rows = Mining.anchorText(spark, sfDir).collect()
    val byDst = rows.groupBy(_.getAs[Long]("dst"))
    assert(byDst.keySet == top.keySet, "returned targets != 10 most-linked")
    byDst.foreach { case (dst, rs) =>
      assert(rs.forall(_.getAs[Long]("links") == top(dst)))
      val ranked = rs.sortBy(_.getAs[Int]("rank"))
      assert(ranked.map(_.getAs[Int]("rank")).toSeq == (1 to rs.length),
        s"dst $dst ranks not contiguous from 1")
      val cnts = ranked.map(_.getAs[Long]("cnt"))
      assert(cnts.zip(cnts.drop(1)).forall { case (a, b) => a >= b },
        s"dst $dst counts not non-increasing")
    }
  }

  test("pmi: top-15 matches brute-force counts exactly") {
    val all = docs.map { case (_, t) => toks(t) }
    val uni = all.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = all.flatMap(ts => ts.zip(ts.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = all.map(_.size.toLong).sum.toDouble
    val nb = all.map(ts => math.max(ts.size - 1, 0).toLong).sum.toDouble
    val expected = bi.toSeq
      .filter(_._2 >= Mining.PmiMinCount)
      .map { case ((a, b), c2) =>
        val pmi = BigDecimal(math.log((c2 / nb) / ((uni(a) / n) * (uni(b) / n))))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (a, b, c2, pmi) }
      .sortBy { case (a, b, _, pmi) => (-pmi, a, b) }
      .take(15)

    val rows = Mining.pmiCollocations(spark, sfDir).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("cnt"), r.getAs[Double]("pmi")))
    assert(rows.length == expected.length)
    rows.zip(expected).foreach { case (got, want) =>
      assert(got._1 == want._1 && got._2 == want._2 && got._3 == want._3)
      assert(math.abs(got._4 - want._4) < 1e-9)
    }
  }

  test("boilerplate: planted footers die, unique prose survives") {
    val rows = Mining.boilerplateRemoval(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nd = r.getAs[Long]("n_docs")
      val np = r.getAs[Long]("n_paras")
      val nbl = r.getAs[Long]("n_boiler")
      // each page is body + footer; bodies may themselves split further
      assert(np >= 2 * nd, s"${r.getAs[String]("source")}: paragraphs < 2/doc")
      if (nd >= Mining.BoilerDf)
        assert(nbl >= nd,
          s"${r.getAs[String]("source")}: footer (df=$nd) not flagged")
      assert(nbl < np,
        s"${r.getAs[String]("source")}: everything flagged — prose did not survive")
    }
  }
}
