package graft

import graft.ops.{Agreement, Bayes, Curation}
import org.apache.spark.sql.functions._

/** Cohen's κ contract (q215): a from-scratch driver replay of the
  * confusion cells and the chance-corrected formula, plus structural
  * accounting. */
class AgreementSpec extends SparkSpec {

  private def rnd(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val out = Agreement.kappaReport(spark, sfDir).collect()

  test("q215 replays from the two filters' collected decisions") {
    val lin = Curation.scoreDocs(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("source"), col("score")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2) >= 0.5)).toMap
    val nb = Bayes.perDocLlr(spark, sfDir)
      .select(col("doc_id"), col("llr")).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1) > 0.0)).toMap
    val paired = lin.keySet.intersect(nb.keySet).toSeq.map { id =>
      (lin(id)._1, lin(id)._2, nb(id))
    }
    val strata = (paired.map(_._1).distinct :+ "_all").sorted
    val want = strata.map { st =>
      val rows = if (st == "_all") paired else paired.filter(_._1 == st)
      val n = rows.size.toLong
      val a = rows.count(r => r._2 && r._3).toLong
      val b = rows.count(r => !r._2 && r._3).toLong
      val c = rows.count(r => r._2 && !r._3).toLong
      val d = rows.count(r => !r._2 && !r._3).toLong
      val po = (a + d) / n.toDouble
      val pe = ((a + c) * (a + b) + (b + d) * (c + d)) /
        (n.toDouble * n.toDouble)
      val kappa = if (pe == 1.0) None
        else Some(rnd((po - pe) / (1.0 - pe), 6))
      (st, n, a, b, c, d, rnd(po, 6), rnd(pe, 6), kappa)
    }
    val got = out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6),
      r.getDouble(7),
      if (r.isNullAt(8)) None else Some(r.getDouble(8))))
    assert(got.toSeq === want)
  }

  test("cells account for every paired doc; κ is chance-corrected") {
    assert(out.nonEmpty)
    for (r <- out) {
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5)
        === r.getLong(1), "confusion cells must sum to n")
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0)
      if (!r.isNullAt(8)) {
        val (po, pe, k) = (r.getDouble(6), r.getDouble(7), r.getDouble(8))
        assert(k <= 1.0)
        // κ < p_o unless agreement is below chance (then κ < 0 < p_o)
        assert(k < po + 1e-9 || po == 1.0)
        assert(math.abs(k) <= 1.0 + 1e-9)
        assert(pe < 1.0)
      }
    }
    val all = out.find(_.getString(0) == "_all").get
    assert(all.getLong(1) === out.filter(_.getString(0) != "_all")
      .map(_.getLong(1)).sum, "_all pools every stratum")
  }
}
