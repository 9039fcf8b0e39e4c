package graft

import graft.ops.{Curation, Trend}
import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** Semantic guarantees of the engagement/curation wave (q127-q130). */
class TrendSpec extends SparkSpec {

  private def toks(s: String): Seq[String] =
    s.toLowerCase.split("[^a-z0-9_]+").filter(_.nonEmpty).toSeq

  test("blocklist: flags replay token-exactly, no substring tripping") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getString(1), toks(r.getString(2))))
    val bw = Curation.Blockwords.toSet
    val expected = docs.groupBy(_._1).view.mapValues { ds =>
      val blocked = ds.map(_._2.count(bw.contains))
      (ds.size.toLong, blocked.count(_ > 0).toLong, blocked.sum.toLong)
    }.toMap
    val rows = Curation.blocklistFilter(spark, sfDir).collect()
    assert(rows.nonEmpty)
    var flaggedTotal = 0L
    rows.foreach { r =>
      val (nd, nf, occ) = expected(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") == nd)
      assert(r.getAs[Long]("n_flagged") == nf)
      assert(r.getAs[Long]("blocked_occurrences") == occ)
      flaggedTotal += nf
    }
    assert(flaggedTotal > 0, "blocklist never fired — filter unexercised")
  }

  test("dau/wau: wau(d) counts users active within the 7-day lookback") {
    val pairs = Tables.events(spark, sfDir)
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1))))
    val days = pairs.map(_._2).distinct
    val rows = Trend.dauWau(spark, sfDir).collect()
    assert(rows.length == days.length)
    val byDay = rows.map(r =>
      (r.getAs[String]("day"), r)).toMap
    days.foreach { d =>
      val dau = pairs.count(_._2 == d).toLong
      val wau = pairs.filter { case (_, ad) =>
        !ad.isAfter(d) && ad.isAfter(d.minusDays(Trend.WauDays))
      }.map(_._1).distinct.length.toLong
      val r = byDay(d.toString)
      assert(r.getAs[Long]("dau") == dau, s"$d dau")
      assert(r.getAs[Long]("wau") == wau, s"$d wau")
      assert(r.getAs[Long]("wau") >= r.getAs[Long]("dau"))
    }
  }

  test("trending: decay beats raw volume when recency differs") {
    val rows = Trend.trending(spark, sfDir).collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getAs[Double]("trend_score"))
    assert(scores.zip(scores.drop(1)).forall { case (a, b) => a >= b })
    // a part's score can never exceed its shipment count (each term ≤ 1)
    rows.foreach { r =>
      assert(r.getAs[Double]("trend_score")
        <= r.getAs[Long]("n_ships").toDouble + 1e-9)
      assert(r.getAs[Double]("trend_score") > 0.0)
    }
  }

  test("best exemplars: the pick is the stratum's max score with min doc_id") {
    val scored = Curation.scoreDocs(Tables.documents(spark, sfDir))
      .join(Tables.documents(spark, sfDir).select(col("doc_id"), col("lang")),
        Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("lang"), col("score"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang"),
        r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    val rows = Curation.bestExemplars(spark, sfDir).collect()
    val byStratum = scored.groupBy(t => (t._1, t._2))
    assert(rows.length == byStratum.size)
    rows.foreach { r =>
      val members = byStratum((r.getAs[String]("source"), r.getAs[String]("lang")))
      assert(r.getAs[Long]("n_docs") == members.length.toLong)
      val best = members.map(_._4).max
      assert(r.getAs[Double]("best_score") == best)
      val wantDoc = members.filter(_._4 == best).map(_._3).min
      assert(r.getAs[Long]("best_doc") == wantDoc,
        s"tie not broken toward the smaller doc_id")
    }
  }
}
