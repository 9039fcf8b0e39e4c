package graft

import graft.ops.TripletMine
import org.apache.spark.sql.functions._

/** q232 — semi-hard contrastive triplet mining. */
class TripletMineSpec extends SparkSpec {

  private lazy val out = TripletMine.tripletMine(spark, sfDir).collect()

  private lazy val brute: Map[Long, Seq[(Long, Double)]] = {
    val e = graft.Corpus.docEmbeddings(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na * nb == 0) 0.0
      else BigDecimal(dot / (na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    (0L until TripletMine.Anchors).map { q =>
      q -> e.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cos(e(q), v)) }
        .sortBy { case (id, s) => (-s, id) }
    }.toMap
  }

  test("one positive per anchor — the global nearest neighbor") {
    val pos = out.filter(_.getString(1) == "pos")
    assert(pos.length == TripletMine.Anchors)
    pos.foreach { r =>
      val (expId, expSim) = brute(r.getLong(0)).head
      assert(r.getLong(3) == expId && r.getDouble(4) == expSim,
        s"anchor ${r.getLong(0)}: pos ${r.getLong(3)}@${r.getDouble(4)}" +
          s" != brute $expId@$expSim")
    }
  }

  test("negatives: NegK per anchor, inside the band, ranked by sim") {
    val neg = out.filter(_.getString(1) == "neg")
      .groupBy(_.getLong(0))
    assert(neg.keySet == (0L until TripletMine.Anchors).toSet)
    neg.foreach { case (q, rows) =>
      val expected = brute(q)
        .filter { case (_, s) => s >= TripletMine.NegLo && s < TripletMine.NegHi }
        .take(TripletMine.NegK)
      assert(rows.length == expected.length, s"anchor $q: ${rows.length} negs")
      // the design intent of the band: a full negative set per anchor
      assert(expected.length == TripletMine.NegK,
        s"anchor $q: band occupancy ${expected.length} < NegK at $sfDir")
      val got = rows.sortBy(_.getLong(2))
        .map(r => (r.getLong(3), r.getDouble(4))).toSeq
      assert(got == expected, s"anchor $q: $got != $expected")
    }
  }

  test("semi-hard contract: every negative scores below the positive") {
    val posSim = out.filter(_.getString(1) == "pos")
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    out.filter(_.getString(1) == "neg").foreach { r =>
      assert(r.getDouble(4) < posSim(r.getLong(0)))
    }
  }
}
