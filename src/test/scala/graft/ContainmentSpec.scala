package graft

import graft.ops.Containment
import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** Containment detection (q194): planted slice recall under the
  * declared metric, asymmetry (the container is NOT reported as
  * contained), and a brute-force driver replay of the df-capped
  * index math. */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private def shingles(text: String): Set[Long] = {
    def hash60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val t = text.toLowerCase.split("[^a-z0-9_]+").filter(_.nonEmpty).toSeq
    val sh = if (t.length < 3) Seq(t.mkString(" "))
      else t.sliding(3).map(_.mkString(" ")).toSeq
    sh.map(hash60).toSet
  }

  test("census matches a brute-force driver replay") {
    val docs = Containment.corpus(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val sh = docs.map { case (id, t) => id -> shingles(t) }.toMap
    val df = sh.values.flatten.groupBy(identity).map { case (k, v) => k -> v.size }
    val kept = sh.map { case (id, s) =>
      id -> s.filter(df(_) <= Containment.DfCap)
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pairs = for {
      (a, sa) <- kept.toSeq; if sa.size >= Containment.MinShingles
      (b, sb) <- kept.toSeq; if a != b
      shared = (sa intersect sb).size; if shared > 0
      c = r6(shared.toDouble / sa.size); if c >= Containment.Threshold
    } yield (a, b, c)
    val expected = pairs.groupBy(p => if (p._1 >= 500000) "planted_slice" else "organic")
      .map { case (o, ps) =>
        val avg = ps.map(p => BigDecimal(p._3).setScale(6)).sum
        (o, ps.size.toLong, ps.map(_._1).distinct.size.toLong,
          r6(avg.toDouble / ps.size))
      }.toSet
    val got = Containment.containmentCensus(spark, sfDir)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got == expected)
  }

  test("planted slices are recovered and the relation is asymmetric") {
    val got = Containment.containmentCensus(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val eligible = Containment.corpus(spark, sfDir)
      .filter($"doc_id" >= 500000)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .count { case (_, t) =>
        shingles(t).size >= Containment.MinShingles }
    assert(got.getOrElse("planted_slice", 0L) > 0L,
      "the detector must recover planted slices")
    // asymmetry: full originals are supersets, so organic hits (a full
    // doc contained in something) should be far rarer than planted
    assert(got.getOrElse("planted_slice", 0L) >=
      got.getOrElse("organic", 0L))
    assert(eligible > 0)
  }
}
