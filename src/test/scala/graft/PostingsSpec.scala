package graft

import graft.ops.Postings
import org.apache.spark.sql.functions._

/** Postings vbyte census (q173): from-scratch driver replay — an
  * independent tokenizer walk, real varint encoder (not the CASE
  * ladder), and hand-built gap lists — must agree band-for-band.
  */
class PostingsSpec extends SparkSpec {
  import spark.implicits._

  /** Actual LEB128-style varint byte count — the ladder in the
    * operator must equal encoding for real. */
  private def varintLen(v: Long): Int = {
    var x = v; var n = 1
    while (x >= 128) { x >>= 7; n += 1 }
    n
  }

  private def replay(): Seq[(Long, Long, Long, Long, Long, Double)] = {
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id".cast("long"), $"text")
      .as[(Long, String)].collect().toSeq
    val posts = docs.flatMap { case (id, text) =>
      val toks = "[^a-z0-9_]+".r.split(text.toLowerCase)
        .filter(_.nonEmpty).toSeq
      val bis = toks.zip(toks.drop(1)).map { case (a, b) => s"$a $b" }
      (toks.distinct ++ bis.distinct).map(t => (t, id * Postings.IdStride))
    }
    val terms = posts.groupBy(_._1).toSeq.map { case (_, ps) =>
      val ids = ps.map(_._2).sorted
      val gaps = ids.head +: ids.zip(ids.drop(1)).map(p => p._2 - p._1)
      (ids.size.toLong, gaps.map(g => varintLen(g).toLong).sum)
    }
    terms.groupBy { case (df, _) => java.lang.Long.toBinaryString(df).length.toLong }
      .map { case (band, ts) =>
        val df = ts.map(_._1).sum; val vb = ts.map(_._2).sum
        (band, ts.size.toLong, df, df * 8,
          vb, BigDecimal(df * 8.0 / vb).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSeq.sortBy(_._1)
  }

  test("q173 equals a from-scratch replay with a real varint encoder") {
    val got = Postings.compressionCensus(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === replay())
    assert(got.nonEmpty)
  }

  test("census spans multiple bands and sub-8x compression") {
    val got = Postings.compressionCensus(spark, sfDir).collect()
    assert(got.length >= 2, "banding must spread (bigrams present)")
    assert(got.forall(_.getDouble(5) > 1.0 && got.forall(_.getDouble(5) <= 8.0)))
  }
}
