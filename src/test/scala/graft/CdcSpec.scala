package graft

import graft.ops.Cdc
import org.apache.spark.sql.functions._

/** Content-defined chunking (q182): from-scratch driver chunker
  * replay, lossless reassembly, and the headline property — CDC
  * chunk recovery under a prefix shift beats fixed-size blocking by
  * an order of magnitude.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def chunk(text: String): Seq[String] = {
    val cuts = (8 to text.length).filter { i =>
      val h = (0 until 8).map { k =>
        text.charAt(i - 8 + k).toLong * math.pow(31.0, 7 - k).toLong
      }.sum
      h % Cdc.Divisor == 0
    }
    val bounds = (0 +: cuts :+ text.length).distinct.sorted
    bounds.zip(bounds.drop(1)).map { case (s, e) => text.substring(s, e) }
      .filter(_.nonEmpty)
  }

  test("driver chunker replay: chunks reassemble losslessly") {
    val docs = Tables.documents(spark, sfDir)
      .select($"text").as[String].take(25)
    docs.foreach { t =>
      val cs = chunk(t)
      assert(cs.mkString === t, "chunks must tile the document")
      assert(cs.forall(_.nonEmpty))
    }
  }

  test("CDC recovery under a prefix shift beats fixed-size blocking") {
    val docs = Tables.documents(spark, sfDir)
      .select($"text").as[String].take(40).filter(_.length > 200)
    assert(docs.nonEmpty)
    val (cdcR, fixR) = docs.map { t =>
      val shifted = Cdc.TwinPrefix + t
      val a = chunk(t).toSet; val b = chunk(shifted).toSet
      val cdc = a.intersect(b).size.toDouble / a.size
      val fa = t.grouped(64).toSet; val fb = shifted.grouped(64).toSet
      val fix = fa.intersect(fb).size.toDouble / fa.size
      (cdc, fix)
    }.unzip match { case (cs, fs) =>
      (cs.sum / cs.size, fs.sum / fs.size) }
    assert(cdcR > 0.5, s"CDC recovery too low: $cdcR")
    assert(cdcR > 5 * fixR + 0.1,
      s"CDC ($cdcR) must dominate fixed blocking ($fixR)")
  }

  test("q182 census columns are internally consistent") {
    val r = Cdc.cdcCensus(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_chunks") > r.getAs[Long]("n_docs"))
    assert(r.getAs[Double]("avg_chunk_len") > 8.0)
    assert(r.getAs[Long]("dup_chunk_groups") > 0)
    assert(r.getAs[Double]("avg_twin_recovery") > 0.5)
  }
}
