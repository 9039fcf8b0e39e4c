package graft

import graft.ops.Fertility

/** q233 — tokenizer fertility audit. */
class FertilitySpec extends SparkSpec {

  private def tok(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9_]+").filter(_.nonEmpty).toSeq

  private def rnd6(x: Double) = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("per-source ratios match a from-scratch replay") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val replay = docs.groupBy(_._1).map { case (src, g) =>
      val ts = g.map(t => tok(t._2))
      val bpe = ts.map(_.map(w => (w.length + 3) / 4).map(_.toLong).sum).sum
      val words = ts.map(_.length.toLong).sum
      val chars = g.map(_._2.length.toLong).sum
      src -> (g.length.toLong, bpe, words,
        rnd6(bpe.toDouble / words), rnd6(chars.toDouble / bpe))
    }
    val out = Fertility.fertility(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toMap
    assert(out.keySet == replay.keySet)
    replay.foreach { case (src, exp) =>
      assert(out(src) == exp, s"$src: ${out(src)} != $exp")
    }
  }

  test("fertility ≥ 1: a word is at least one BPE piece") {
    Fertility.fertility(spark, sfDir).collect()
      .foreach(r => assert(r.getDouble(4) >= 1.0))
  }
}
