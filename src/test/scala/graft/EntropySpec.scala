package graft

import graft.ops.Entropy

/** q237 — per-source character-entropy census. */
class EntropySpec extends SparkSpec {

  private def rnd(x: Double, s: Int) =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  // the op's ladder: H = ln(n) − (Σ c·ln c)/n with rounded-9 lns,
  // DECIMAL(28,12)-quantized term sums, per-doc round 9; counting is
  // per CODEPOINT (the r15 CodepointCounts semantics — identical to
  // the old split("") on this ASCII corpus, divergent on non-BMP)
  private def docEntropy(text: String): Double = {
    val counts = text.codePoints().toArray.toSeq
      .groupBy(identity).map(_._2.length.toLong)
    val n = counts.sum
    val s = counts
      .map(c => BigDecimal(c.toDouble * rnd(math.log(c.toDouble), 9))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
    rnd(rnd(math.log(n.toDouble), 9) - s / n.toDouble, 9)
  }

  test("per-source stats match a from-scratch replay") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter(_._2.nonEmpty)
    val expect = docs.groupBy(_._1).map { case (src, g) =>
      val hs = g.map(d => docEntropy(d._2))
      val mean = rnd(hs.map(BigDecimal(_)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble / hs.length, 6)
      (src, (hs.length.toLong, mean, rnd(hs.min, 6), rnd(hs.max, 6),
        hs.count(_ < Entropy.LowNats).toLong))
    }
    val got = Entropy.charEntropy(spark, sfDir).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (n, mean, mn, mx, low) = expect(r.getString(0))
      assert(r.getLong(1) == n)
      assert(r.getDouble(2) == mean, s"${r.getString(0)} mean")
      assert(r.getDouble(3) == mn, s"${r.getString(0)} min")
      assert(r.getDouble(4) == mx, s"${r.getString(0)} max")
      assert(r.getLong(5) == low, s"${r.getString(0)} n_low")
    }
  }

  test("codepoint census: supplementary-plane chars count ONCE") {
    // the r14 ADVICE divergence class: split(text, "") counted a
    // surrogate PAIR as two lone-surrogate 'characters' while the
    // DuckDB oracle's string_split counts codepoints — the census
    // expression must agree with the oracle on non-BMP text too
    import spark.implicits._
    val got = Seq("a😀😀b", "😀", "xyx")
      .toDF("text")
      .select(graft.expressions.CodepointCounts.counts(
        org.apache.spark.sql.functions.col("text")).as("m"))
      .as[Map[String, Long]].collect()
    assert(got(0) === Map("a" -> 1L, "😀" -> 2L, "b" -> 1L))
    assert(got(1) === Map("😀" -> 1L))
    assert(got(2) === Map("x" -> 2L, "y" -> 1L))
  }

  test("entropy sits in the sane band for natural-ish text") {
    // the synthetic corpus is lowercase words + spaces: entropy must
    // be positive and below ln(alphabet) for every source
    val rows = Entropy.charEntropy(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getDouble(3) > 0.0, "min entropy must be positive")
      assert(r.getDouble(4) < 4.5, "max entropy above any text band")
    }
  }
}
