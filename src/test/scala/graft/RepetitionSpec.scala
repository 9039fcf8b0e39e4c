package graft

import graft.ops.Repetition

/** Gopher repetition signals (q184): hand-checked fractions on
  * crafted loops, the deterministic tie-break, the short-doc
  * convention, and a brute-force driver replay of the census. */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def fracs(texts: (Long, String)*): Map[Long, Double] = {
    val df = texts.toSeq.toDF("doc_id", "text")
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
    Repetition.topGramFrac(df, 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("frac")).toMap
  }

  test("a pure generation loop scores ~1, diverse text scores low") {
    // "ab cd" * 4: top bigram "ab cd" count 4 (overlapping "cd ab" 3),
    // len("ab cd")=5, chars=19 ("ab cd ab cd ab cd ab" + "cd"... exact
    // string below is 4 repeats joined: length 4*5+3 = 23)
    val loop = "ab cd ab cd ab cd ab cd" // 23 chars
    val f = fracs(1L -> loop, 2L -> "one two three four five six")
    assert(math.abs(f(1L) - 4.0 * 5 / 23) < 1e-6) // published at 6 decimals
    // diverse: every bigram count 1 → top cnt 1
    assert(f(2L) < 0.30)
  }

  test("tie-break picks the lexicographically smallest top gram") {
    // "b a b" → bigrams: "b a", "a b" each count 1; tie → "a b" (len 3)
    val f = fracs(1L -> "b a b") // chars = 5
    assert(math.abs(f(1L) - 1.0 * 3 / 5) < 1e-9)
  }

  test("docs too short for a gram count as zero repetition") {
    val df = Seq((1L, "word", "s"), (2L, "", "s")).toDF("doc_id", "text", "source")
    assert(Repetition.topGramFrac(df, 2).collect().isEmpty,
      "no gram rows for sub-gram docs")
  }

  test("census matches a brute-force driver replay") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect()
    def topFrac(text: String, n: Int): Double = {
      val toks = text.toLowerCase.split("[^a-z0-9_]+").filter(_.nonEmpty)
      if (toks.length < n) 0.0
      else {
        val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
        val (gram, cnt) = grams.groupBy(identity).view
          .mapValues(_.size).toSeq
          .minBy { case (g, c) => (-c, g) }
        BigDecimal(cnt.toDouble * gram.length / text.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    val expected = docs.groupBy(_._2).map { case (src, rows) =>
      val f2 = rows.map(r => topFrac(r._3, 2))
      val f3 = rows.map(r => topFrac(r._3, 3))
      // mirror the query exactly: exact-decimal sum → double → divide
      def avg6(xs: Seq[Double]) = BigDecimal(
        xs.map(x => BigDecimal(x).setScale(6)).sum.toDouble / xs.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (src, rows.length.toLong, avg6(f2), avg6(f3),
        f2.count(_ > Repetition.Frac2Cut).toLong,
        f3.count(_ > Repetition.Frac3Cut).toLong)
    }.toSet
    val got = Repetition.repetitionCensus(spark, sfDir).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getLong(5))
    }.toSet
    assert(got == expected)
  }
}
