package graft

import graft.ops.Bayes
import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** Trained NB quality filter (q166): from-scratch driver-side replay
  * of train + score (independent tokenizer/hash/rounding code paths),
  * model-grid completeness, a planted-vocabulary sign check, and
  * partitioning invariance (the decimal-sum scoring is
  * order-independent, so 1 vs 13 input partitions must agree
  * bit-for-bit).
  */
class BayesSpec extends SparkSpec {
  import spark.implicits._

  private def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def tok(s: String): Seq[String] =
    s.toLowerCase.split("[^a-z0-9_]+").filter(_.nonEmpty).toSeq

  private def round(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q166 equals a from-scratch driver-side replay") {
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect().toSeq
    val toks = docs.flatMap { case (id, src, text) =>
      tok(text).map(t =>
        (id, src, Bayes.CuratedSources.contains(src),
          (hash60(t) % Bayes.Bins).toInt))
    }
    // train
    val counts = toks.groupBy(t => (t._3, t._4)).map { case (k, v) =>
      k -> v.size.toLong
    }
    val totals = toks.groupBy(_._3).map { case (k, v) => k -> v.size.toLong }
    val lp = (for {
      curated <- Seq(true, false); bin <- 0 until Bayes.Bins
    } yield (curated, bin) -> round(
      math.log((counts.getOrElse((curated, bin), 0L) + 1.0)
        / (totals(curated) + Bayes.Bins.toDouble)), 9)).toMap
    val w = (0 until Bayes.Bins)
      .map(b => b -> (lp((true, b)) - lp((false, b)))).toMap
    // score: exact decimal sums, round(…, 6) at publication
    val perDoc = toks.groupBy(t => (t._2, t._1)).map { case ((src, id), ts) =>
      val s = ts.map(t => BigDecimal(w(t._4)).setScale(12,
        BigDecimal.RoundingMode.HALF_UP)).sum
      (src, id, round(s.toDouble / ts.size, 6))
    }.toSeq
    val expected = perDoc.groupBy(_._1).map { case (src, rows) =>
      val kept = rows.count(_._3 > 0.0)
      val avg = rows.map(r => BigDecimal(r._3).setScale(6,
        BigDecimal.RoundingMode.HALF_UP)).sum
      (src, rows.size.toLong, kept.toLong,
        round(kept.toDouble / rows.size, 6),
        round(avg.toDouble / rows.size, 6))
    }.toSeq.sortBy(_._1)
    val got = Bayes.nbQualityFilter(spark, sfDir)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("model grid is complete: 2 x Bins rows, all log-probs negative") {
    val docs = Tables.documents(spark, sfDir)
    val toks = docs.select($"doc_id", $"source",
      $"source".isin(Bayes.CuratedSources: _*).as("curated"),
      explode(TextOps.tokens($"text")).as("tok"))
    val m = Bayes.model(spark, toks).collect()
    assert(m.length === 2 * Bayes.Bins)
    assert(m.forall(_.getDouble(2) < 0.0))
  }

  test("planted vocabulary separates the classes by llr sign") {
    // curated docs speak 'alpha', wild docs speak 'beta': the trained
    // weights must score alpha-bins positive and beta-bins negative
    val crafted = Seq(
      (1L, "src0", true, "alpha alpha alpha common"),
      (2L, "src1", true, "alpha alpha common"),
      (3L, "src9", false, "beta beta beta common"),
      (4L, "src8", false, "beta beta common"))
      .toDF("doc_id", "source", "curated", "text")
    val toks = crafted.select($"doc_id", $"source", $"curated",
      explode(TextOps.tokens($"text")).as("tok"))
    val m = Bayes.model(spark, toks)
    val w = m.groupBy($"bin").agg(
      (sum(when($"curated", $"lp").otherwise(lit(0.0)))
        - sum(when(!$"curated", $"lp").otherwise(lit(0.0)))).as("w"))
      .as[(Long, Double)].collect().toMap
    val alphaBin = hash60("alpha") % Bayes.Bins
    val betaBin = hash60("beta") % Bayes.Bins
    assert(w(alphaBin) > 0.0, "curated-only token must weigh positive")
    assert(w(betaBin) < 0.0, "wild-only token must weigh negative")
  }

  test("answer is invariant to input partitioning") {
    val base = Bayes.nbQualityFilter(spark, sfDir)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    // the op reads Tables directly; partition-shuffle the shuffle
    // config instead to perturb every exchange's task layout
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val alt = Bayes.nbQualityFilter(spark, sfDir)
        .as[(String, Long, Long, Double, Double)].collect().toSeq
      assert(alt === base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
