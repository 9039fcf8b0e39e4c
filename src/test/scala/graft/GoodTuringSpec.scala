package graft

import graft.ops.GoodTuring

/** q230 — Good-Turing frequency-of-frequencies audit. */
class GoodTuringSpec extends SparkSpec {

  private def tok(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9_]+").filter(_.nonEmpty).toSeq

  private lazy val out =
    GoodTuring.goodTuring(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap

  private lazy val replay: (Map[Long, Long], Long) = {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().foreach { r =>
        tok(r.getString(0)).foreach(t => counts(t) = counts.getOrElse(t, 0L) + 1)
      }
    val fof = counts.values.groupBy(identity).map { case (f, g) => f -> g.size.toLong }
    (fof.toMap, counts.values.sum)
  }

  test("exactly the r = 1..5 spine, ordered") {
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("n_r and n_r_next replay from a from-scratch driver count") {
    val (fof, _) = replay
    (1L to 5L).foreach { r =>
      assert(out(r).getLong(1) == fof.getOrElse(r, 0L), s"n_$r")
      assert(out(r).getLong(2) == fof.getOrElse(r + 1, 0L), s"n_${r + 1}")
    }
  }

  test("Turing estimates replay: r_star, mass_share, p_unseen") {
    val (fof, n) = replay
    def rnd6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (1L to 5L).foreach { r =>
      val nr = fof.getOrElse(r, 0L)
      val nr1 = fof.getOrElse(r + 1, 0L)
      if (nr > 0)
        assert(out(r).getDouble(3) == rnd6((r + 1).toDouble * nr1 / nr), s"r_star@$r")
      else assert(out(r).isNullAt(3), s"r_star@$r null")
      assert(out(r).getDouble(4) == rnd6(r.toDouble * nr / n), s"mass_share@$r")
      assert(out(r).getDouble(5) == rnd6(fof.getOrElse(1L, 0L).toDouble / n),
        s"p_unseen@$r")
    }
  }

  test("unseen mass is a genuine probability and the classes nest") {
    // the sf0.001 corpus happens to be hapax-free (every token type
    // repeats), so p_unseen = 0 there is the CORRECT answer; only
    // positivity-when-hapaxes-exist is an invariant
    val (fof, _) = replay
    val p = out(1L).getDouble(5)
    assert(p >= 0.0 && p < 1.0)
    assert((p > 0.0) == (fof.getOrElse(1L, 0L) > 0L))
    // mass shares of disjoint frequency classes can never exceed 1
    assert(out.values.map(_.getDouble(4)).sum <= 1.0 + 1e-9)
  }
}
