package graft

import graft.ops.Gini
import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** Gini contract (q216): closed-form distributions, tie-order
  * invariance of the run-sum identity, and a driver replay on the
  * real corpus. */
class GiniSpec extends SparkSpec {
  import spark.implicits._

  private def rnd(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def gini(vs: Seq[(String, Long)]): Map[String, Option[Double]] =
    Gini.giniOf(vs.toDF("stratum", "v")).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap

  /** Driver Gini by the rank identity over an explicit sort. */
  private def giniDriver(vs: Seq[Long]): Double = {
    val s = vs.sorted
    val n = s.size
    val sxr = s.zipWithIndex.map { case (x, i) =>
      BigInt(x) * (i + 1) }.sum
    val sx = s.map(BigInt(_)).sum
    2.0 * sxr.toDouble / (n.toDouble * sx.toDouble) -
      (n + 1).toDouble / n
  }

  test("closed forms: uniform → 0, single-holder → (n−1)/n, hand case") {
    assert(gini(Seq.fill(7)(("u", 5L)))("u") === Some(0.0))
    assert(gini(Seq(("s", 0L), ("s", 0L), ("s", 0L), ("s", 100L)))("s")
      === Some(0.75))
    // 1,2,3,4: Σi·x = 30, Σx = 10 → 60/40 − 5/4 = 0.25
    assert(gini(Seq(("h", 1L), ("h", 2L), ("h", 3L), ("h", 4L)))("h")
      === Some(0.25))
    assert(gini(Seq(("z", 0L), ("z", 0L)))("z") === Some(None).flatten,
      "zero total supply → NULL, not a division blowup")
  }

  test("the run-sum identity is tie-order invariant (≡ explicit sort)") {
    val vs = Seq(3L, 7L, 7L, 7L, 1L, 1L, 12L, 0L, 7L, 3L)
    val got = gini(vs.map(("t", _)))("t").get
    assert(got === rnd(giniDriver(vs), 6))
  }

  test("q216 replays from collected token counts; strata pool correctly") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("v")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val strata = (docs.map(_._1).distinct :+ "_all").sorted
    val want = strata.map { st =>
      val vs = if (st == "_all") docs.map(_._2).toSeq
        else docs.filter(_._1 == st).map(_._2).toSeq
      (st, vs.size.toLong, vs.sum,
        if (vs.sum == 0) None else Some(rnd(giniDriver(vs), 6)))
    }
    val got = Gini.tokenGini(spark, sfDir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.toSeq === want)
  }
}
