package graft

import graft.ops.{Curation, KsDrift}
import org.apache.spark.sql.functions._

/** KS drift contract (q213): hand-computed D on a crafted sample,
  * identical samples → 0, and a from-scratch driver replay of the
  * ECDF supremum on the real carving. */
class KsDriftSpec extends SparkSpec {
  import spark.implicits._

  test("hand case: D, its threshold, and the tie rule") {
    val o = Seq(("a", 0.1), ("a", 0.2), ("a", 0.3)).toDF("source", "score")
    val n = Seq(("a", 0.3), ("a", 0.4)).toDF("source", "score")
    val r = KsDrift.ksOf(o, n).collect()(0)
    // ECDF gaps: at .1 → 1/3; .2 → 2/3; .3 → 1 − 1/2; .4 → 0
    assert(r.getLong(1) === 3L && r.getLong(2) === 2L)
    assert(r.getDouble(3) === BigDecimal(2.0 / 3.0).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(6) === 0.2, "argmax threshold (smallest on ties)")
  }

  test("identical samples drift nowhere: D = 0 for every source") {
    val s = Curation.scoreDocs(Tables.documents(spark, sfDir))
      .select(col("source"), col("score"))
    val out = KsDrift.ksOf(s, s).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      assert(r.getDouble(3) === 0.0)
      assert(!r.getBoolean(5))
    }
  }

  test("q213 replays from a from-scratch ECDF supremum") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
    def scores(df: org.apache.spark.sql.DataFrame) =
      Curation.scoreDocs(df).select(col("source"), col("score"))
        .collect().map(r => (r.getString(0), r.getDouble(1)))
    val o = scores(docs.filter(pmod(col("doc_id"), lit(5)) =!= 0))
    val n = scores(docs.select(col("doc_id"), col("source"),
      when(pmod(col("doc_id"), lit(7)) === 0, concat(col("text"), lit(" v2")))
        .otherwise(col("text")).as("text")))
    val srcs = (o.map(_._1) ++ n.map(_._1)).distinct.sorted
    def r9(x: Double) = BigDecimal(x).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = srcs.map { src =>
      val ov = o.filter(_._1 == src).map(_._2)
      val nv = n.filter(_._1 == src).map(_._2)
      if (ov.isEmpty || nv.isEmpty)
        // an empty generation: KS undefined, surfaced as NULLs
        (src, ov.size.toLong, nv.size.toLong, None, None, None, None)
      else {
        val pts = (ov ++ nv).distinct.sorted
        val devs = pts.map { t =>
          (t, math.abs(ov.count(_ <= t).toDouble / ov.size
            - nv.count(_ <= t).toDouble / nv.size))
        }
        val d = devs.map(_._2).max
        val at = devs.filter(_._2 == d).map(_._1).min
        val crit = KsDrift.C05 * math.sqrt(
          (ov.size + nv.size).toDouble / (ov.size.toLong * nv.size))
        (src, ov.size.toLong, nv.size.toLong, Some(r9(d)), Some(r9(crit)),
          Some(r9(d) > r9(crit)), Some(at))
      }
    }
    def opt[T](r: org.apache.spark.sql.Row, i: Int, get: Int => T) =
      if (r.isNullAt(i)) None else Some(get(i))
    val got = KsDrift.ksReport(spark, sfDir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2),
        opt(r, 3, r.getDouble), opt(r, 4, r.getDouble),
        opt(r, 5, r.getBoolean), opt(r, 6, r.getDouble)))
    assert(got.toSeq === want)
    assert(want.exists(_._4.isEmpty),
      "the carving must exercise the empty-generation NULL path")
    assert(want.exists(_._4.nonEmpty))
  }
}
