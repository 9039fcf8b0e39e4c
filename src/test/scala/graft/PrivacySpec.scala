package graft

import graft.ops.Privacy
import org.apache.spark.sql.functions._

/** k-anonymity audit (q170): driver-side replay of the group-size
  * sweep, curve monotonicity, and the one-scan contract (the whole
  * k-sweep must be conditional aggregation over one pass — not one
  * job per k).
  */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("q170 equals a from-scratch group-size replay") {
    val rows = Tables.customer(spark, sfDir)
      .select($"c_nationkey".cast("long"), $"c_mktsegment", $"c_acctbal")
      .as[(Long, String, Double)].collect().toSeq
    val sizes = rows.groupBy { case (n, s, b) =>
      (n, s, math.floor(b / 1000.0).toLong)
    }.map(_._2.size.toLong).toSeq
    val nRows = sizes.sum
    val expected = Privacy.Ks.map { k =>
      val below = sizes.filter(_ < k)
      (k.toLong, sizes.size.toLong, below.size.toLong, below.sum,
        BigDecimal(below.sum.toDouble / nRows)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = Privacy.kAnonymityAudit(spark, sfDir)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === expected)
    // the curve is monotone in k by construction — a violation means
    // the sweep columns got crossed
    assert(got.map(_._4) === got.map(_._4).sorted)
  }

  test("q174 equals a from-scratch diversity replay") {
    val rows = Tables.customer(spark, sfDir)
      .select($"c_nationkey".cast("long"), $"c_mktsegment", $"c_acctbal")
      .as[(Long, String, Double)].collect().toSeq
    val groups = rows.groupBy { case (n, _, b) =>
      (n, math.floor(b / 1000.0).toLong)
    }.toSeq.map { case (_, rs) =>
      (rs.size.toLong, rs.map(_._2).distinct.size.toLong)
    }
    val nRows = groups.map(_._1).sum
    val expected = Privacy.Ls.map { l =>
      val leak = groups.filter(_._2 < l)
      (l.toLong, groups.size.toLong, leak.size.toLong, leak.map(_._1).sum,
        BigDecimal(leak.map(_._1).sum.toDouble / nRows)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = Privacy.lDiversityAudit(spark, sfDir)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === expected)
    assert(got.map(_._4) === got.map(_._4).sorted)
  }

  test("the l-sweep is one scan, not one job per l") {
    val df = Privacy.lDiversityAudit(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"expected exactly one customer scan, got $scans:\n$p")
  }

  test("the k-sweep is one scan, not one job per k") {
    val df = Privacy.kAnonymityAudit(spark, sfDir)
    df.collect() // finalize the adaptive plan
    // AdaptiveSparkPlan.toString repeats the tree under "== Initial
    // Plan ==" — count scans in the FINAL plan section only
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"expected exactly one customer scan, got $scans:\n$p")
  }
}
