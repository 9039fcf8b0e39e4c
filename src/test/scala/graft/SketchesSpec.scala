package graft

import graft.ops.Sketches
import org.apache.spark.sql.functions._

/** Semantic guarantees of the sketch trio (q88-q90): Bloom filters
  * never lose a key, HLL registers MAX-merge exactly (the property
  * that makes the sketch shuffle-free at scale), count-min only
  * overcounts, and the estimates land within their theoretical
  * error bands.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("bloom semi-join has zero false negatives and sane reduction") {
    val r = Sketches.bloomSemiJoin(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_false_neg") === 0L)
    assert(r.getAs[Long]("n_bloom_pass") >= r.getAs[Long]("n_flagged"))
    // 4 hashes into 16384 bits over ≤ ~200 keys: fp_rate ≪ 1%
    assert(r.getAs[Double]("fp_rate") < 0.01)
  }

  test("HLL registers MAX-merge exactly across disjoint slices") {
    val ev = Tables.events(spark, sfDir)
    val whole = Sketches.hllRegisters(ev)
    val a = Sketches.hllRegisters(ev.filter(pmod($"event_id", lit(2)) === 0))
    val b = Sketches.hllRegisters(ev.filter(pmod($"event_id", lit(2)) === 1))
    val merged = a.unionByName(b).groupBy($"reg").agg(max($"m").as("m"))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("HLL estimate lands within the m=1024 error band") {
    val r = Sketches.hllDistinct(spark, sfDir).collect().head
    // linear-counting regime at test SFs: well under 10% error
    assert(r.getAs[Double]("rel_err") < 0.1,
      s"rel_err ${r.getAs[Double]("rel_err")}")
    assert(r.getAs[Long]("empty_registers") > 0)
  }

  test("count-min never undercounts and is exact for clear heavy hitters") {
    val rows = Sketches.cmsHeavyHitters(spark, sfDir).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L, s"undercount on $r")
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_cnt"))
    }
  }
}
