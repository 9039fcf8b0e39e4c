package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

/** Degree-assortativity contract (q218): closed-form graphs (star
  * = −1, regular = NULL, matched components = +1) and a driver
  * replay on the real edge list. */
class AssortativitySpec extends SparkSpec {
  import spark.implicits._

  private def rOf(edges: Seq[(Long, Long)]): (Long, Option[Double]) = {
    val r = Graph.assortativityOf(edges.toDF("src", "dst")).collect()(0)
    (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getDouble(2)))
  }

  test("closed forms: star is perfectly disassortative, regular is undefined, matched components are perfectly assortative") {
    // star K1,3: hub deg 3 ↔ leaves deg 1 → r = −1
    assert(rOf(Seq((0L, 1L), (0L, 2L), (0L, 3L))) === (3L, Some(-1.0)))
    // 4-cycle: every degree 2 → zero variance → NULL
    assert(rOf(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)))
      === (4L, None))
    // triangle ∪ disjoint edge: endpoints always equal-degree → r = 1
    assert(rOf(Seq((0L, 1L), (1L, 2L), (2L, 0L), (10L, 11L)))
      === (4L, Some(1.0)))
    // self-loops are dropped before symmetrizing
    assert(rOf(Seq((0L, 0L), (0L, 1L), (0L, 2L), (0L, 3L)))
      === (3L, Some(-1.0)))
  }

  test("q218 replays from the collected symmetrized edge list") {
    val edges = Tables.lineitem(spark, sfDir)
      .select(pmod(col("l_orderkey"), lit(2000)).as("src"),
        pmod(col("l_partkey"), lit(2000)).as("dst")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(e => e._1 != e._2)
    val und = (edges ++ edges.map(e => (e._2, e._1))).distinct
    val deg = und.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val pairs = und.map { case (u, v) => (deg(u), deg(v)) }
    val m = pairs.size.toDouble
    def s(f: ((Long, Long)) => Long) = pairs.map(p => BigInt(f(p))).sum.toDouble
    val (sx, sy) = (s(_._1), s(_._2))
    val sxy = pairs.map(p => BigInt(p._1) * p._2).sum.toDouble
    val sxx = pairs.map(p => BigInt(p._1) * p._1).sum.toDouble
    val syy = pairs.map(p => BigInt(p._2) * p._2).sum.toDouble
    val want = (m * sxy - sx * sy) /
      math.sqrt((m * sxx - sx * sx) * (m * syy - sy * sy))
    val r = Graph.assortativity(spark, sfDir).collect()(0)
    assert(r.getLong(0) === und.size.toLong / 2)
    assert(r.getDouble(2) === BigDecimal(want).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
