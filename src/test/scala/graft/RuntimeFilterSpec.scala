package graft

import graft.ops.RuntimeFilter
import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join (q176): answer parity with the plain
  * join, and the scoped confs must not leak into the session
  * (q168's no-leak discipline).
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  test("q176 equals the plain join rollup") {
    val got = RuntimeFilter.bloomPrunedJoin(spark, sfDir)
      .as[(Int, Long, Double)].collect().toSeq
    val want = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
          .filter($"o_orderpriority" === RuntimeFilter.Priority),
        $"l_orderkey" === $"o_orderkey")
      .groupBy(year($"o_orderdate").cast("int").as("o_year"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(($"l_extendedprice" * (lit(1) - $"l_discount"))
          .cast("decimal(28,10)")).cast("double"), 2).as("revenue"))
      .orderBy($"o_year")
      .as[(Int, Long, Double)].collect().toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("scoped confs are restored after the query") {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val before = keys.map(k => spark.conf.getOption(k))
    RuntimeFilter.bloomPrunedJoin(spark, sfDir).collect()
    val after = keys.map(k => spark.conf.getOption(k))
    assert(after === before)
  }
}
