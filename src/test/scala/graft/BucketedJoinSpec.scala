package graft

import org.apache.spark.sql.functions._

/** Bucketing evidence for the scale story: two tables bucketed on the
  * join key co-locate, and the join plans WITHOUT a shuffle exchange —
  * the pre-partitioning strategy that amortizes one write-time shuffle
  * across every future join at 100 TB.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join with no shuffle exchange") {
    // warehouse dir is a static conf; the default ./spark-warehouse
    // is fine for the test tables — but the in-memory catalog forgets
    // tables across JVMs while their directories persist, so clear
    // both the catalog entries and any stale directories
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val wh = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    Seq("b_orders", "b_lineitem").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(d)
      }
    }

    Tables.orders(spark, sfDir)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, sfDir)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString

    // the join itself must not re-shuffle either bucketed side:
    // no hashpartitioning exchange on the join keys
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
      s"lineitem side re-shuffled:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"orders side re-shuffled:\n$plan")

    // and results match the plain join
    val expected = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus").collect().toSeq
    assert(joined.orderBy("o_orderstatus").collect().toSeq === expected)
  }
}
