package graft

import graft.ops.Incremental
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {

  test("incrementally maintained rollup equals the full recompute exactly") {
    val maintained = Incremental.incrementalRollup(spark, sfDir)
      .collect().toSeq
    val full = Tables.events(spark, sfDir)
      .withColumn("day", col("ts").cast("date").cast("string"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(28,10)")).cast("double"), 2)
          .as("total_value"))
      .orderBy(col("event_type"), col("day"))
      .collect().toSeq
    assert(maintained === full)
  }

  test("merging three deltas equals merging one (associativity)") {
    val e = Tables.events(spark, sfDir).withColumn("day",
      col("ts").cast("date"))
    def part(p: org.apache.spark.sql.Column) = e.filter(p)
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,10)")).as("v"))
    val m = pmod(col("user_id"), lit(3))
    val threeWay = Incremental.finalize(Incremental.merge(
      part(m === 0), part(m === 1), part(m === 2)))
      .orderBy(col("event_type"), col("day")).collect().toSeq
    val oneShot = Incremental.finalize(part(lit(true)))
      .orderBy(col("event_type"), col("day")).collect().toSeq
    assert(threeWay === oneShot)
  }
}
