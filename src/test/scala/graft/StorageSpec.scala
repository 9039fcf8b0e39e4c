package graft

import org.apache.spark.sql.functions._

/** Storage-layout evidence for the scale story: domain-partitioned
  * parquet gets partition-pruned scans (the reference's B-tree/index
  * role, SURVEY §4), and pruning is visible in the physical plan.
  */
class StorageSpec extends SparkSpec {

  test("domain-partitioned corpus write → partition-pruned point read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val wp = Corpus.webPages(spark, sfDir)
    wp.write.mode("overwrite").partitionBy("domain").parquet(dir)

    val back = spark.read.parquet(dir).filter(col("domain") === "d3.test")
    val plan = back.queryExecution.executedPlan.toString
    // partition filter must reach the scan, not a post-scan Filter
    assert(plan.contains("PartitionFilters: [isnotnull(domain"),
      s"no partition pruning in plan:\n$plan")
    val expected = wp.filter(col("domain") === "d3.test").count()
    assert(back.count() === expected)
  }

  test("salted join returns exactly the plain join's result") {
    val plain = {
      import org.apache.spark.sql.DataFrame
      val e = Tables.events(spark, sfDir)
        .withColumn("k", when(pmod(col("user_id"), lit(3)) === 0, lit(0L))
          .otherwise(col("user_id")))
      val dim = e.select(col("k")).distinct()
        .withColumn("cohort", when(col("k") === 0, lit("hot")).otherwise(
          when(pmod(col("k"), lit(2)) === 0, lit("even")).otherwise(lit("odd"))))
      e.join(dim, Seq("k")).groupBy(col("cohort"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("k")).as("n_keys"))
        .orderBy(col("cohort")).collect().toSeq
    }
    val salted = ops.Skew.saltedHotKeyJoin(spark, sfDir).collect().toSeq
    assert(salted === plain)
  }
}
