package graft

import graft.ops.Evolution
import org.apache.spark.sql.functions._

/** Schema evolution (q193): old-vintage rows surface the evolved
  * column as NULL (never dropped, never erroring), the additive-union
  * schema assert rejects a type drift, and the census matches a
  * driver replay of the staging rule. */
class EvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("merged read: gen-1 rows carry NULL quality, gen-2 rows carry the score") {
    val base = Evolution.stage(spark, sfDir)
    val merged = spark.read.option("mergeSchema", "true").parquet(base)
    val byGen = merged.groupBy($"gen")
      .agg(count(lit(1)).as("n"),
        sum($"quality".isNull.cast("long")).as("nulls"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byGen(1)._1 == byGen(1)._2, "every gen-1 row must be NULL quality")
    assert(byGen(2)._2 == 0L, "no gen-2 row may lose its quality value")
  }

  test("a type drift in the evolved column fails the union assert loudly") {
    val base = Evolution.stage(spark, sfDir)
    // sabotage: a third vintage re-types quality as STRING
    val bad = s"$base/gen=3"
    Tables.documents(spark, sfDir)
      .limit(5).select($"doc_id", $"source", $"text",
        lit("high").as("quality"))
      .write.mode("overwrite").parquet(bad)
    try {
      val e = intercept[Exception] {
        Evolution.evolvedCensus(spark, sfDir)
      }
      // either parquet merge itself refuses or our union assert does —
      // both are LOUD; silent coercion is the failure mode under test
      assert(e.getMessage != null)
    } finally {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(bad), true)
    }
  }

  test("census matches a driver replay of the staging rule") {
    def round6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source").as[(Long, String)].collect()
    val expected = docs.groupBy { case (id, src) => (src, (1 + id % 2).toInt) }
      .map { case ((src, gen), rows) =>
        val qsum = rows.filter(_._1 % 2 == 1)
          .map(r => BigDecimal(round6((r._1 % 97).toDouble / 97.0))
            .setScale(6)).sum
        (src, gen, rows.length.toLong,
          rows.count(_._1 % 2 == 1).toLong, round6(qsum.toDouble))
      }.toSet
    val got = Evolution.evolvedCensus(spark, sfDir)
      .as[(String, Int, Long, Long, Double)].collect().toSet
    assert(got == expected)
  }
}
