package graft

import graft.ops.Partitioning
import org.apache.spark.sql.functions._

/** Partitioned-layout scan levers (q164/q165): the layout writes one
  * file per day directory, static day ranges prune at planning time,
  * DPP prunes at runtime off the hot-day dim, and both rollups equal
  * the plain-table computation — the layout changes the plan, never
  * the answer. The pruning asserts themselves live INSIDE the queries
  * (q153 pattern); this spec exercises them plus the answer parity.
  */
class PartitioningSpec extends SparkSpec {
  import spark.implicits._

  private def plainDays = Tables.events(spark, sfDir)
    .withColumn("day", date_format($"ts", "yyyy-MM-dd"))

  test("layout writes exactly one file per day directory") {
    val path = Partitioning.writePartitioned(spark, sfDir)
    val days = plainDays.select($"day").distinct().as[String].collect()
    val files = spark.read.parquet(path).inputFiles
    assert(files.length === days.length,
      s"${files.length} files for ${days.length} days — small-file fanout")
    val byDay = files.groupBy(f =>
      "day=([0-9-]+)".r.findFirstMatchIn(f).get.group(1))
    assert(byDay.keySet === days.toSet)
    assert(byDay.values.forall(_.length == 1))
  }

  test("q164 static pruning answer equals the plain-table rollup") {
    val got = Partitioning.prunedRollup(spark, sfDir)
      .as[(String, Long, Long, Double)].collect().toSeq
    val want = plainDays
      .filter($"day" >= Partitioning.PruneLo && $"day" <= Partitioning.PruneHi)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), countDistinct($"user_id").as("u"),
        round(sum($"value".cast("decimal(28,10)")).cast("double"), 2).as("s"))
      .orderBy($"event_type")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q165 DPP answer equals the plain-table hot-day rollup") {
    val perDay = plainDays.filter($"event_type" === "purchase")
      .groupBy($"day").agg(count(lit(1)).as("purchases"))
    val mean = perDay.agg(avg($"purchases")).as[Double].head()
    val hot = perDay
      .filter($"purchases" > lit(mean * Partitioning.HotFactor))
      .select($"day")
    val want = plainDays.join(hot, Seq("day"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), countDistinct($"user_id").as("u"),
        round(sum($"value".cast("decimal(28,10)")).cast("double"), 2).as("s"))
      .orderBy($"event_type")
      .as[(String, Long, Long, Double)].collect().toSeq
    val got = Partitioning.dppRollup(spark, sfDir)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got === want)
    assert(got.nonEmpty, "hot-day set must be non-empty at test SF")
  }

  test("q168 footer-stats answer equals the plain-table aggregation") {
    // the query itself hard-asserts PushedAggregation; here: the
    // stats-derived numbers are EXACT, and the scoped DSv2 confs are
    // restored after the run
    val v1Before = spark.conf.get("spark.sql.sources.useV1SourceList")
    val got = Partitioning.footerRollup(spark, sfDir)
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(spark.conf.get("spark.sql.sources.useV1SourceList") === v1Before,
      "DSv2 conf leaked past the query scope")
    val want = plainDays.groupBy($"day")
      .agg(count(lit(1)).as("n"), min($"value").as("lo"),
        max($"value").as("hi"))
      .orderBy($"day")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got === want)
    assert(got.size >= 28, "expected a ~30-day span")
  }
}
