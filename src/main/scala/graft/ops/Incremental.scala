package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view pattern:
  * keep a daily rollup as MERGEABLE partial states (count + exact
  * DECIMAL sum), fold new batches in by key without touching
  * historical partitions. At 100 TB this is the difference between
  * re-scanning the corpus per refresh and touching only the delta;
  * the merge is exact (decimal addition is associative), so the
  * maintained view is bit-identical to a full recompute — which is
  * precisely what the oracle checks (it recomputes from scratch).
  */
object Incremental {

  /** Partial-state rollup of one slice: (event_type, day, n, sum). */
  private def partial(slice: DataFrame): DataFrame =
    slice
      .withColumn("day", col("ts").cast("date"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,10)")).as("v"))

  /** Merge any number of partial-state rollups by key — exact. */
  def merge(parts: DataFrame*): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("n")).as("n"), sum(col("v")).as("v"))

  /** Finalize partial states to the published view schema. */
  def finalize(view: DataFrame): DataFrame =
    view.select(col("event_type"), col("day").cast("string").as("day"),
      col("n"), round(col("v").cast("double"), 2).as("total_value"))

  /** q71: maintain the daily rollup across a mid-day cutoff — the
    * base slice and the delta slice SHARE the cutoff day, so the
    * merge genuinely folds states rather than concatenating disjoint
    * keys. The oracle recomputes the same rollup from scratch over
    * all events; equality proves the incremental path exact. */
  def incrementalRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val cutoff = lit("2024-07-01 12:00:00").cast("timestamp")
    val base = partial(e.filter(col("ts") < cutoff))
    val delta = partial(e.filter(col("ts") >= cutoff))
    finalize(merge(base, delta))
      .orderBy(col("event_type"), col("day"))
  }

  val incrementalRollupSql: String =
    """SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
      |  COUNT(*) AS n,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 2) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY event_type, day""".stripMargin
}
