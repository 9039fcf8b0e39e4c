package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Winsorized and interquantile (trimmed) means — the robust location
  * estimators between q7's raw mean (shatters under one bad sensor)
  * and q132's MAD outlier REPORT (flags rows but doesn't publish a
  * usable center): metric pipelines feeding dashboards or reward
  * models clamp or drop the tails before averaging, and the two
  * standard recipes differ exactly in how they treat the excluded
  * mass — winsorizing CLAMPS values into [p05, p95] (tail rows still
  * vote, at the boundary), trimming DROPS values outside it (the
  * interquantile mean). Publishing both next to the raw mean makes
  * the tail influence measurable: raw − winsorized ≈ what the tails
  * were worth.
  *
  * Exactness: the percentile cutoffs use the exact
  * linear-interpolation percentile (q46's cross-engine parity), means
  * accumulate in DECIMAL and round once at 6; the boundary rule
  * (values EQUAL to a cutoff are kept/unclamped) is explicit and
  * identical in both engines.
  *
  * Scale shape: pass 1 computes per-group exact percentiles (the same
  * per-group sort q46 already pays — at 100 TB swap in the q204
  * t-digest under its error contract if approximate cutoffs are
  * acceptable); the resulting |groups|-row cutoff relation BROADCASTS
  * back into pass 2, one conditional partial-agg'd scan. Nothing
  * data-proportional ever sits on the driver.
  */
object RobustStats {

  /** The report over any (event_type, value) relation — exposed for
    * the spec's crafted boundary cases and driver replay. */
  private[graft] def robustMeansOf(ev: DataFrame): DataFrame = {
    val cuts = ev.groupBy(col("event_type")).agg(
      round(expr("percentile(value, 0.05)"), 6).as("p05"),
      round(expr("percentile(value, 0.95)"), 6).as("p95"))
    ev.join(broadcast(cuts), Seq("event_type"))
      .withColumn("wv", greatest(least(col("value"), col("p95")), col("p05")))
      .withColumn("in_band",
        col("value") >= col("p05") && col("value") <= col("p95"))
      .groupBy(col("event_type"), col("p05"), col("p95"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(28,10)")).cast("double")
          / count(lit(1)), 6).as("mean_raw"),
        round(sum(col("wv").cast("decimal(28,10)")).cast("double")
          / count(lit(1)), 6).as("mean_winsor"),
        round(sum(when(col("in_band"), col("value"))
          .cast("decimal(28,10)")).cast("double")
          / sum(when(col("in_band"), 1L).otherwise(0L)), 6).as("mean_trim"),
        sum(when(!col("in_band"), 1L).otherwise(0L)).as("n_trimmed"))
      .select(col("event_type"), col("n"), col("mean_raw"),
        col("p05"), col("p95"), col("mean_winsor"), col("mean_trim"),
        col("n_trimmed"))
      .orderBy(col("event_type"))
  }

  /** q212: per-event-type raw vs winsorized vs trimmed mean of
    * `value`, with the 5%/95% cutoffs and trimmed-row accounting. */
  def robustMeans(spark: SparkSession, sfDir: String): DataFrame =
    robustMeansOf(Tables.events(spark, sfDir)
      .select(col("event_type"), col("value")))

  val robustMeansSql: String =
    """WITH cuts AS (
      |  SELECT event_type,
      |    ROUND(quantile_cont(value, 0.05), 6) AS p05,
      |    ROUND(quantile_cont(value, 0.95), 6) AS p95
      |  FROM events GROUP BY event_type),
      |j AS (
      |  SELECT e.event_type, e.value, c.p05, c.p95,
      |    GREATEST(LEAST(e.value, c.p95), c.p05) AS wv,
      |    e.value >= c.p05 AND e.value <= c.p95 AS in_band
      |  FROM events e JOIN cuts c USING (event_type))
      |SELECT event_type, COUNT(*) AS n,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE)
      |    / COUNT(*), 6) AS mean_raw,
      |  p05, p95,
      |  ROUND(CAST(SUM(CAST(wv AS DECIMAL(28,10))) AS DOUBLE)
      |    / COUNT(*), 6) AS mean_winsor,
      |  ROUND(CAST(SUM(CAST(CASE WHEN in_band THEN value END
      |      AS DECIMAL(28,10))) AS DOUBLE)
      |    / SUM(CASE WHEN in_band THEN 1 ELSE 0 END), 6) AS mean_trim,
      |  CAST(SUM(CASE WHEN NOT in_band THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_trimmed
      |FROM j GROUP BY event_type, p05, p95
      |ORDER BY event_type""".stripMargin
}
