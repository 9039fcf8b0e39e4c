package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Grouped ordinary-least-squares trend fit from exact sufficient
  * statistics — the "which way does quality move with length, per
  * source?" regression a curation dashboard puts next to the q49
  * correlation. One pass computes per-group (n, Σx, Σy, Σxy, Σx²,
  * Σy²) with the decimal-sum determinism trick (q49's discipline
  * extended to the closed-form slope/intercept/R²): products are
  * IEEE-deterministic doubles, each product is cast to a fixed-scale
  * DECIMAL so the SUM accumulates exactly under ANY partitioning,
  * and the closed forms combine the six sums in double with
  * parenthesization identical across engines, rounded once at
  * publish.
  *
  * x = ln(1 + n_chars) rounded 9 (the q69 libm-parity discipline),
  * y = the shared q84 quality score ([[Curation.scoredPoints]]).
  *
  * Scale shape: ONE partial-agg'd scan — the sufficient statistics
  * are algebraic aggregates (map-side combine collapses every
  * partition to six numbers per group), the group relation is
  * |sources|-sized, and the regression math happens on that tiny
  * relation. Adding features means adding moment columns, never
  * passes; this is why classic linear models train in one scan at
  * 100 TB while iterative solvers pay a scan per step.
  */
object Regression {

  private def dsum(c: Column, scale: Int) =
    sum(c.cast(s"decimal(38,$scale)")).cast("double")

  /** OLS report of a (source, x, y) relation — the moment-sum core,
    * exposed for the spec's perfect-line and driver replays. */
  private[graft] def olsOf(xy: DataFrame): DataFrame = {
    val agg = xy.groupBy(col("source")).agg(
      count(lit(1)).cast("double").as("n"),
      dsum(col("x"), 9).as("sx"),
      dsum(col("y"), 6).as("sy"),
      dsum(col("x") * col("y"), 15).as("sxy"),
      dsum(col("x") * col("x"), 18).as("sxx"),
      dsum(col("y") * col("y"), 12).as("syy"))
    val cov = col("n") * col("sxy") - col("sx") * col("sy")
    val varX = col("n") * col("sxx") - col("sx") * col("sx")
    val varY = col("n") * col("syy") - col("sy") * col("sy")
    val slope = cov / varX
    agg.select(col("source"), col("n").cast("long").as("n"),
      when(varX === 0.0, lit(null)).otherwise(round(slope, 6)).as("slope"),
      when(varX === 0.0, lit(null)).otherwise(
        round((col("sy") - slope * col("sx")) / col("n"), 6)).as("intercept"),
      when(varX * varY === 0.0, lit(null)).otherwise(
        round(cov * cov / (varX * varY), 6)).as("r2"))
      .orderBy(col("source"))
  }

  /** q208: per-source OLS of quality score on log-length — slope,
    * intercept, and R² from one scan's exact moment sums. */
  def olsTrend(spark: SparkSession, sfDir: String): DataFrame =
    olsOf(Curation.scoredPoints(spark, sfDir)
      .withColumn("x", round(log(lit(1.0) + col("n_chars")), 9))
      .withColumn("y", col("score")))

  val olsTrendSql: String =
    s"""WITH ${Curation.scoreCtesSql},
      |${Curation.ptsCteSql},
      |xy AS (
      |  SELECT source, ROUND(ln(1.0 + n_chars), 9) AS x, score AS y
      |  FROM pts),
      |m AS (
      |  SELECT source, CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(x AS DECIMAL(38,9))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(x * y AS DECIMAL(38,15))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE) AS syy
      |  FROM xy GROUP BY source)
      |SELECT source, CAST(n AS BIGINT) AS n,
      |  CASE WHEN (n * sxx - sx * sx) = 0.0 THEN NULL
      |    ELSE ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) END AS slope,
      |  CASE WHEN (n * sxx - sx * sx) = 0.0 THEN NULL
      |    ELSE ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) END AS intercept,
      |  CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0.0 THEN NULL
      |    ELSE ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
      |      / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) END AS r2
      |FROM m ORDER BY source""".stripMargin
}
