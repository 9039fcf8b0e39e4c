package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probability calibration audit — the reliability diagram + Brier
  * decomposition for the q84 quality model against the q166 seed
  * labels (Brier 1950; DeGroot & Fienberg 1983): q185's AUC says the
  * score ORDERING is good, but a filter that thresholds at "score ≥
  * 0.5" is trusting the score as a PROBABILITY, and an uncalibrated
  * model with perfect AUC can still put 0.9 on a class that fires
  * 60% of the time. The report is the per-decile (predicted mean vs
  * observed rate) table a reliability diagram plots, each bin
  * carrying its Brier contribution.
  *
  * Determinism: scores are q84's 6-decimal doubles; each squared
  * error is rounded to 9 before the exact DECIMAL sum
  * (order-independent), published at 6.
  *
  * Scale shape: one scoring scan collapsing map-side to ≤10 decile
  * partials — the whole report is one partial-agg'd pass; at
  * production SF the score column is stored and this is a
  * metadata-cheap sweep.
  */
object Calibration {

  private def decile(score: Column): Column =
    least(floor(score * 10).cast("int"), lit(9))

  /** q189: per-decile reliability — count, mean predicted score,
    * observed positive rate, calibration gap, Brier contribution. */
  def reliabilityReport(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = Curation.scoreDocs(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("score"),
        col("source").isin(Bayes.CuratedSources: _*).as("pos"))
    val withErr = scored.select(decile(col("score")).as("bin"), col("score"),
      col("pos"),
      round((col("score") - when(col("pos"), lit(1.0)).otherwise(lit(0.0)))
        * (col("score") - when(col("pos"), lit(1.0)).otherwise(lit(0.0))), 9)
        .as("sq_err"))
    withErr.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("score").cast("decimal(28,6)")).cast("double")
          / count(lit(1)), 6).as("mean_pred"),
        round(sum(when(col("pos"), 1L).otherwise(0L)).cast("double")
          / count(lit(1)), 6).as("obs_rate"),
        round(sum(col("sq_err").cast("decimal(28,12)")).cast("double"), 6)
          .as("brier_sum"))
      .withColumn("gap", round(col("mean_pred") - col("obs_rate"), 6))
      .orderBy(col("bin"))
  }

  /** DuckDB oracle: the shared q84 scoring chain + identical bin
    * math and rounding points. */
  val reliabilityReportSql: String = {
    val curatedIn = Bayes.CuratedSources.map(s => s"'$s'").mkString(", ")
    s"""WITH ${Curation.scoreCtesSql},
      |labeled AS (
      |  SELECT doc_id, score, source IN ($curatedIn) AS pos FROM s),
      |err AS (
      |  SELECT LEAST(CAST(FLOOR(score * 10) AS INT), 9) AS bin, score, pos,
      |    ROUND((score - CASE WHEN pos THEN 1.0 ELSE 0.0 END)
      |      * (score - CASE WHEN pos THEN 1.0 ELSE 0.0 END), 9) AS sq_err
      |  FROM labeled)
      |SELECT bin, COUNT(*) AS n,
      |  ROUND(CAST(SUM(CAST(score AS DECIMAL(28,6))) AS DOUBLE)
      |    / COUNT(*), 6) AS mean_pred,
      |  ROUND(CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)
      |    / COUNT(*), 6) AS obs_rate,
      |  ROUND(CAST(SUM(CAST(sq_err AS DECIMAL(28,12))) AS DOUBLE), 6)
      |    AS brier_sum,
      |  ROUND(ROUND(CAST(SUM(CAST(score AS DECIMAL(28,6))) AS DOUBLE)
      |      / COUNT(*), 6)
      |    - ROUND(CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)
      |      / COUNT(*), 6), 6) AS gap
      |FROM err GROUP BY bin ORDER BY bin""".stripMargin
  }
}
