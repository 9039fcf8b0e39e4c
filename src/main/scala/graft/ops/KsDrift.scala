package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact two-sample Kolmogorov–Smirnov drift test per source —
  * the distribution-free sharpening of q190's PSI: PSI buckets
  * scores into 10 fixed deciles (a shift entirely inside one decile
  * is invisible), while the KS statistic D = sup_t |F_old(t) −
  * F_new(t)| compares the FULL empirical CDFs and comes with the
  * classic significance line D > c(α)·√((n+m)/(n·m)), c(0.05) =
  * 1.358 (Smirnov 1948). Same q106 snapshot generations, same shared
  * q84 scoring chain — the metric watches the exact distribution the
  * deployed filter consumes.
  *
  * Exactness & determinism: the supremum over all thresholds is
  * attained at observed score values, so evaluating the CDF gap at
  * every DISTINCT (source, score) is the exact D — and scores round
  * to 6 decimals, so that relation is bounded by 10^6 rows per source
  * at ANY corpus size (the q185 argument). ECDFs are integer running
  * counts over that bounded relation; gaps are deterministic double
  * divisions; the argmax threshold ties break to the smallest score
  * via an explicit window-max + filter, identically in both engines.
  *
  * Scale shape: two scoring scans partial-agg to per-(source, score)
  * counts; every window partitions by source (parallel across
  * sources, bounded rows within); the report is |sources| rows.
  */
object KsDrift {

  /** Smirnov α = 0.05 two-sample coefficient. */
  val C05 = 1.358

  /** q213: per-source exact KS D between the OLD and NEW snapshot
    * score distributions, with the α=0.05 critical value, the drift
    * verdict, and the threshold attaining D. */
  def ksReport(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
    // the q106 carving (single-sourced convention, as in q190)
    val oldDocs = d.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val newDocs = d.select(col("doc_id"), col("source"),
      when(pmod(col("doc_id"), lit(7)) === 0, concat(col("text"), lit(" v2")))
        .otherwise(col("text")).as("text"))
    def scored(docs: DataFrame): DataFrame =
      Curation.scoreDocs(docs).select(col("source"), col("score"))
    ksOf(scored(oldDocs), scored(newDocs))
  }

  /** KS report of two (source, score) samples — the test core,
    * exposed for the spec's identical-sample and hand-case replays. */
  private[graft] def ksOf(oldS: DataFrame, newS: DataFrame): DataFrame = {
    val counts = oldS.withColumn("gen", lit("o"))
      .unionByName(newS.withColumn("gen", lit("n")))
      .groupBy(col("source"), col("score"))
      .agg(sum(when(col("gen") === "o", 1L).otherwise(0L)).as("c_o"),
        sum(when(col("gen") === "n", 1L).otherwise(0L)).as("c_n"))
    val bySrc = Window.partitionBy(col("source"))
    val run = bySrc.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cdf = counts
      .withColumn("cum_o", sum(col("c_o")).over(run))
      .withColumn("cum_n", sum(col("c_n")).over(run))
      .withColumn("t_o", sum(col("c_o")).over(bySrc))
      .withColumn("t_n", sum(col("c_n")).over(bySrc))
      // a generation can be EMPTY for a source (the q106 carving
      // removes every doc of an all-multiple-of-5 source from OLD):
      // KS against an empty sample is undefined — surface NULL, never
      // drop the source or fake a D
      .withColumn("dev", when(col("t_o") > 0 && col("t_n") > 0, abs(
        col("cum_o").cast("double") / col("t_o")
          - col("cum_n").cast("double") / col("t_n"))))
      .withColumn("maxdev", max(col("dev")).over(bySrc))
    cdf.groupBy(col("source"), col("t_o"), col("t_n"))
      .agg(round(max(col("dev")), 9).as("ks_d"),
        min(when(col("dev") === col("maxdev"), col("score"))).as("at_score"))
      .withColumn("ks_crit",
        // t_o·t_n multiplies in DOUBLE — a long product wraps at
        // corpus scale while the oracle's HUGEINT doesn't
        when(col("t_o") > 0 && col("t_n") > 0, round(lit(C05) * sqrt(
          (col("t_o") + col("t_n")).cast("double")
            / (col("t_o").cast("double") * col("t_n").cast("double"))), 9)))
      .withColumn("drifted", col("ks_d") > col("ks_crit"))
      .select(col("source"), col("t_o").as("n_old"), col("t_n").as("n_new"),
        col("ks_d"), col("ks_crit"), col("drifted"), col("at_score"))
      .orderBy(col("source"))
  }

  val ksReportSql: String = {
    val oldCtes = Curation.scoreCtesFor(
      "(SELECT doc_id, source, text FROM documents WHERE doc_id % 5 <> 0)", "o")
    val newCtes = Curation.scoreCtesFor(
      """(SELECT doc_id, source,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents)""".stripMargin, "n")
    s"""WITH $oldCtes,
      |$newCtes,
      |counts AS (
      |  SELECT source, score,
      |    CAST(SUM(CASE WHEN gen = 'o' THEN 1 ELSE 0 END) AS BIGINT) AS c_o,
      |    CAST(SUM(CASE WHEN gen = 'n' THEN 1 ELSE 0 END) AS BIGINT) AS c_n
      |  FROM (
      |    SELECT source, score, 'o' AS gen FROM os
      |    UNION ALL
      |    SELECT source, score, 'n' AS gen FROM ns)
      |  GROUP BY source, score),
      |cdf AS (
      |  SELECT source, score, c_o, c_n,
      |    SUM(c_o) OVER (PARTITION BY source ORDER BY score
      |      ROWS UNBOUNDED PRECEDING) AS cum_o,
      |    SUM(c_n) OVER (PARTITION BY source ORDER BY score
      |      ROWS UNBOUNDED PRECEDING) AS cum_n,
      |    SUM(c_o) OVER (PARTITION BY source) AS t_o,
      |    SUM(c_n) OVER (PARTITION BY source) AS t_n
      |  FROM counts),
      |dev AS (
      |  SELECT source, score, t_o, t_n,
      |    CASE WHEN t_o > 0 AND t_n > 0 THEN
      |      ABS(CAST(cum_o AS DOUBLE) / t_o - CAST(cum_n AS DOUBLE) / t_n)
      |    END AS dev
      |  FROM cdf),
      |devm AS (
      |  SELECT *, MAX(dev) OVER (PARTITION BY source) AS maxdev FROM dev)
      |SELECT source,
      |  CAST(t_o AS BIGINT) AS n_old, CAST(t_n AS BIGINT) AS n_new,
      |  ROUND(MAX(dev), 9) AS ks_d,
      |  CASE WHEN t_o > 0 AND t_n > 0 THEN
      |    ROUND($C05 * sqrt(CAST(t_o + t_n AS DOUBLE)
      |      / (CAST(t_o AS DOUBLE) * CAST(t_n AS DOUBLE))), 9) END AS ks_crit,
      |  ROUND(MAX(dev), 9) > CASE WHEN t_o > 0 AND t_n > 0 THEN
      |    ROUND($C05 * sqrt(CAST(t_o + t_n AS DOUBLE)
      |      / (CAST(t_o AS DOUBLE) * CAST(t_n AS DOUBLE))), 9) END AS drifted,
      |  MIN(CASE WHEN dev = maxdev THEN score END) AS at_score
      |FROM devm GROUP BY source, t_o, t_n
      |ORDER BY source""".stripMargin
  }
}
