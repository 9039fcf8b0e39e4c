package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Population Stability Index over model-score deciles — the
  * industry-standard "did my model's input distribution move?" check
  * (credit-risk lineage; PSI = Σ (p_new − p_old)·ln(p_new/p_old)):
  * q106 diffs the corpus ROW-wise and q136 tracks the SOURCE mix;
  * this watches the distribution a deployed quality filter actually
  * consumes — its own score histogram — between the same two
  * snapshot generations. A crawler regression that shifts document
  * quality moves score mass across deciles long before any keep-rate
  * threshold trips; PSI > 0.25 is the conventional "retrain or
  * investigate" line.
  *
  * Determinism: Laplace-smoothed decile shares p = (n+1)/(N+10) (no
  * empty-bin infinities, exact double arithmetic from integer
  * counts), ln rounded to 9 at the transcendental (q69 libm-parity
  * discipline), contributions rounded at publish.
  *
  * Scale shape: two q84 scoring scans (OLD and NEW generations — at
  * production each is a stored score column, making this metadata-
  * only), each collapsing map-side to ≤10 decile counts; everything
  * downstream is arithmetic over a 10-row broadcast relation. The
  * snapshots are carved with the q106 rule, single-sourced from
  * [[Snapshot]]'s documented convention.
  */
object Drift {

  private def decile(score: Column): Column =
    least(floor(score * 10).cast("int"), lit(9))

  /** q190: per-decile score-share drift between the q106 OLD and NEW
    * snapshot generations, with each decile's PSI contribution. */
  def psiReport(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
    // q106 carving: OLD = ids with id%5 != 0 (pre-add), current text;
    // NEW = every current id, text revised (' v2') for id%7 == 0
    val oldDocs = d.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val newDocs = d.select(col("doc_id"), col("source"),
      when(pmod(col("doc_id"), lit(7)) === 0, concat(col("text"), lit(" v2")))
        .otherwise(col("text")).as("text"))

    def binCounts(docs: DataFrame): DataFrame =
      Curation.scoreDocs(docs)
        .groupBy(decile(col("score")).as("bin"))
        .agg(count(lit(1)).as("n"))

    val grid = spark.range(10).select(col("id").cast("int").as("bin"))
    def filled(docs: DataFrame, n: String): DataFrame =
      grid.join(binCounts(docs), Seq("bin"), "left")
        .na.fill(0L, Seq("n")).withColumnRenamed("n", n)

    val both = filled(oldDocs, "n_old").join(filled(newDocs, "n_new"), Seq("bin"))
    val totals = both.agg(sum(col("n_old")).as("t_old"),
      sum(col("n_new")).as("t_new"))
    val shares = both.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_old"), col("n_new"),
        ((col("n_old") + lit(1)).cast("double")
          / (col("t_old") + lit(10)).cast("double")).as("p_old"),
        ((col("n_new") + lit(1)).cast("double")
          / (col("t_new") + lit(10)).cast("double")).as("p_new"))
    shares.select(col("bin"), col("n_old"), col("n_new"),
      round(col("p_old"), 6).as("share_old"),
      round(col("p_new"), 6).as("share_new"),
      round((col("p_new") - col("p_old"))
        * round(log(col("p_new") / col("p_old")), 9), 9).as("psi_part"))
      .orderBy(col("bin"))
  }

  /** DuckDB oracle: both generations scored through the shared q84
    * CTE chain ([[Curation.scoreCtesFor]]), same smoothing, same
    * rounding points. */
  val psiReportSql: String = {
    val oldCtes = Curation.scoreCtesFor(
      "(SELECT doc_id, source, text FROM documents WHERE doc_id % 5 <> 0)", "o")
    val newCtes = Curation.scoreCtesFor(
      """(SELECT doc_id, source,
        |   CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
        |   FROM documents)""".stripMargin, "n")
    s"""WITH $oldCtes,
      |$newCtes,
      |grid AS (SELECT CAST(range AS INT) AS bin FROM range(10)),
      |ob AS (
      |  SELECT LEAST(CAST(FLOOR(score * 10) AS INT), 9) AS bin, COUNT(*) AS n
      |  FROM os GROUP BY 1),
      |nb AS (
      |  SELECT LEAST(CAST(FLOOR(score * 10) AS INT), 9) AS bin, COUNT(*) AS n
      |  FROM ns GROUP BY 1),
      |both_counts AS (
      |  SELECT g.bin, COALESCE(ob.n, 0) AS n_old, COALESCE(nb.n, 0) AS n_new
      |  FROM grid g LEFT JOIN ob ON g.bin = ob.bin
      |  LEFT JOIN nb ON g.bin = nb.bin),
      |totals AS (
      |  SELECT SUM(n_old) AS t_old, SUM(n_new) AS t_new FROM both_counts),
      |shares AS (
      |  SELECT bin, n_old, n_new,
      |    CAST(n_old + 1 AS DOUBLE) / CAST(t_old + 10 AS DOUBLE) AS p_old,
      |    CAST(n_new + 1 AS DOUBLE) / CAST(t_new + 10 AS DOUBLE) AS p_new
      |  FROM both_counts CROSS JOIN totals)
      |SELECT bin, CAST(n_old AS BIGINT) AS n_old,
      |  CAST(n_new AS BIGINT) AS n_new,
      |  ROUND(p_old, 6) AS share_old,
      |  ROUND(p_new, 6) AS share_new,
      |  ROUND((p_new - p_old) * ROUND(ln(p_new / p_old), 9), 9) AS psi_part
      |FROM shares ORDER BY bin""".stripMargin
  }
}
