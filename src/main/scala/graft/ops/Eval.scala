package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier evaluation — exact ROC-AUC of the q84 quality model
  * against the q166 seed labels, the eval loop every trained filter
  * needs before it gates a corpus: q84/q166 publish keep CURVES, but
  * "is this score ordering any good?" is a ranking question, and AUC
  * is its standard answer (Hanley & McNeil 1982; equal to the
  * Mann-Whitney U statistic normalized by P·N).
  *
  * Exactness: AUC is computed by the tie-aware rank-sum identity
  *   AUC = (Σ_pos avgrank − P(P+1)/2) / (P·N)
  * with average ranks from per-DISTINCT-SCORE counts: avg_rank(s) =
  * |{score < s}| + (|{score = s}| + 1)/2. Every input is an integer
  * count, avg_rank is an exact x.0/x.5 double, the rank-weighted sum
  * runs in DECIMAL(28,6), and the final ratio is rounded to 6 — the
  * same number DuckDB's window restatement produces bit-for-bit.
  *
  * Scale shape: scoring is the one text scan (q84's codegen'd pass);
  * everything after operates on the per-DISTINCT-SCORE relation,
  * whose cardinality is bounded by 10^6+1 rows PER STRATUM by the
  * 6-decimal score rounding — so the running-count window, although
  * per-stratum single-partition, can never see more than ~10^6 rows
  * regardless of corpus size. The per-doc relation itself is only
  * touched by one partial-agg'd groupBy. At 100 TB: one scan, one
  * bounded window, no all-pairs comparison (the naive AUC is P·N
  * pairs — the rank identity is WHY it scales).
  *
  * Strata: one row per document language plus the pooled `_all` row
  * (one scan — each doc contributes to exactly two strata via a
  * 2-element explode, so the text is never re-scored).
  */
object Eval {

  /** Tie-aware rank-sum AUC over any (score, pos, stratum) relation —
    * the exported core, so the spec can drive crafted label sets and
    * prove the identity against the P·N pair definition. */
  private[graft] def aucByStratum(scores: DataFrame): DataFrame = {
    val byScore = scores
      .groupBy(col("stratum"), col("score"))
      .agg(count(lit(1)).as("n_at"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("pos_at"))
    val w = Window.partitionBy(col("stratum")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byScore.withColumn("n_less",
      coalesce(sum(col("n_at")).over(w), lit(0L)))
      .withColumn("avg_rank",
        col("n_less").cast("double") + (col("n_at") + 1).cast("double") / 2.0)
    ranked.groupBy(col("stratum"))
      .agg(sum(col("n_at")).as("n_docs"),
        sum(col("pos_at")).as("n_pos"),
        (sum(col("n_at")) - sum(col("pos_at"))).as("n_neg"),
        round(((sum((col("pos_at") * col("avg_rank")).cast("decimal(28,6)"))
          - sum(col("pos_at")).cast("decimal(28,6)")
            * (sum(col("pos_at")) + 1).cast("decimal(28,6)") / 2.0)
          / (sum(col("pos_at")) * (sum(col("n_at")) - sum(col("pos_at"))))
          .cast("decimal(28,12)")).cast("double"), 6).as("auc"))
      .orderBy(col("stratum"))
  }

  /** q185: per-stratum exact ROC-AUC of the quality score against the
    * curated-source labels, with the class balance published. */
  def aucReport(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val scores = Curation.scoreDocs(docs)
      .select(col("doc_id"), col("source"), col("score"))
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("score"),
        col("source").isin(Bayes.CuratedSources: _*).as("pos"),
        explode(array(col("lang"), lit("_all"))).as("stratum"))
    aucByStratum(scores)
  }

  /** DuckDB oracle: the q84 score CTE chain (single-sourced from
    * [[Curation.scoreCtesSql]]) + the identical rank-sum identity. */
  val aucReportSql: String = {
    val curatedIn = Bayes.CuratedSources.map(s => s"'$s'").mkString(", ")
    s"""WITH ${Curation.scoreCtesSql},
      |labeled AS (
      |  SELECT s.doc_id, s.score,
      |    s.source IN ($curatedIn) AS pos,
      |    unnest([d2.lang, '_all']) AS stratum
      |  FROM s JOIN documents d2 ON s.doc_id = d2.doc_id),
      |by_score AS (
      |  SELECT stratum, score, COUNT(*) AS n_at,
      |    SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS pos_at
      |  FROM labeled GROUP BY stratum, score),
      |ranked AS (
      |  SELECT stratum, n_at, pos_at,
      |    CAST(COALESCE(SUM(n_at) OVER (PARTITION BY stratum ORDER BY score
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
      |      + CAST(n_at + 1 AS DOUBLE) / 2.0 AS avg_rank
      |  FROM by_score)
      |SELECT stratum,
      |  CAST(SUM(n_at) AS BIGINT) AS n_docs,
      |  CAST(SUM(pos_at) AS BIGINT) AS n_pos,
      |  CAST(SUM(n_at) - SUM(pos_at) AS BIGINT) AS n_neg,
      |  ROUND(CAST(CAST((SUM(CAST(pos_at * avg_rank AS DECIMAL(28,6)))
      |    - CAST(SUM(pos_at) AS DECIMAL(28,6))
      |      * CAST(SUM(pos_at) + 1 AS DECIMAL(28,6)) / 2.0)
      |    / (SUM(pos_at) * (SUM(n_at) - SUM(pos_at)))
      |    AS DECIMAL(28,12)) AS DOUBLE), 6) AS auc
      |FROM ranked GROUP BY stratum ORDER BY stratum""".stripMargin
  }
}
