package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inter-classifier agreement via Cohen's κ (Cohen 1960) — the
  * labeling-pipeline gate raw accuracy can't provide: the suite now
  * carries TWO independent quality filters (q84's fixed-weight linear
  * model, q166's corpus-trained Naive Bayes), and "they agree on 85%
  * of docs" is meaningless if both keep ~80% anyway — chance alone
  * produces high raw agreement under skewed marginals. κ subtracts
  * exactly that chance term: κ = (p_o − p_e)/(1 − p_e) with p_e from
  * the two filters' marginal keep rates. The standard reading
  * (Landis & Koch): κ < 0.2 slight, 0.4–0.6 moderate, > 0.8
  * near-perfect — the number that tells a curation team whether a
  * cheap filter can stand in for an expensive one.
  *
  * Determinism: the 2×2 confusion cells are integer counts; p_o, p_e,
  * and κ combine them in double with engine-identical
  * parenthesization, rounded once at publish; the degenerate p_e = 1
  * case (both filters constant) publishes NULL.
  *
  * Scale shape: each filter is its existing one/two-scan pipeline;
  * decisions join by doc_id (slim rows — two booleans), strata
  * explode doc-locally (source + the '_all' pool, the q185 shape),
  * and everything after the confusion partial-agg is arithmetic on a
  * |strata|-row relation. Docs scored by BOTH filters enter (both
  * drop zero-token docs by construction).
  */
object Agreement {

  /** q215: per-source and pooled Cohen's κ between the linear (q84)
    * and NB (q166) keep decisions, with the confusion cells. */
  def kappaReport(spark: SparkSession, sfDir: String): DataFrame = {
    val lin = Curation.scoreDocs(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("source"),
        (col("score") >= 0.5).as("keep_lin"))
    val nb = Bayes.perDocLlr(spark, sfDir)
      .select(col("doc_id"), (col("llr") > 0.0).as("keep_nb"))
    val both = lin.join(nb, Seq("doc_id"))
      .select(col("doc_id"), col("keep_lin"), col("keep_nb"),
        explode(array(col("source"), lit("_all"))).as("stratum"))
    val cells = both.groupBy(col("stratum")).agg(
      count(lit(1)).as("n"),
      sum(when(col("keep_lin") && col("keep_nb"), 1L).otherwise(0L)).as("a"),
      sum(when(!col("keep_lin") && col("keep_nb"), 1L).otherwise(0L)).as("b"),
      sum(when(col("keep_lin") && !col("keep_nb"), 1L).otherwise(0L)).as("c"),
      sum(when(!col("keep_lin") && !col("keep_nb"), 1L).otherwise(0L)).as("d"))
    val n = col("n").cast("double")
    val po = (col("a") + col("d")) / n
    // marginals multiply in DOUBLE: long products overflow at corpus
    // scale (silent wrap in Spark vs overflow error in the oracle)
    val pe = ((col("a") + col("c")).cast("double")
      * (col("a") + col("b")).cast("double")
      + (col("b") + col("d")).cast("double")
        * (col("c") + col("d")).cast("double")) / (n * n)
    cells.select(col("stratum"), col("n"),
        col("a").as("both_keep"), col("b").as("nb_only"),
        col("c").as("lin_only"), col("d").as("both_drop"),
        round(po, 6).as("p_observed"),
        round(pe, 6).as("p_chance"),
        when(pe === 1.0, lit(null).cast("double"))
          .otherwise(round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
      .orderBy(col("stratum"))
  }

  val kappaReportSql: String =
    s"""WITH ${Curation.scoreCtesSql},
      |${Bayes.nbCtesFor("documents")},
      |lin AS (SELECT doc_id, source, score >= 0.5 AS keep_lin FROM s),
      |nb AS (SELECT doc_id, llr > 0.0 AS keep_nb FROM perdoc),
      |paired AS (
      |  SELECT l.doc_id, l.keep_lin, nb.keep_nb, u.stratum
      |  FROM lin l JOIN nb USING (doc_id)
      |  CROSS JOIN LATERAL unnest([l.source, '_all']) AS u(stratum)),
      |cells AS (
      |  SELECT stratum, COUNT(*) AS n,
      |    CAST(SUM(CASE WHEN keep_lin AND keep_nb THEN 1 ELSE 0 END) AS BIGINT) AS a,
      |    CAST(SUM(CASE WHEN NOT keep_lin AND keep_nb THEN 1 ELSE 0 END) AS BIGINT) AS b,
      |    CAST(SUM(CASE WHEN keep_lin AND NOT keep_nb THEN 1 ELSE 0 END) AS BIGINT) AS c,
      |    CAST(SUM(CASE WHEN NOT keep_lin AND NOT keep_nb THEN 1 ELSE 0 END) AS BIGINT) AS d
      |  FROM paired GROUP BY stratum),
      |probs AS (
      |  SELECT stratum, n, a, b, c, d,
      |    (a + d) / CAST(n AS DOUBLE) AS po,
      |    (CAST(a + c AS DOUBLE) * CAST(a + b AS DOUBLE)
      |      + CAST(b + d AS DOUBLE) * CAST(c + d AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe
      |  FROM cells)
      |SELECT stratum, n,
      |  a AS both_keep, b AS nb_only, c AS lin_only, d AS both_drop,
      |  ROUND(po, 6) AS p_observed,
      |  ROUND(pe, 6) AS p_chance,
      |  CASE WHEN pe = 1.0 THEN NULL
      |    ELSE ROUND((po - pe) / (1.0 - pe), 6) END AS kappa
      |FROM probs ORDER BY stratum""".stripMargin
}
