package graft.ops

import graft.Tables
import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gini concentration of token supply (Gini 1912, via the rank-based
  * identity G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over ascending xᵢ) —
  * the inequality number behind mixture planning: q93/q137 budget by
  * per-SOURCE token mass, but whether a source's supply is a few
  * mega-documents or many uniform pages decides how it shards, how
  * skew-prone its joins are, and how much one dropped document moves
  * the mix. Published per source and pooled.
  *
  * Exactness — the whole statistic is INTEGER math until one final
  * division: docs group by token-count VALUE (the q185 bounded-
  * relation trick: distinct counts, not docs), and a run of c docs at
  * value v after m smaller docs contributes v·(c·m + c(c+1)/2) to
  * Σ i·xᵢ — any tie ordering gives the same sum because tied docs
  * share the value. Sums accumulate in DECIMAL (rank·value products
  * overflow longs at corpus scale), the closed form combines in
  * double, rounded once. G = 0 ⇔ perfectly uniform supply; → 1 as a
  * single document holds everything.
  *
  * Scale shape: one tokenize scan partial-aggs to (stratum, value)
  * counts; the cumulative window partitions by stratum and rides the
  * bounded distinct-value relation; the report is |strata| rows.
  */
object Gini {

  /** Gini report of a (stratum, v) relation (v ≥ 0, one row per
    * item) — the computation core, exposed for the spec's crafted
    * distributions. */
  private[graft] def giniOf(items: DataFrame): DataFrame = {
    val byVal = items.groupBy(col("stratum"), col("v"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("stratum")).orderBy(col("v"))
    val runs = byVal
      .withColumn("m", coalesce(sum(col("c")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // Σ ranks of this value-run = c·m + c(c+1)/2 — all of it in
      // DECIMAL(38,0): c·m reaches ~n²/4 for the pooled stratum, which
      // wraps a long silently (non-ANSI) beyond ~6e9 items while the
      // oracle's HUGEINT does not. The halving stays integral via the
      // parity split (exactly one of c, c+1 is even), so no decimal
      // division ever runs.
      .withColumn("ranksum", {
        val cDec = col("c").cast("decimal(38,0)")
        val half = when(pmod(col("c"), lit(2)) === 0,
            expr("c div 2").cast("decimal(38,0)")
              * (col("c") + 1).cast("decimal(38,0)"))
          .otherwise(cDec * expr("(c + 1) div 2").cast("decimal(38,0)"))
        cDec * col("m").cast("decimal(38,0)") + half
      })
    val agg = runs.groupBy(col("stratum")).agg(
      sum(col("c")).as("n"),
      // multiply IN decimal: long products v·ranksum overflow at
      // corpus scale before any cast could save them
      sum(col("v").cast("decimal(19,0)")
        * col("c").cast("decimal(19,0)")).as("sx"),
      sum(col("v").cast("decimal(19,0)") * col("ranksum")).as("sxr"))
    agg.select(col("stratum"), col("n").as("n_docs"),
        col("sx").cast("long").as("total_tokens"),
        when(col("sx") === 0, lit(null).cast("double"))
          .otherwise(round(
            lit(2.0) * col("sxr").cast("double")
              / (col("n").cast("double") * col("sx").cast("double"))
              - (col("n") + 1).cast("double") / col("n").cast("double"),
            6)).as("gini"))
      .orderBy(col("stratum"))
  }

  /** q216: per-source and pooled Gini of per-document token counts. */
  def tokenGini(spark: SparkSession, sfDir: String): DataFrame =
    giniOf(Tables.documents(spark, sfDir)
      .select(size(TextOps.tokens(col("text"))).cast("long").as("v"),
        explode(array(col("source"), lit("_all"))).as("stratum")))

  val tokenGiniSql: String = {
    val tokSql = TextOps.tokSql()
    s"""WITH items AS (
      |  SELECT u.stratum, CAST(len($tokSql) AS BIGINT) AS v
      |  FROM documents
      |  CROSS JOIN LATERAL unnest([source, '_all']) AS u(stratum)),
      |byval AS (
      |  SELECT stratum, v, COUNT(*) AS c FROM items GROUP BY stratum, v),
      |runs AS (
      |  SELECT stratum, v, c,
      |    COALESCE(SUM(c) OVER (PARTITION BY stratum ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS m
      |  FROM byval),
      |agg AS (
      |  SELECT stratum,
      |    CAST(SUM(c) AS BIGINT) AS n,
      |    SUM(CAST(v AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) AS sx,
      |    SUM(CAST(v AS DECIMAL(19,0))
      |      * CAST(c * m + (c * (c + 1)) // 2 AS DECIMAL(19,0))) AS sxr
      |  FROM runs GROUP BY stratum)
      |SELECT stratum, n AS n_docs,
      |  CAST(sx AS BIGINT) AS total_tokens,
      |  CASE WHEN sx = 0 THEN NULL ELSE
      |    ROUND(2.0 * CAST(sxr AS DOUBLE)
      |        / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
      |      - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6) END AS gini
      |FROM agg ORDER BY stratum""".stripMargin
  }
}
