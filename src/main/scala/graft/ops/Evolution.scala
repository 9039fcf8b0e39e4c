package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet schema evolution — the additive-column reality of any
  * long-lived corpus: generation 1 shipped (doc_id, source, text),
  * generation 2 started attaching a per-doc `quality` score, and a
  * consumer must read BOTH vintages as one table. Spark's answer is
  * `mergeSchema`: footer schemas union across files, columns absent
  * in old files surface as NULL — the evolution contract this query
  * puts under the oracle gate (a reader that silently DROPPED the new
  * column, or errored on the old files, would both be wrong answers
  * here, not perf differences).
  *
  * The production disciplines the query bakes in:
  *   - merge is ADDITIVE-ONLY: the read HARD-ASSERTS the merged
  *     schema is exactly the declared union, so an upstream TYPE
  *     change (the q178/q183 drift family) fails loudly instead of
  *     surfacing as a sometimes-null column;
  *   - `mergeSchema` costs a footer read per file at planning — on a
  *     100 TB table the right pattern is exactly what this staging
  *     models: vintages in separate dirs, merge ONCE at the
  *     boundary, write the unified schema forward (or pin it in a
  *     metastore), never re-infer per query.
  *
  * Census: per source × vintage — row counts, quality coverage
  * (NULL for gen-1 rows by construction), quality sum over covered
  * rows. Closed-form staging rule ⇒ DuckDB recomputes everything
  * from the documents table.
  */
object Evolution {

  private def layoutBase(sfDir: String): String =
    graft.Scratch.dir("evolution_layout", sfDir)

  /** Deterministic stand-in for the gen-2 quality score. */
  private def qualityCol =
    round((pmod(col("doc_id"), lit(97)).cast("double")) / 97.0, 6)

  /** Stage the two vintages: gen1 = even doc_ids, old schema; gen2 =
    * odd doc_ids, schema + quality. */
  def stage(spark: SparkSession, sfDir: String): String = {
    val base = layoutBase(sfDir)
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
    d.filter(pmod(col("doc_id"), lit(2)) === 0)
      .write.mode(SaveMode.Overwrite).parquet(s"$base/gen=1")
    d.filter(pmod(col("doc_id"), lit(2)) === 1)
      .withColumn("quality", qualityCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$base/gen=2")
    base
  }

  /** q193: merged-vintage census. */
  def evolvedCensus(spark: SparkSession, sfDir: String): DataFrame = {
    val base = stage(spark, sfDir)
    val merged = spark.read.option("mergeSchema", "true").parquet(base)
    val got = merged.schema.fields.map(f => f.name -> f.dataType.sql).toMap
    val want = Map("doc_id" -> "BIGINT", "source" -> "STRING",
      "text" -> "STRING", "quality" -> "DOUBLE", "gen" -> "INT")
    require(got == want,
      s"merged schema must be the declared additive union, got $got")
    merged.groupBy(col("source"), col("gen"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("quality").isNotNull, 1L).otherwise(0L))
          .as("n_with_quality"),
        round(coalesce(sum(col("quality").cast("decimal(28,6)")), lit(0))
          .cast("double"), 6).as("quality_sum"))
      .orderBy(col("source"), col("gen"))
  }

  /** DuckDB oracle: the staging rule restated — vintage = parity,
    * quality = the same closed-form score on odd ids only. */
  val evolvedCensusSql: String =
    """SELECT source, CAST(1 + doc_id % 2 AS INT) AS gen,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(doc_id % 2) AS BIGINT) AS n_with_quality,
      |  ROUND(CAST(COALESCE(SUM(CASE WHEN doc_id % 2 = 1
      |    THEN CAST(ROUND(CAST(doc_id % 97 AS DOUBLE) / 97.0, 6)
      |      AS DECIMAL(28,6)) END), 0) AS DOUBLE), 6) AS quality_sum
      |FROM documents
      |GROUP BY source, gen
      |ORDER BY source, gen""".stripMargin
}
