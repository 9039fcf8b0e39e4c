package graft.ops

import graft.Tables
import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reproducible sampling + text normalization — corpus-curation
  * staples. Sampling is HASH-BASED (keep iff hash60(key) mod M < p·M)
  * rather than RNG-based: the sample is a pure function of the key,
  * so it is identical across engines, retries, partitionings, and
  * re-runs — the only sampling that is auditable at 100 TB.
  */
object Sampling {

  /** q51: 10% deterministic document sample + per-lang acceptance
    * counts (stratification check falls out of the groupBy). */
  def hashSample(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .withColumn("keep",
        pmod(TextOps.hash60(concat(lit("sample:"), col("doc_id"))),
          lit(100L)) < 10)
    d.groupBy(col("lang")).agg(
      count(lit(1)).as("n_docs"),
      count(when(col("keep"), 1)).as("n_sampled"))
      .orderBy(col("lang"))
  }

  val hashSampleSql: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |  COUNT(*) FILTER (WHERE
      |    ('0x' || substr(md5('sample:' || doc_id), 1, 15))::BIGINT % 100 < 10)
      |    AS n_sampled
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Suffix-stripping normalizer (stemming-lite): plural/gerund/past
    * suffixes removed from tokens ≥ 5 chars — the deterministic core
    * of index-time text normalization. The fold nests CASEs so the
    * LAST element is checked first → iterate shortest→longest to give
    * longer suffixes priority; identical nesting in the oracle. */
  private val suffixes = Seq("s", "es", "ed", "edly", "ing", "ings")

  /** q52: stem-normalized vocabulary — top terms after stemming,
    * proving the normalizer collapses inflected forms. */
  def stemmedVocab(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val toks = d.select(explode(TextOps.tokens(col("text"))).as("t"))
    val stemmed = toks.withColumn("stem",
      suffixes.foldLeft(col("t")) { (acc, suf) =>
        when(length(col("t")) >= 5 && col("t").endsWith(suf),
          expr(s"substring(t, 1, length(t) - ${suf.length})"))
          .otherwise(acc)
      })
    stemmed.groupBy(col("stem")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("stem"))
      .limit(15)
  }

  val stemmedVocabSql: String = {
    val stemExpr = suffixes.foldLeft("t") { (acc, suf) =>
      s"CASE WHEN length(t) >= 5 AND t LIKE '%$suf' " +
        s"THEN substr(t, 1, length(t) - ${suf.length}) ELSE $acc END"
    }
    s"""WITH toks AS (
      |  SELECT unnest(list_filter(
      |    string_split_regex(lower(text), '[^a-z0-9_]+'), x -> x != '')) AS t
      |  FROM documents)
      |SELECT $stemExpr AS stem, COUNT(*) AS n
      |FROM toks
      |GROUP BY 1
      |ORDER BY n DESC, stem
      |LIMIT 15""".stripMargin
  }
}
