package graft.ops

import graft.Tables
import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q233: tokenizer fertility audit — the per-source tokenization
  * economics a multilingual/multi-source training pipeline checks
  * before budgeting a token mixture (fertility ≈ subword tokens per
  * word is the standard tokenizer-quality metric, e.g. the mBERT/XLM
  * fertility tables in Rust et al. 2021): a source whose fertility
  * runs high burns context window on fragmented words, and a
  * bytes-per-token ratio far off ~4 marks text the BPE vocabulary
  * serves poorly. Both feed directly into q137's mixture plan (token
  * budgets per stratum assume a stable tokens-per-byte rate).
  *
  * Uses the engine's single-source tokenizer pair
  * ([[TextOps.tokens]]/[[TextOps.tokenCountBpe]] with their pinned
  * DuckDB renderings), so the audit measures the SAME tokenization
  * every other query budgets with.
  *
  * Scale: one `documents` scan → per-source partial aggregates (all
  * counts map-side combinable) → a source-count-sized result; the
  * ratio arithmetic happens on the aggregated longs. No joins, no
  * windows — the cheapest possible shape, linear at any corpus.
  */
object Fertility {

  def fertility(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("source"),
        TextOps.tokenCountBpe(col("text")).as("bpe"),
        TextOps.tokenCount(col("text")).cast("long").as("words"),
        length(col("text")).cast("long").as("chars"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("bpe")).as("n_tokens"),
        sum(col("words")).as("n_words"),
        sum(col("chars")).as("n_chars"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_words"),
        // a source whose documents all tokenize empty has no
        // fertility to report — NULL, not an IEEE inf/NaN artifact
        when(col("n_words") === 0L, lit(null)).otherwise(
          round(col("n_tokens").cast("double") / col("n_words"), 6))
          .as("fertility"),
        when(col("n_tokens") === 0L, lit(null)).otherwise(
          round(col("n_chars").cast("double") / col("n_tokens"), 6))
          .as("chars_per_token"))
      .orderBy(col("source"))

  val fertilitySql: String = {
    val tok = TextOps.tokSql()
    s"""WITH per_doc AS (
      |  SELECT source,
      |    ${TextOps.tokenCountBpeSql(tok)} AS bpe,
      |    len($tok) AS words,
      |    length(text) AS chars
      |  FROM documents),
      |agg AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(bpe) AS BIGINT) AS n_tokens,
      |    CAST(SUM(words) AS BIGINT) AS n_words,
      |    CAST(SUM(chars) AS BIGINT) AS n_chars
      |  FROM per_doc GROUP BY source)
      |SELECT source, n_docs, n_tokens, n_words,
      |  ROUND(CAST(n_tokens AS DOUBLE) / NULLIF(n_words, 0), 6) AS fertility,
      |  ROUND(CAST(n_chars AS DOUBLE) / NULLIF(n_tokens, 0), 6) AS chars_per_token
      |FROM agg ORDER BY source""".stripMargin
  }
}
