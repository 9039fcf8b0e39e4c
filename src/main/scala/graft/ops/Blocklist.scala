package graft.ops

import graft.Tables
import graft.expressions.MultiContains
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Content-policy blocklist audit — the screening pass every
  * pretraining pipeline runs before a corpus ships: how many
  * documents does each blocklist entry hit, and how often?
  *
  * The reference's crawler has no policy layer (its corpus is its
  * own); at 100 TB a blocklist is thousands of phrases and the naive
  * plan — one `contains`/`replace` scan per pattern — multiplies the
  * text-scan cost by K. This operator runs ALL patterns in one
  * codegen'd pass via a shared Aho-Corasick automaton
  * ([[graft.expressions.MultiContains]]): the text is read once, the
  * per-doc result is K small longs, and the only exchange is the
  * K-row partial-agg rollup. The DuckDB oracle deliberately uses the
  * naive per-pattern replace() formulation — same answer, K-fold the
  * scan work — which is exactly the cost gap the automaton exists to
  * close.
  *
  * Counting semantics: per-pattern leftmost non-overlapping
  * occurrences (== `replace()` counting), so both engines agree on
  * overlapping-capable patterns too.
  */
object Blocklist {

  /** Fixed audit blocklist: phrases over the corpus vocabulary with
    * shared prefixes ("table", "table table") and cross-word
    * substrings, so the automaton's trie and failure links do real
    * work. Single-sourced into the oracle SQL. */
  val Patterns: Seq[String] = Seq(
    "table", "table table", "table key", "fast", "fast table",
    "scan slow", "slow scan", "agg row", "merge batch", "spark",
    "a a", "the line", "value fast", "customer query", "big query",
    "stream window", "sort column", "data column", "key agg",
    "row scan", "group value", "window table", "batch part", "vector")

  /** q146: per-pattern hit audit over the documents corpus — docs
    * hit, total occurrences, and occurrences per 10k docs. */
  def blocklistAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val total = docs.agg(count(lit(1)).as("n_total"))
    val perDoc = docs.select(
      MultiContains.hits(col("text"), Patterns).as("hits"))
    val patArr = array(Patterns.map(lit): _*)
    perDoc
      .select(posexplode(col("hits")).as(Seq("idx", "n")))
      .select(element_at(patArr, col("idx") + 1).as("pattern"), col("n"))
      .groupBy(col("pattern")).agg(
        sum(when(col("n") > 0, 1L).otherwise(0L)).as("n_docs"),
        sum(col("n")).as("n_hits"))
      .crossJoin(broadcast(total))
      .select(col("pattern"), col("n_docs"), col("n_hits"),
        round(col("n_hits") * 10000.0 / col("n_total"), 4)
          .as("hits_per_10k_docs"))
      .orderBy(col("pattern"))
  }

  /** The naive K-scan oracle formulation (replace() counting). */
  val blocklistAuditSql: String = {
    val vals = Patterns.map(p => s"('${p.replace("'", "''")}')")
      .mkString(", ")
    s"""WITH pats(pattern) AS (VALUES $vals),
      |per_doc AS (
      |  SELECT pattern,
      |    CAST((length(text) - length(replace(text, pattern, '')))
      |      / length(pattern) AS BIGINT) AS n
      |  FROM documents CROSS JOIN pats),
      |tot AS (SELECT COUNT(*) AS n_total FROM documents)
      |SELECT pattern,
      |  CAST(SUM(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
      |  CAST(SUM(n) AS BIGINT) AS n_hits,
      |  round(SUM(n) * 10000.0 / (SELECT n_total FROM tot), 4)
      |    AS hits_per_10k_docs
      |FROM per_doc
      |GROUP BY pattern
      |ORDER BY pattern""".stripMargin
  }
}
