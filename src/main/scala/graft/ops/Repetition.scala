package graft.ops

import graft.Tables
import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gopher-style repetition quality signals (Rae et al., "Scaling
  * Language Models: Methods, Analysis & Insights from Training
  * Gopher", 2021, Table A1): the fraction of a document's characters
  * accounted for by its single most frequent n-gram. High values mark
  * boilerplate, keyword stuffing, and generation loops — the failure
  * modes the q84 distinct-token ratio (`f_rep`) blurs together,
  * because a document can have high distinct-token diversity yet
  * still devote 30% of its characters to one repeated phrase.
  *
  * Definition (per document, n ∈ {2, 3}):
  *   top n-gram  = the most frequent token n-gram, ties broken by the
  *                 lexicographically smallest gram (deterministic);
  *   char_frac_n = cnt · length(gram) / length(text), where the gram
  *                 string is the space-joined token window (the same
  *                 normalized form both engines count).
  *
  * The census publishes per-source means and the share of documents
  * over the published Gopher cuts (top-2-gram > 0.20, top-3-gram
  * > 0.18 — Table A1's curation thresholds).
  *
  * Scale shape: grams explode from each document's own row, the ONE
  * exchange carries (doc_id, gram, partial-count) with map-side
  * combine (a document's tokens never span input partitions), the
  * per-doc argmax is a `min_by` over a struct — no window, no sort,
  * no second scan of text. At 100 TB: shuffle volume is bounded by
  * token count, text itself never moves.
  */
object Repetition {

  /** Gopher Table A1 curation cuts. */
  val Frac2Cut = 0.20
  val Frac3Cut = 0.18

  private def grams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Per-doc top-n-gram char fraction over any (doc_id, source, text)
    * relation — exposed so the spec can probe crafted loops. */
  private[graft] def topGramFrac(docs: DataFrame, n: Int): DataFrame = {
    // bind the token array first — grams() references it ~(n+2)×,
    // and inlining the tokenizer would multiply that subtree
    val g = docs
      .select(col("doc_id"), col("source"), length(col("text")).as("chars"),
        TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"), col("chars"),
        explode(grams(col("toks"), n)).as("gram"))
      .groupBy(col("doc_id"), col("source"), col("chars"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    // argmax by (cnt desc, gram asc): min of (-cnt, gram) struct
    g.groupBy(col("doc_id"), col("source"), col("chars"))
      .agg(min(struct((-col("cnt")).as("nc"), col("gram"))).as("top"))
      .select(col("doc_id"), col("source"),
        round((-col("top.nc")).cast("double") * length(col("top.gram"))
          / col("chars"), 6).as("frac"))
  }

  /** q184: the per-source repetition census — mean top-2/3-gram char
    * fractions and the share of documents the Gopher cuts would
    * drop. Documents too short to form a gram count as frac 0 (no
    * repetition evidence ⇒ keep), which the left join encodes. */
  def repetitionCensus(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
    val f2 = topGramFrac(docs, 2).withColumnRenamed("frac", "frac2")
    val f3 = topGramFrac(docs, 3).withColumnRenamed("frac", "frac3")
    docs.select(col("doc_id"), col("source"))
      .join(f2.drop("source"), Seq("doc_id"), "left")
      .join(f3.drop("source"), Seq("doc_id"), "left")
      .na.fill(0.0, Seq("frac2", "frac3"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("frac2").cast("decimal(28,6)")).cast("double")
          / count(lit(1)), 6).as("avg_frac2"),
        round(sum(col("frac3").cast("decimal(28,6)")).cast("double")
          / count(lit(1)), 6).as("avg_frac3"),
        sum(when(col("frac2") > Frac2Cut, 1L).otherwise(0L)).as("n_cut2"),
        sum(when(col("frac3") > Frac3Cut, 1L).otherwise(0L)).as("n_cut3"))
      .orderBy(col("source"))
  }

  /** DuckDB oracle: same tokenizer rendering ([[TextOps.tokSql]]),
    * same gram construction, same argmax tie-break via ORDER BY, same
    * rounding points and exact-decimal sums. */
  val repetitionCensusSql: String = {
    val tokSql = TextOps.tokSql()
    def gramCte(n: Int, name: String): String = {
      val parts = (0 until n).map(k => s"toks[i + $k]")
        .mkString(" || ' ' || ")
      s"""$name AS (
        |  SELECT doc_id, chars,
        |    unnest(list_transform(
        |      range(1, greatest(len(toks) - ${n - 1}, 0) + 1),
        |      i -> $parts)) AS gram
        |  FROM toked)""".stripMargin
    }
    def topCte(src: String, name: String): String =
      s"""$name AS (
        |  SELECT doc_id,
        |    ROUND(CAST(cnt AS DOUBLE) * length(gram) / chars, 6) AS frac
        |  FROM (
        |    SELECT doc_id, chars, gram, COUNT(*) AS cnt,
        |      ROW_NUMBER() OVER (PARTITION BY doc_id
        |        ORDER BY COUNT(*) DESC, gram) AS rn
        |    FROM $src GROUP BY doc_id, chars, gram)
        |  WHERE rn = 1)""".stripMargin
    s"""WITH toked AS (
      |  SELECT doc_id, source, length(text) AS chars, $tokSql AS toks
      |  FROM documents),
      |${gramCte(2, "g2")},
      |${gramCte(3, "g3")},
      |${topCte("g2", "t2")},
      |${topCte("g3", "t3")}
      |SELECT d.source, COUNT(*) AS n_docs,
      |  ROUND(CAST(SUM(CAST(COALESCE(t2.frac, 0.0) AS DECIMAL(28,6)))
      |    AS DOUBLE) / COUNT(*), 6) AS avg_frac2,
      |  ROUND(CAST(SUM(CAST(COALESCE(t3.frac, 0.0) AS DECIMAL(28,6)))
      |    AS DOUBLE) / COUNT(*), 6) AS avg_frac3,
      |  CAST(SUM(CASE WHEN COALESCE(t2.frac, 0.0) > $Frac2Cut
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_cut2,
      |  CAST(SUM(CASE WHEN COALESCE(t3.frac, 0.0) > $Frac3Cut
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_cut3
      |FROM documents d LEFT JOIN t2 ON d.doc_id = t2.doc_id
      |LEFT JOIN t3 ON d.doc_id = t3.doc_id
      |GROUP BY d.source ORDER BY d.source""".stripMargin
  }
}
