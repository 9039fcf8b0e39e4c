package graft.ops

import graft.Tables
import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Curation funnel accounting — the per-stage attrition report every
  * training-data pipeline publishes (how many documents each filter
  * drops, cumulatively, C4/RefinedWeb-style): minimum length →
  * quality score → repetition → exact-dup canonicalization.
  *
  * Shape: ONE scan computes every per-document flag (the stages are
  * scalar expressions over the same row), the dup stage is one
  * shuffle on the 60-bit fingerprint, and the funnel itself is a
  * single global aggregate of running conjunctions — four numbers, no
  * second pass over the corpus. At 100 TB this is exactly two jobs:
  * scan+partial-agg, and the fp exchange.
  *
  * Corpus: documents ∪ upper-cased copies of id%7==0 (the q22 planted
  * exact dups) so the canonicalization stage does real work — tokens
  * lowercase, so a copy sails through stages 1-3 with its original
  * and dies at stage 4.
  */
object Funnel {

  val MinChars = 200
  val MinQuality = 0.5
  val MaxRep = 0.2

  /** q105: per-stage funnel — docs in, docs out, drop fraction. */
  def filterFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val corpus = d.select(col("doc_id"), col("text"))
      .unionByName(d.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          upper(col("text")).as("text")))
    // one scan: all scalar flags + the dedup fingerprint; the token
    // array binds first (expression-staging rule) via the grams column
    val grams = TextOps.shinglesFromTokens(TextOps.tokens(col("text")))
    val flags = corpus.select(
      col("doc_id"),
      (length(col("text")) >= MinChars).as("f1"),
      (TextOps.qualityScore(col("text")) >= MinQuality).as("f2"),
      (round(lit(1.0) - size(array_distinct(grams)).cast("double")
        / size(grams), 6) <= MaxRep).as("f3"),
      TextOps.fingerprint(col("text")).as("fp"))
    val canon = flags.groupBy(col("fp")).agg(min(col("doc_id")).as("min_id"))
    val j = flags.join(canon, Seq("fp"))
      .withColumn("f4", col("doc_id") === col("min_id"))
    val s = j.agg(
      count(lit(1)).as("n"),
      sum(when(col("f1"), 1L).otherwise(0L)).as("s1"),
      sum(when(col("f1") && col("f2"), 1L).otherwise(0L)).as("s2"),
      sum(when(col("f1") && col("f2") && col("f3"), 1L).otherwise(0L))
        .as("s3"),
      sum(when(col("f1") && col("f2") && col("f3") && col("f4"), 1L)
        .otherwise(0L)).as("s4"))
    val stages = s.select(explode(array(
      struct(lit(1).as("stage"), lit("min_length").as("filter"),
        col("n").as("n_in"), col("s1").as("n_out")),
      struct(lit(2).as("stage"), lit("quality").as("filter"),
        col("s1").as("n_in"), col("s2").as("n_out")),
      struct(lit(3).as("stage"), lit("repetition").as("filter"),
        col("s2").as("n_in"), col("s3").as("n_out")),
      struct(lit(4).as("stage"), lit("exact_dedup").as("filter"),
        col("s3").as("n_in"), col("s4").as("n_out")))).as("r"))
    stages.select(col("r.stage").as("stage"), col("r.filter").as("filter"),
      col("r.n_in").as("n_in"), col("r.n_out").as("n_out"),
      round(when(col("r.n_in") === 0L, 0.0)
        .otherwise(lit(1.0) - col("r.n_out").cast("double")
          / col("r.n_in").cast("double")), 6).as("drop_frac"))
      .orderBy(col("stage"))
  }

  val filterFunnelSql: String = {
    val tok = TextOps.tokSql()
    val stop = TextOps.langProfiles.head._2.map(w => s"'$w'")
      .mkString("[", ", ", "]")
    val quality =
      s"""ROUND((
        |      LEAST(length(text) / 500.0, 1.0)
        |      + CASE WHEN length(text) > 0
        |             THEN length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / CAST(length(text) AS DOUBLE)
        |             ELSE 0.0 END
        |      + LEAST(CASE WHEN len($tok) > 0
        |              THEN len(list_filter($tok, t -> list_contains($stop, t)))
        |                   / CAST(len($tok) AS DOUBLE) * 4.0
        |              ELSE 0.0 END, 1.0)
        |    ) / 3.0, 6)""".stripMargin
    val grams =
      s"""CASE WHEN len($tok) < 3 THEN [COALESCE(array_to_string($tok, ' '), '')]
        |     ELSE list_transform(generate_series(1, len($tok) - 2),
        |            i -> array_to_string(($tok)[i:i+2], ' ')) END""".stripMargin
    s"""WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 200000 AS doc_id, upper(text) AS text
      |  FROM documents WHERE doc_id % 7 = 0),
      |flags AS (
      |  SELECT doc_id,
      |    length(text) >= $MinChars AS f1,
      |    $quality >= $MinQuality AS f2,
      |    ROUND(1.0 - len(list_distinct($grams))
      |      / CAST(len($grams) AS DOUBLE), 6) <= $MaxRep AS f3,
      |    ('0x' || substr(md5(array_to_string($tok, ' ')), 1, 15))::BIGINT AS fp
      |  FROM corpus),
      |c AS (SELECT fp, MIN(doc_id) AS min_id FROM flags GROUP BY fp),
      |j AS (
      |  SELECT flags.*, flags.doc_id = c.min_id AS f4
      |  FROM flags JOIN c USING (fp)),
      |s AS (
      |  SELECT COUNT(*) AS n,
      |    CAST(SUM(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
      |    CAST(SUM(CASE WHEN f1 AND f2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
      |    CAST(SUM(CASE WHEN f1 AND f2 AND f3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
      |    CAST(SUM(CASE WHEN f1 AND f2 AND f3 AND f4 THEN 1 ELSE 0 END) AS BIGINT) AS s4
      |  FROM j)
      |SELECT stage, filter, n_in, n_out,
      |  ROUND(CASE WHEN n_in = 0 THEN 0.0
      |    ELSE 1.0 - CAST(n_out AS DOUBLE) / n_in END, 6) AS drop_frac
      |FROM (
      |  SELECT 1 AS stage, 'min_length' AS filter, n AS n_in, s1 AS n_out FROM s
      |  UNION ALL
      |  SELECT 2, 'quality', s1, s2 FROM s
      |  UNION ALL
      |  SELECT 3, 'repetition', s2, s3 FROM s
      |  UNION ALL
      |  SELECT 4, 'exact_dedup', s3, s4 FROM s)
      |ORDER BY stage""".stripMargin
  }
}
