package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q237: per-source character-entropy census — the Shannon-entropy
  * quality signal (Shannon 1948) a filtering pipeline runs next to
  * the q84 heuristic score and the q144 mojibake audit: natural text
  * sits in a narrow entropy band (~2.9–3.1 nats/char for English),
  * so a LOW per-doc character entropy marks templated/repetitive
  * boilerplate (the q60/q184 repetition family's cheapest proxy) and
  * a HIGH one marks binary-in-text, base64 blobs, or OCR noise. The
  * census publishes the per-source mean/extremes plus a low-entropy
  * document count at the boilerplate threshold.
  *
  * Entropy via the count identity H = ln(n) − (Σ c·ln c)/n (no
  * per-row probability, no window): per-(doc, char) counts are exact
  * longs; each c·ln(c) term is an IEEE-deterministic double product
  * with the ln rounded 9 (the q69 libm-parity convention); the
  * per-doc sum accumulates as DECIMAL(28,12) (order-independent
  * under ANY partitioning); per-doc entropy rounds 9, source-level
  * stats round 6 with `+ 0.0` pinning the zero sign (q234 lesson).
  *
  * Scale shape: per-doc character counts are computed SCAN-LOCALLY
  * by the codegen'd [[graft.expressions.CodepointCounts]] census
  * (one map row per document, ≤ |alphabet| entries) — nothing
  * per-character ever exists as a row, r14 VERDICT #6's shave of the
  * earlier explode-to-chars draft — and the exploded entries feed a
  * map-side-combinable (source, doc) partial agg; the per-doc and
  * per-source rollups are two further partial aggs on strictly
  * shrinking relations. No joins, no windows, no driver round-trips
  * — the shape survives 100 TB unchanged. Counting is per Unicode
  * CODEPOINT (surrogate pairs = one character), matching the DuckDB
  * oracle's `string_split(text, '')` on non-BMP corpora too (r14
  * ADVICE — the regex `split(text, '')` counted UTF-16 code units).
  */
object Entropy {

  /** Boilerplate threshold (nats): uniform-over-7-chars ≈ 1.95;
    * natural English text sits near 2.9–3.1 nats/char. */
  val LowNats = 2.0

  def charEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    // (source, doc_id, ch, c) straight off the scan — the census map
    // already holds the exact per-doc counts, so the old
    // (source, doc_id, ch) groupBy stage (and the one-row-per-
    // character explode feeding it) is gone entirely; the first
    // exchange is the per-doc rollup below
    val counts = Tables.documents(spark, sfDir)
      .filter(length(col("text")) > 0)
      .select(col("source"), col("doc_id"),
        explode(graft.expressions.CodepointCounts.counts(col("text")))
          .as(Seq("ch", "c")))
    val perDoc = counts
      .withColumn("term",
        col("c").cast("double") * round(log(col("c").cast("double")), 9))
      .groupBy(col("source"), col("doc_id"))
      .agg(sum(col("c")).as("n"),
        sum(col("term").cast("decimal(28,12)")).cast("double").as("s"))
      .select(col("source"),
        round(round(log(col("n").cast("double")), 9)
          - col("s") / col("n").cast("double"), 9).as("h"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        (round(sum(col("h").cast("decimal(28,12)")).cast("double")
          / count(lit(1)), 6) + lit(0.0)).as("mean_entropy"),
        (round(min(col("h")), 6) + lit(0.0)).as("min_entropy"),
        (round(max(col("h")), 6) + lit(0.0)).as("max_entropy"),
        sum(when(col("h") < LowNats, 1L).otherwise(0L)).as("n_low"))
      .orderBy(col("source"))
  }

  val charEntropySql: String =
    s"""WITH chars AS (
      |  SELECT source, doc_id, unnest(string_split(text, '')) AS ch
      |  FROM documents WHERE length(text) > 0),
      |counts AS (
      |  SELECT source, doc_id, ch, COUNT(*) AS c
      |  FROM chars WHERE ch <> '' GROUP BY source, doc_id, ch),
      |perdoc AS (
      |  SELECT source,
      |    ROUND(ROUND(ln(CAST(n AS DOUBLE)), 9)
      |      - s / CAST(n AS DOUBLE), 9) AS h
      |  FROM (
      |    SELECT source, doc_id, CAST(SUM(c) AS BIGINT) AS n,
      |      CAST(SUM(CAST(CAST(c AS DOUBLE)
      |        * ROUND(ln(CAST(c AS DOUBLE)), 9) AS DECIMAL(28,12)))
      |        AS DOUBLE) AS s
      |    FROM counts GROUP BY source, doc_id))
      |SELECT source, COUNT(*) AS n_docs,
      |  ROUND(CAST(SUM(CAST(h AS DECIMAL(28,12))) AS DOUBLE)
      |    / COUNT(*), 6) + 0.0 AS mean_entropy,
      |  ROUND(MIN(h), 6) + 0.0 AS min_entropy,
      |  ROUND(MAX(h), 6) + 0.0 AS max_entropy,
      |  CAST(SUM(CASE WHEN h < $LowNats THEN 1 ELSE 0 END) AS BIGINT) AS n_low
      |FROM perdoc GROUP BY source ORDER BY source""".stripMargin
}
