package graft.ops

import graft.Tables
import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index postings compression — the storage side of the FTS
  * family (q9/q95/q65 QUERY an index; this op measures what BUILDING
  * one costs on disk). Every search engine stores postings as
  * delta-encoded doc-id gaps in a variable-byte code (Witten/Moffat/
  * Bell, "Managing Gigabytes" §3; the scheme Lucene ships as vInt):
  * sorted doc ids become small gaps, and small gaps fit in 1-2 bytes
  * instead of 8. The census reports, per document-frequency band, how
  * far the corpus' postings compress — the number that decides index
  * hardware budgets.
  *
  * Scale shape: per-doc `array_distinct` dedups term×doc map-side
  * (no global DISTINCT shuffle), the ONE exchange partitions by term
  * for the gap window (each term's postings sort locally within its
  * partition), and everything after is partial-agged rollup over
  * term-level rows — at 100 TB the shuffle carries (term, doc_id)
  * pairs once, and no stage ever holds a full postings list in
  * memory (the window streams).
  */
object Postings {

  /** Variable-byte length of a gap: 7 payload bits per byte. The
    * CASE ladder (not log2) keeps the boundary exact in both
    * engines. */
  private def vbytes(g: Column): Column =
    when(g < 128L, 1L).when(g < 16384L, 2L).when(g < 2097152L, 3L)
      .when(g < 268435456L, 4L).otherwise(5L)

  /** Doc-id stride into the global id space: a production index
    * assigns ids across shards/segments, so per-term postings are
    * SPARSE in the global space even when the test corpus is dense —
    * without the stride every gap is < 128 and the census would
    * exercise exactly one rung of the ladder. */
  val IdStride = 331L

  /** q173: postings compression census per df band (band = bit length
    * of the term's document frequency — exact integer banding via
    * binary string length, no float log at band edges). Terms are
    * unigrams AND word bigrams — real indexes carry phrase postings,
    * and the bigram df spectrum spreads the census across bands where
    * the fixture's ~30-word unigram vocabulary alone collapses to
    * two. */
  def compressionCensus(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("long").as("doc_id"),
        TextOps.tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
    // per-doc array_distinct keeps the dedup MAP-SIDE (no global
    // DISTINCT exchange); the two term families can never collide
    // (bigrams contain a space, tokens cannot), so their union is
    // already (doc, term)-unique
    val uni = d.select(col("doc_id"),
      explode(array_distinct(col("toks"))).as("term"))
    val bi = d.filter(col("n") >= 2)
      .select(col("doc_id"), explode(array_distinct(zip_with(
        slice(col("toks"), lit(1), col("n") - 1),
        slice(col("toks"), lit(2), col("n") - 1),
        (a, b) => concat(a, lit(" "), b)))).as("term"))
    val posts = uni.unionByName(bi)
      .select((col("doc_id") * IdStride).as("gid"), col("term"))
    val w = Window.partitionBy(col("term")).orderBy(col("gid"))
    val gaps = posts.withColumn("gap",
      col("gid") - coalesce(lag(col("gid"), 1).over(w), lit(0L)))
    val terms = gaps.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(vbytes(col("gap"))).as("vb"))
    terms.groupBy(length(conv(col("df"), 10, 2)).cast("long").as("df_band"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("df")).as("postings"),
        (sum(col("df")) * 8L).as("raw_bytes"),
        sum(col("vb")).as("varint_bytes"),
        round((sum(col("df")) * 8L).cast("double") / sum(col("vb")), 6)
          .as("compression"))
      .orderBy(col("df_band"))
  }

  /** DuckDB oracle: identical tokenizer (single-sourced), bigram
    * construction (q82 idiom), id stride, gap window, varint ladder,
    * and binary-length banding. */
  val compressionCensusSql: String =
    s"""WITH d AS (
      |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |    ${TextOps.tokSql("text")} AS toks,
      |    len(${TextOps.tokSql("text")}) AS n
      |  FROM documents),
      |uni AS (
      |  SELECT doc_id, unnest(list_distinct(toks)) AS term FROM d),
      |bi AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, n - 1), i -> toks[i] || ' ' || toks[i+1])))
      |    AS term
      |  FROM d WHERE n >= 2),
      |posts AS (
      |  SELECT doc_id * $IdStride AS gid, term FROM uni
      |  UNION ALL
      |  SELECT doc_id * $IdStride AS gid, term FROM bi),
      |gaps AS (
      |  SELECT term, gid - COALESCE(
      |    LAG(gid) OVER (PARTITION BY term ORDER BY gid), 0) AS gap
      |  FROM posts),
      |terms AS (
      |  SELECT term, COUNT(*) AS df,
      |    SUM(CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2
      |             WHEN gap < 2097152 THEN 3 WHEN gap < 268435456 THEN 4
      |             ELSE 5 END) AS vb
      |  FROM gaps GROUP BY term)
      |SELECT CAST(length(bin(df)) AS BIGINT) AS df_band,
      |  COUNT(*) AS n_terms,
      |  CAST(SUM(df) AS BIGINT) AS postings,
      |  CAST(SUM(df) * 8 AS BIGINT) AS raw_bytes,
      |  CAST(SUM(vb) AS BIGINT) AS varint_bytes,
      |  ROUND(CAST(SUM(df) * 8 AS DOUBLE) / SUM(vb), 6) AS compression
      |FROM terms
      |GROUP BY df_band
      |ORDER BY df_band""".stripMargin
}
