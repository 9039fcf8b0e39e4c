package graft.ops

import graft.Corpus
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Content-type routing + HTML field extraction (S2 + P1-P3): the
  * reference's spider parses title / meta-description / body text out
  * of fetched HTML via XPath (`dynamic_spider.py:29-77`) and routes
  * non-HTML responses to PDF/image handlers (`file_handler.py`).
  *
  * Here a deterministic HTML document is synthesized per corpus row
  * (so the oracle can synthesize the identical bytes), then parsed
  * back with codegen'd regexp expressions — title, meta content,
  * script/style-stripped whitespace-normalized body text — and routed
  * by content type into the three per-type pipelines, unioned back.
  * One scan, no UDF, no shuffle.
  */
object Html {

  /** Deterministic HTML synthesis (stands in for the HTTP fetch). */
  private def htmlOf: Column =
    concat(
      lit("<html><head><title>"), coalesce(col("title"), lit("")),
      lit("</title><meta name=\"description\" content=\""),
      col("meta_description"),
      lit("\"></head><body><p>"), col("content"),
      lit("</p><script>var x = 1;</script></body></html>"))

  private val htmlOfSql =
    """'<html><head><title>' || COALESCE(title, '') ||
      |      '</title><meta name="description" content="' || meta_description ||
      |      '"></head><body><p>' || content ||
      |      '</p><script>var x = 1;</script></body></html>'""".stripMargin

  /** Parse + route. html rows get full field extraction; pdf rows get
    * text passthrough (the reference extracts per-page text); image
    * rows carry no content (vision-embedding path). */
  def routeAndExtract(spark: SparkSession, sfDir: String): DataFrame = {
    val wp = Corpus.webPages(spark, sfDir).withColumn("html", htmlOf)
    val htmlRows = wp.filter(col("file_type") === "html").select(
      col("id"),
      col("file_type"),
      regexp_extract(col("html"), "<title>([^<]*)</title>", 1)
        .as("ex_title"),
      regexp_extract(col("html"),
        "<meta name=\"description\" content=\"([^\"]*)\"", 1)
        .as("ex_meta"),
      trim(regexp_replace(regexp_replace(regexp_replace(col("html"),
        "<script>.*?</script>", " "), "<[^>]+>", " "), "\\s+", " "))
        .as("body_text"))
    val pdfRows = wp.filter(col("file_type") === "pdf").select(
      col("id"), col("file_type"),
      lit("").as("ex_title"), lit("").as("ex_meta"),
      col("content").as("body_text"))
    val imageRows = wp.filter(col("file_type") === "image").select(
      col("id"), col("file_type"),
      lit("").as("ex_title"), lit("").as("ex_meta"),
      lit(null).cast("string").as("body_text"))
    htmlRows.unionByName(pdfRows).unionByName(imageRows)
      .filter(col("id") < 60)
      .orderBy(col("id"))
  }

  val routeAndExtractSql: String =
    s"""WITH ${Corpus.webPagesCte},
      |h AS (SELECT *, $htmlOfSql AS html FROM web_pages),
      |html_rows AS (
      |  SELECT id, file_type,
      |    COALESCE(regexp_extract(html, '<title>([^<]*)</title>', 1), '') AS ex_title,
      |    COALESCE(regexp_extract(html, '<meta name="description" content="([^"]*)"', 1), '') AS ex_meta,
      |    trim(regexp_replace(regexp_replace(regexp_replace(html,
      |      '<script>.*?</script>', ' ', 'g'), '<[^>]+>', ' ', 'g'),
      |      '\\s+', ' ', 'g')) AS body_text
      |  FROM h WHERE file_type = 'html'),
      |pdf_rows AS (
      |  SELECT id, file_type, '' AS ex_title, '' AS ex_meta,
      |    content AS body_text
      |  FROM h WHERE file_type = 'pdf'),
      |image_rows AS (
      |  SELECT id, file_type, '' AS ex_title, '' AS ex_meta,
      |    NULL AS body_text
      |  FROM h WHERE file_type = 'image')
      |SELECT * FROM (
      |  SELECT * FROM html_rows UNION ALL
      |  SELECT * FROM pdf_rows UNION ALL
      |  SELECT * FROM image_rows)
      |WHERE id < 60
      |ORDER BY id""".stripMargin

  /** Structured-data extraction (P10): the reference prompts an LLM
    * with a named JSON schema (`structured_data.py:33-109`); our
    * deterministic equivalent is a rule-based extractor for the
    * "ecommerce" schema — product / brand / category pulled by
    * pattern from the content — surfaced as both columns and a JSON
    * blob (the `from_json`/`to_json` round-trip the schema registry
    * needs). */
  def structuredExtract(spark: SparkSession, sfDir: String): DataFrame = {
    val wp = Corpus.webPages(spark, sfDir)
    wp.filter(col("file_type") === "html")
      .select(col("id"),
        regexp_extract(col("content"), "^(\\w+ \\w+)", 1).as("product"),
        regexp_extract(col("content"), "brand (\\S+)", 1).as("brand"),
        regexp_extract(col("content"), "(ECONOMY|SMALL|STANDARD|LARGE|MEDIUM|PROMO)", 1)
          .as("category"))
      .withColumn("structured_json",
        to_json(struct(col("product"), col("brand"), col("category"))))
      .filter(col("id") < 40)
      .orderBy(col("id"))
  }

  val structuredExtractSql: String =
    s"""WITH ${Corpus.webPagesCte}
      |SELECT id, product, brand, category,
      |  '{"product":"' || product || '","brand":"' || brand ||
      |    '","category":"' || category || '"}' AS structured_json
      |FROM (
      |  SELECT id,
      |    COALESCE(regexp_extract(content, '^(\\w+ \\w+)', 1), '') AS product,
      |    COALESCE(regexp_extract(content, 'brand (\\S+)', 1), '') AS brand,
      |    COALESCE(regexp_extract(content, '(ECONOMY|SMALL|STANDARD|LARGE|MEDIUM|PROMO)', 1), '') AS category
      |  FROM web_pages WHERE file_type = 'html')
      |WHERE id < 40
      |ORDER BY id""".stripMargin
}
