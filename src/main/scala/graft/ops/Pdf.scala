package graft.ops

import graft.Corpus
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PDF text source (S3): the reference downloads a PDF, verifies the
  * response content type, concatenates per-page text, and returns
  * null on any of three failure classes — download error, wrong
  * content type, empty extracted text (`file_handler.py:11-49`,
  * behaviors pinned by `test_file_handler.py:12-74`).
  *
  * Spark shape: a fetched-responses table (status, content type,
  * per-page text array — the page split a pdfbox/PyMuPDF decode stage
  * would produce; the decode itself is the honest stub) → a pure
  * column-expression extraction stage that classifies each response
  * and produces the extracted record or nulls, one scan, no UDFs.
  *
  * Decode-stub status (checked round 3): no PDF codec is reachable in
  * this container — `/opt/spark/jars` carries none, and pdfbox fails
  * offline resolution (`COURSIER_MODE=offline`, no egress), so the
  * page-decode stays a documented stub behind the real four-behavior
  * classification. The image half of the same gap IS closed:
  * [[Media.imageDecode]] runs a real `javax.imageio` PNG
  * encode→decode roundtrip under the oracle hash check (q78).
  */
object Pdf {

  /** Synthetic fetched-responses table for the corpus's pdf rows:
    * deterministic failure planting — of the pdf ids (id%10==8),
    * id%80==18 fails the download, id%80==28 returns HTML,
    * id%80==38 has only whitespace text. */
  def responses(spark: SparkSession, sfDir: String): DataFrame =
    Corpus.webPages(spark, sfDir)
      .filter(col("file_type") === "pdf")
      .select(
        col("id"), col("url"),
        when(pmod(col("id"), lit(80)) === 18, lit(500))
          .otherwise(lit(200)).as("http_status"),
        when(pmod(col("id"), lit(80)) === 28, lit("text/html; charset=utf-8"))
          .otherwise(lit("application/pdf")).as("content_type"),
        when(pmod(col("id"), lit(80)) === 38, array(lit(""), lit("  ")))
          .otherwise(array(col("content"),
            concat(lit(" p.2 "), col("domain")))).as("pages"))

  /** The extraction stage: classify + extract. Mirrors
    * `handle_pdf`'s four behaviors; `content` is the per-page texts
    * concatenated in order with no separator (`text += page.get_text()`). */
  def extract(responses: DataFrame): DataFrame = {
    val joined = array_join(col("pages"), "")
    val outcome =
      when(col("http_status") =!= 200, lit("download_error"))
        .when(!col("content_type").contains("application/pdf"),
          lit("wrong_content_type"))
        .when(trim(joined) === "", lit("empty_text"))
        .otherwise(lit("ok"))
    responses.select(
      col("id"), col("url"), outcome.as("outcome"),
      when(outcome === "ok", joined).as("content"),
      when(outcome === "ok", lit("pdf")).as("file_type"),
      when(outcome === "ok", lit("text")).as("embedding_type"),
      lit(null).cast("string").as("title"),
      lit(null).cast("string").as("meta_description"))
  }

  /** Declared query (S3): every pdf response classified + extracted. */
  def pdfExtract(spark: SparkSession, sfDir: String): DataFrame =
    extract(responses(spark, sfDir))
      .select(col("id"), col("outcome"), col("content"),
        col("file_type"), col("embedding_type"))
      .orderBy(col("id"))

  val pdfExtractSql: String =
    s"""WITH ${Corpus.webPagesCte},
      |resp AS (
      |  SELECT id, url,
      |    CASE WHEN id % 80 = 18 THEN 500 ELSE 200 END AS http_status,
      |    CASE WHEN id % 80 = 28 THEN 'text/html; charset=utf-8'
      |         ELSE 'application/pdf' END AS content_type,
      |    CASE WHEN id % 80 = 38 THEN ['', '  ']
      |         ELSE [content, ' p.2 ' || domain] END AS pages
      |  FROM web_pages WHERE file_type = 'pdf'),
      |ex AS (
      |  SELECT id,
      |    CASE WHEN http_status <> 200 THEN 'download_error'
      |         WHEN content_type NOT LIKE '%application/pdf%' THEN 'wrong_content_type'
      |         WHEN trim(array_to_string(pages, '')) = '' THEN 'empty_text'
      |         ELSE 'ok' END AS outcome,
      |    array_to_string(pages, '') AS joined
      |  FROM resp)
      |SELECT id, outcome,
      |  CASE WHEN outcome = 'ok' THEN joined END AS content,
      |  CASE WHEN outcome = 'ok' THEN 'pdf' END AS file_type,
      |  CASE WHEN outcome = 'ok' THEN 'text' END AS embedding_type
      |FROM ex
      |ORDER BY id""".stripMargin
}
