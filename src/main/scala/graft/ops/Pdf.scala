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
  * Decode status: no PDF library is resolvable in this container
  * (`/opt/spark/jars` carries none; coursier runs offline), so round
  * 4 closed the gap from scratch — [[PdfCodec]] is a real minimal
  * PDF writer + parser (FlateDecode via `java.util.zip`, xref-table
  * walk, content-stream `Tj`/`TJ` tokenizer). [[pdfDecode]] (q80)
  * routes the same four-behavior contract through actual compressed
  * PDF bytes and recovers the page text by parsing them, with the
  * DuckDB oracle deriving the expected text independently — the same
  * roundtrip pattern as [[Media.imageDecode]] (q78). [[pdfExtract]]
  * (q55) keeps the pre-split pages-array shape, covering the
  * classification stage in isolation.
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

  case class PdfResp(id: Long, http_status: Int, content_type: String,
      pages: Seq[String])
  case class PdfDecoded(id: Long, outcome: String, n_pages: Option[Int],
      content: Option[String])

  /** The real S3 decode stage: build actual PDF bytes for every
    * fetchable response, then recover the text by PARSING them —
    * inflate, xref walk, `Tj` extraction ([[PdfCodec.decode]]).
    * Mirrors `handle_pdf` (`file_handler.py:11-49`): status gate →
    * content-type gate → parse → per-page concat → empty check. */
  private def decodeStage(rows: Iterator[PdfResp]): Iterator[PdfDecoded] =
    rows.map { r =>
      if (r.http_status != 200)
        PdfDecoded(r.id, "download_error", None, None)
      else if (!r.content_type.contains("application/pdf"))
        PdfDecoded(r.id, "wrong_content_type", None, None)
      else {
        // the bytes a fetcher would hand over: a complete PDF file —
        // framing varies per doc (multi-stream /Contents arrays,
        // ASCIIHex filter chains, since r7 the PDF 1.5+ xref-
        // stream/ObjStm layout on every 5th doc, since r8 encrypted
        // files — RC4 R2/R3 and AES-128 R4, cycling — on every 7th,
        // composite-font /ToUnicode CMap files on every 11th, and
        // since r9 AES-256 files — R5/R6 alternating, the modern-
        // writer default — on every 13th) so the corpus exercises the
        // layouts real writers produce; recovered text is
        // framing-invariant
        val bytes =
          if (r.id % 13 == 0) PdfCodec.encodeEncrypted(r.pages,
            rev = 5 + (r.id % 2).toInt)
          else if (r.id % 5 == 0) PdfCodec.encodeModern(r.pages,
            splitContents = r.id % 2 == 0, hexFilter = r.id % 3 == 0)
          else if (r.id % 7 == 0) PdfCodec.encodeEncrypted(r.pages,
            rev = 2 + (r.id % 3).toInt)
          else if (r.id % 11 == 0) PdfCodec.encodeCMap(r.pages)
          else PdfCodec.encode(r.pages,
            splitContents = r.id % 2 == 0, hexFilter = r.id % 3 == 0)
        val decoded = PdfCodec.decode(bytes)
        val text = decoded.pages.mkString("") // text += page.get_text()
        if (text.trim.isEmpty)
          PdfDecoded(r.id, "empty_text", Some(decoded.pages.size), None)
        else PdfDecoded(r.id, "ok", Some(decoded.pages.size), Some(text))
      }
    }

  /** q80: the S3 contract end-to-end through real PDF binary —
    * encode → parse → classify. Page count and recovered text come
    * off the parsed file; the oracle derives both independently, so
    * a hash match proves the codec is lossless on this corpus. */
  def pdfDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    responses(spark, sfDir)
      .select(col("id"), col("http_status"), col("content_type"), col("pages"))
      .as[PdfResp]
      .mapPartitions(decodeStage).toDF()
      .select(col("id"), col("outcome"), col("n_pages"), col("content"))
      .orderBy(col("id"))
  }

  val pdfDecodeSql: String =
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
      |    len(pages) AS np,
      |    array_to_string(pages, '') AS joined
      |  FROM resp)
      |SELECT id, outcome,
      |  CASE WHEN outcome IN ('ok', 'empty_text') THEN CAST(np AS INT) END AS n_pages,
      |  CASE WHEN outcome = 'ok' THEN joined END AS content
      |FROM ex
      |ORDER BY id""".stripMargin

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
