package graft

import graft.ops.Pdf
import org.apache.spark.sql.functions._

/** Mirrors the reference's PDF handler behaviors
  * (`backend/tests/test_file_handler.py:12-74`): happy path, download
  * failure, wrong content type, empty extracted text. */
class PdfSpec extends SparkSpec {
  import spark.implicits._

  private def resp(status: Int, ctype: String, pages: Seq[String]) =
    Seq((1L, "http://example.com/test.pdf", status, ctype, pages))
      .toDF("id", "url", "http_status", "content_type", "pages")

  test("happy path: per-page text concatenated, pdf/text row emitted") {
    val r = Pdf.extract(resp(200, "application/pdf",
      Seq("This is ", "a test."))).collect().head
    assert(r.getAs[String]("outcome") === "ok")
    assert(r.getAs[String]("content") === "This is a test.")
    assert(r.getAs[String]("file_type") === "pdf")
    assert(r.getAs[String]("embedding_type") === "text")
    assert(r.isNullAt(r.fieldIndex("title")))
    assert(r.isNullAt(r.fieldIndex("meta_description")))
  }

  test("download failure -> no extracted record") {
    val r = Pdf.extract(resp(500, "application/pdf", Seq("text")))
      .collect().head
    assert(r.getAs[String]("outcome") === "download_error")
    assert(r.isNullAt(r.fieldIndex("content")))
  }

  test("wrong content type -> no extracted record") {
    val r = Pdf.extract(resp(200, "text/html", Seq("<html></html>")))
      .collect().head
    assert(r.getAs[String]("outcome") === "wrong_content_type")
    assert(r.isNullAt(r.fieldIndex("content")))
  }

  test("whitespace-only text -> no extracted record") {
    val r = Pdf.extract(resp(200, "application/pdf", Seq("", "  ")))
      .collect().head
    assert(r.getAs[String]("outcome") === "empty_text")
    assert(r.isNullAt(r.fieldIndex("content")))
  }

  test("corpus responses plant all four outcomes") {
    val outcomes = Pdf.pdfExtract(spark, sfDir)
      .groupBy("outcome").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(outcomes.keySet ===
      Set("ok", "download_error", "wrong_content_type", "empty_text"))
    assert(outcomes("ok") > outcomes("download_error"))
  }
}
