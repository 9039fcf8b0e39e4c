package graft.ops

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.{Deflater, Inflater}
import scala.collection.mutable

/** A real, minimal PDF codec in pure JVM — no external library.
  *
  * The reference extracts PDF text with PyMuPDF (`file_handler.py:29-31`,
  * `text += page.get_text()`). No PDF library is resolvable in this
  * container (checked rounds 3-4: `/opt/spark/jars` carries none and
  * coursier runs offline), so this module implements the essential
  * subset of ISO 32000 that the extraction path needs, from scratch:
  *
  *   - [[encode]] writes a well-formed PDF 1.4: catalog → page tree →
  *     content streams per page (Helvetica `Tj` text operators), a
  *     correct byte-offset xref table and trailer. Streams are
  *     FlateDecode by default; options emit multi-stream `/Contents`
  *     arrays (§7.8.2) and ASCIIHexDecode / filter-chain framings
  *     (§7.4) so the parser is exercised on the layouts real writers
  *     produce. Output opens in any PDF viewer.
  *   - [[decode]] is a genuine parser, not a regex over the input: it
  *     reads `startxref`, walks the xref table to object offsets,
  *     resolves trailer `/Root` → `/Pages` → `/Kids` → per-page
  *     `/Contents` (single ref or array — array streams concatenate
  *     per §7.8.2), decodes each stream through its declared filter
  *     chain (`FlateDecode` via `java.util.zip.Inflater`,
  *     `ASCIIHexDecode` with EOD/odd-digit semantics, name or array
  *     form, checked against the dict's `/Length`), and tokenizes the
  *     decoded content stream — `(...) Tj` and `[... ] TJ` operators
  *     with full PDF string-escape handling (nested parens, `\\`,
  *     `\(`, `\)`, `\n`-family, octal `\ddd`, line continuations).
  *
  * PDF text extraction is lossy in general (layout, fonts); for the
  * subset the encoder emits it is exact, which is what makes an
  * encode → decode roundtrip oracle-checkable (q80): DuckDB derives
  * the expected page text directly, Spark must recover it through
  * real compressed-binary parsing. Same pattern as the q78 PNG
  * roundtrip.
  */
object PdfCodec {

  // ----------------------------------------------------------------- encode

  /** Escape a text line for a PDF literal string. Non-Latin-1 chars
    * are replaced ('?') — the encoder's declared subset is the PDF
    * standard-encoding range; the corpus content is ASCII. */
  private def escape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => b.append("\\\\")
      case '(' => b.append("\\(")
      case ')' => b.append("\\)")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c >= 0x20 && c <= 0xFF => b.append(c)
      case c if c < 0x20 => b.append(f"\\${c.toInt}%03o")
      case _ => b.append('?')
    }
    b.toString
  }

  private def deflate(bytes: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(bytes); d.finish()
    val out = new ByteArrayOutputStream(bytes.length / 2 + 32)
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(bytes: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(bytes)
    val out = new ByteArrayOutputStream(bytes.length * 2 + 32)
    val buf = new Array[Byte](4096)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      // a valid empty stream finishes on a 0-byte inflate with its
      // input consumed — only an UNfinished dry inflate is truncation
      if (n == 0 && !inf.finished() && inf.needsInput())
        throw new java.util.zip.DataFormatException("truncated FlateDecode stream")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** ASCIIHexDecode-encode (§7.4.2): two hex digits per byte, '>'
    * EOD marker, folded lines like real writers emit. */
  private def asciiHex(bytes: Array[Byte]): Array[Byte] = {
    val b = new StringBuilder(bytes.length * 2 + 8)
    bytes.zipWithIndex.foreach { case (v, i) =>
      b.append(f"${v & 0xff}%02x")
      if ((i + 1) % 40 == 0) b.append('\n')
    }
    b.append('>')
    b.toString.getBytes(ISO_8859_1)
  }

  /** Build a complete single-font PDF with one page per input string.
    * Object layout: 1 catalog, 2 page tree, 3 font, then page objects
    * followed by their content stream(s).
    *
    * `splitContents` emits each page's operators as a TWO-stream
    * `/Contents` array (§7.8.2 — PDF consumers must concatenate);
    * `hexFilter` encodes the first stream of each page through the
    * `[/ASCIIHexDecode /FlateDecode]` filter CHAIN (§7.4) and, when
    * splitting, the second stream as plain `/ASCIIHexDecode` — so one
    * file can exercise name-form filters, array-form chains, and
    * multi-stream pages at once. Defaults reproduce the round-3
    * single-stream FlateDecode layout byte-for-byte. */
  def encode(pages: Seq[String], splitContents: Boolean = false,
      hexFilter: Boolean = false): Array[Byte] = {
    val ps = if (pages.isEmpty) Seq("") else pages
    val out = new ByteArrayOutputStream(1024)
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val offsets = mutable.ArrayBuffer[Int]()
    def obj(body: => Unit): Unit = {
      offsets += out.size()
      w(s"${offsets.size} 0 obj\n"); body; w("endobj\n")
    }
    val objsPerPage = if (splitContents) 3 else 2
    w("%PDF-1.4\n")
    val kids = ps.indices.map(i => s"${4 + objsPerPage * i} 0 R").mkString(" ")
    obj(w(s"<< /Type /Catalog /Pages 2 0 R >>\n"))
    obj(w(s"<< /Type /Pages /Kids [$kids] /Count ${ps.size} >>\n"))
    obj(w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n"))
    def streamObj(ops: String, filter: String): Unit = {
      val raw = ops.getBytes(ISO_8859_1)
      val (data, dictFilter) = filter match {
        case "flate" => (deflate(raw), "/Filter /FlateDecode")
        case "hex+flate" =>
          (asciiHex(deflate(raw)), "/Filter [/ASCIIHexDecode /FlateDecode]")
        case "hex" => (asciiHex(raw), "/Filter /ASCIIHexDecode")
      }
      obj {
        w(s"<< /Length ${data.length} $dictFilter >>\nstream\n")
        out.write(data)
        w("\nendstream\n")
      }
    }
    ps.foreach { text =>
      val pageObj = offsets.size + 1
      val contents =
        if (splitContents) s"[${pageObj + 1} 0 R ${pageObj + 2} 0 R]"
        else s"${pageObj + 1} 0 R"
      obj(w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 3 0 R >> >> " +
        s"/Contents $contents >>\n"))
      // one Tj per source line, stepped down the page like a real writer
      val lines = text.split("\n", -1)
      val ops = lines.zipWithIndex.map { case (ln, i) =>
        s"BT /F1 12 Tf 72 ${720 - 14 * i} Td (${escape(ln)}) Tj ET"
      }
      if (splitContents) {
        // real split point: operators divide mid-page across streams
        val (a, b) = ops.splitAt((ops.length + 1) / 2)
        streamObj(a.mkString("\n"), if (hexFilter) "hex+flate" else "flate")
        streamObj(b.mkString("\n"), if (hexFilter) "hex" else "flate")
      } else
        streamObj(ops.mkString("\n"), if (hexFilter) "hex+flate" else "flate")
    }
    val xref = out.size()
    w(s"xref\n0 ${offsets.size + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offsets.size + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  // ----------------------------------------------------------------- decode

  /** Classification of a fetched document, mirroring the reference's
    * four outcomes (`file_handler.py:11-49`). */
  final case class Decoded(pages: Seq[String])

  private final class Cursor(val bytes: Array[Byte], var pos: Int) {
    def text: String = new String(bytes, ISO_8859_1)
    def skipWs(): Unit =
      while (pos < bytes.length && (bytes(pos) == ' ' || bytes(pos) == '\n' ||
        bytes(pos) == '\r' || bytes(pos) == '\t')) pos += 1
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"pdf parse error: $msg")

  /** Byte offset of each numbered object, from the xref table the
    * trailer points at (subsection headers `start count` handled). */
  private def readXref(s: String): Map[Int, Int] = {
    val sx = s.lastIndexOf("startxref")
    if (sx < 0) fail("no startxref")
    val xrefPos = """\d+""".r.findFirstIn(s.substring(sx + 9)).getOrElse(fail("bad startxref")).toInt
    if (!s.startsWith("xref", xrefPos)) fail("xref table not at offset")
    var i = xrefPos + 4
    val entries = mutable.Map[Int, Int]()
    val lineRe = """(?s)\s*(\d+)\s+(\d+)""".r
    var done = false
    while (!done) {
      lineRe.findPrefixMatchOf(s.substring(i)) match {
        case Some(m) if !s.substring(i).trim.startsWith("trailer") =>
          val start = m.group(1).toInt
          val count = m.group(2).toInt
          i += m.end
          // skip to first 20-byte entry (after the newline)
          while (s.charAt(i) == '\r' || s.charAt(i) == '\n' || s.charAt(i) == ' ') i += 1
          for (k <- 0 until count) {
            val entry = s.substring(i, i + 20)
            if (entry.charAt(17) == 'n')
              entries(start + k) = entry.substring(0, 10).toInt
            i += 20
          }
          if (s.substring(i).trim.startsWith("trailer")) done = true
        case _ => done = true
      }
    }
    entries.toMap
  }

  /** Value of `/Name` in the dict at/after `from`: an `N 0 R`
    * reference (returns N) — scoped to the object body. */
  private def ref(s: String, objStart: Int, name: String): Int = {
    val end = s.indexOf("endobj", objStart)
    val scope = s.substring(objStart, if (end < 0) s.length else end)
    (name + """\s+(\d+)\s+0\s+R""").r.findFirstMatchIn(scope)
      .getOrElse(fail(s"missing $name")).group(1).toInt
  }

  private def intsAfter(s: String, objStart: Int, name: String): Seq[Int] = {
    val end = s.indexOf("endobj", objStart)
    val scope = s.substring(objStart, if (end < 0) s.length else end)
    val arr = (name + """\s*\[([^\]]*)\]""").r.findFirstMatchIn(scope)
      .getOrElse(fail(s"missing $name array")).group(1)
    """(\d+)\s+0\s+R""".r.findAllMatchIn(arr).map(_.group(1).toInt).toSeq
  }

  /** ASCIIHexDecode (§7.4.2): whitespace ignored, '>' is EOD, an odd
    * trailing digit is padded with 0; anything else is an error. */
  private def hexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length / 2 + 1)
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '>') done = true
      else if (!c.isWhitespace) {
        val v = Character.digit(c, 16)
        if (v < 0) fail(s"bad hex digit '$c' in ASCIIHexDecode stream")
        if (hi < 0) hi = v else { out.write((hi << 4) | v); hi = -1 }
      }
      i += 1
    }
    if (!done) fail("ASCIIHexDecode stream missing '>' EOD")
    if (hi >= 0) out.write(hi << 4) // odd digit: pad low nibble with 0
    out.toByteArray
  }

  /** Decoded bytes of the stream object at `objStart`. Length comes
    * from the dict; `stream` keyword per §7.3.8 (EOL after keyword).
    * `/Filter` may be a single name or an array — a filter CHAIN
    * applied in order (§7.4): `[/ASCIIHexDecode /FlateDecode]` means
    * un-hex first, then inflate. */
  private def streamData(s: String, bytes: Array[Byte], objStart: Int): Array[Byte] = {
    val end = s.indexOf("endobj", objStart)
    val scope = s.substring(objStart, if (end < 0) s.length else end)
    val len = """/Length\s+(\d+)""".r.findFirstMatchIn(scope)
      .getOrElse(fail("missing /Length")).group(1).toInt
    val filters: Seq[String] =
      """/Filter\s*\[([^\]]*)\]""".r.findFirstMatchIn(scope) match {
        case Some(m) => """/(\w+)""".r.findAllMatchIn(m.group(1))
          .map(_.group(1)).toSeq
        case None => """/Filter\s*/(\w+)""".r.findFirstMatchIn(scope) match {
          case Some(m) => Seq(m.group(1))
          case None => Seq.empty // unfiltered stream
        }
      }
    val sk = s.indexOf("stream", objStart)
    if (sk < 0) fail("missing stream keyword")
    var dataStart = sk + 6
    if (bytes(dataStart) == '\r') dataStart += 1
    if (bytes(dataStart) == '\n') dataStart += 1
    val raw = java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + len)
    filters.foldLeft(raw) { (acc, f) =>
      f match {
        case "FlateDecode" => inflate(acc)
        case "ASCIIHexDecode" => hexDecode(acc)
        case other => fail(s"unsupported filter /$other")
      }
    }
  }

  /** Pull every shown string out of one decompressed content stream:
    * `(...) Tj`, `(...) '`, `(...) "` and `[(..) -kern (..)] TJ`,
    * with full escape handling. One shown string (or TJ array) per
    * output line — the layout granularity the encoder emits. */
  private[ops] def extractText(content: String): String = {
    var i = 0
    val n = content.length
    def parseString(): String = {
      // content(i) == '(' on entry
      val out = new StringBuilder
      var depth = 1
      i += 1
      while (i < n && depth > 0) {
        content.charAt(i) match {
          case '\\' if i + 1 < n =>
            content.charAt(i + 1) match {
              case 'n' => out.append('\n'); i += 2
              case 'r' => out.append('\r'); i += 2
              case 't' => out.append('\t'); i += 2
              case 'b' => out.append('\b'); i += 2
              case 'f' => out.append('\f'); i += 2
              case '(' => out.append('('); i += 2
              case ')' => out.append(')'); i += 2
              case '\\' => out.append('\\'); i += 2
              case '\n' => i += 2 // line continuation
              case c if c >= '0' && c <= '7' =>
                var j = i + 1; var v = 0
                while (j < n && j < i + 4 && content.charAt(j) >= '0' && content.charAt(j) <= '7') {
                  v = v * 8 + (content.charAt(j) - '0'); j += 1
                }
                out.append(v.toChar); i = j
              case c => out.append(c); i += 2
            }
          case '(' => depth += 1; out.append('('); i += 1
          case ')' =>
            depth -= 1
            if (depth > 0) out.append(')')
            i += 1
          case c => out.append(c); i += 1
        }
      }
      out.toString
    }
    val lines = mutable.ArrayBuffer[String]()
    val pending = mutable.ArrayBuffer[String]() // strings awaiting a show op
    while (i < n) {
      content.charAt(i) match {
        case '(' =>
          pending += parseString() // advances i past the closing paren
        case '[' =>
          pending.clear(); i += 1 // TJ array: gather its strings fresh
        case 'T' if i + 1 < n && content.charAt(i + 1) == 'j' =>
          if (pending.nonEmpty) lines += pending.last
          pending.clear(); i += 2
        case 'T' if i + 1 < n && content.charAt(i + 1) == 'J' =>
          lines += pending.mkString // TJ shows its array's strings glued
          pending.clear(); i += 2
        case '\'' | '"' => // move-and-show operators
          if (pending.nonEmpty) lines += pending.last
          pending.clear(); i += 1
        case _ => i += 1
      }
    }
    lines.mkString("\n")
  }

  /** Parse a full PDF byte array back to per-page text. */
  def decode(bytes: Array[Byte]): Decoded = {
    val s = new String(bytes, ISO_8859_1)
    if (!s.startsWith("%PDF-")) fail("not a PDF header")
    val xref = readXref(s)
    val trailerAt = s.lastIndexOf("trailer")
    if (trailerAt < 0) fail("no trailer")
    val root = """/Root\s+(\d+)\s+0\s+R""".r
      .findFirstMatchIn(s.substring(trailerAt)).getOrElse(fail("no /Root")).group(1).toInt
    val pagesObj = ref(s, xref(root), "/Pages")
    val kids = intsAfter(s, xref(pagesObj), "/Kids")
    val pages = kids.map { pk =>
      // /Contents is a single stream ref OR an array of refs whose
      // streams concatenate (with intervening whitespace, §7.8.2)
      // into one content stream before tokenization
      val contentObjs =
        try intsAfter(s, xref(pk), "/Contents")
        catch { case _: IllegalArgumentException =>
          Seq(ref(s, xref(pk), "/Contents")) }
      if (contentObjs.isEmpty) fail("empty /Contents array")
      val content = contentObjs
        .map(o => new String(streamData(s, bytes, xref(o)), ISO_8859_1))
        .mkString("\n")
      extractText(content)
    }
    Decoded(pages)
  }
}
