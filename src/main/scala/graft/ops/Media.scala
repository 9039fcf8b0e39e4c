package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted per
  * partition — the Spark-side shape (schema, partitioning, typed
  * batch iteration) of a media pipeline.
  *
  * Two decode tiers:
  *
  *   - [[mediaFeatures]] (q33) keeps the BYTEWISE stand-in — the
  *     audio/video half has no codec in this container, so bytewise
  *     statistics stand in for "decode then featurize" behind the
  *     real mapPartitions plumbing.
  *   - [[imageDecode]] (q78) is a REAL codec path: the payload is
  *     encoded as an actual 4×4 8-bit grayscale PNG and decoded back
  *     with `javax.imageio` (JDK built-in, no extra dependency).
  *     PNG is lossless, so the decoded raster must equal the source
  *     bytes — which the DuckDB oracle derives independently from
  *     the md5 hex — putting a genuine encode→decode roundtrip
  *     under the cross-engine hash check (and MediaSpec pins
  *     pixel-exact recovery). JPEG payloads ride the SAME decode
  *     ([[decodeImage]] sniffs the format) and [[reencodeJpeg]]
  *     mirrors the reference's normalize-to-JPEG step
  *     (`backend/src/embeddings.py:22-31`) — lossy, so spec-pinned
  *     instead of oracle-hashed.
  */
object Media {

  case class MediaRow(id: Long, kind: String, content: Array[Byte],
      width: Int, height: Int)
  case class MediaFeatures(id: Long, kind: String, n_bytes: Int,
      mean_byte: Double, h0: Int, h1: Int, h2: Int, h3: Int)

  /** Synthetic media table: 16 deterministic bytes per row (md5 of
    * the part name — both engines can derive them), typed metadata. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir).select(
      col("p_partkey").as("id"),
      when(pmod(col("p_partkey"), lit(3)) === 0, lit("audio"))
        .otherwise(lit("image")).as("kind"),
      unhex(md5(col("p_name"))).as("content"),
      (lit(64) + pmod(col("p_partkey"), lit(512)).cast("int")).as("width"),
      (lit(64) + pmod(col("p_partkey") * 7, lit(512)).cast("int"))
        .as("height"))

  /** STUB decode: bytewise mean + 4-bucket histogram (by top 2 bits).
    * A real implementation would decode pixels/samples here; the
    * iterator shape (per-partition batch, no driver collect) is what
    * matters for scale. */
  private def decodeFeatures(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      val bytes = r.content.map(_ & 0xff)
      val hist = new Array[Int](4)
      bytes.foreach(b => hist(b >> 6) += 1)
      MediaFeatures(r.id, r.kind, bytes.length,
        math.round(bytes.sum.toDouble / bytes.length * 10000.0) / 10000.0,
        hist(0), hist(1), hist(2), hist(3))
    }

  /** The media feature-extraction query: typed mapPartitions over the
    * binary column, then a per-kind rollup. */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ds: Dataset[MediaRow] = mediaTable(spark, sfDir).as[MediaRow]
    val feats = ds.mapPartitions(decodeFeatures).toDF()
    feats.groupBy(col("kind")).agg(
      count(lit(1)).as("n_media"),
      round(sum(col("mean_byte").cast("decimal(18,4)")).cast("double")
        / count(lit(1)), 4).as("avg_mean_byte"),
      sum(col("h0")).as("h0"), sum(col("h1")).as("h1"),
      sum(col("h2")).as("h2"), sum(col("h3")).as("h3"))
      .orderBy(col("kind"))
  }

  /** Vision embedding over the media table's BINARY column (P6/S4):
    * the bytes are base64-encoded (the representation the reference
    * ships to its vision model, `embeddings.py:28-31`) and
    * hash-featurized — the deterministic byte-consuming twin of the
    * Ollama llava call. Exploded to (id, dim, v) like q31 so the
    * oracle verifies every component. */
  def visionEmbed(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir)
      .filter(col("kind") === "image" && col("id") < 30)
      .select(col("id"), posexplode(
        graft.functions.Embeddings.embedVision(col("content"))))
      .select(col("id"), col("pos").cast("long").as("dim"),
        round(col("col"), 6).as("v"))
      .orderBy(col("id"), col("dim"))

  val visionEmbedSql: String = {
    val ctes = graft.functions.Embeddings.featurizeCtes(
      """(SELECT p_partkey AS id, to_base64(unhex(md5(p_name))) AS b64
        |      FROM part
        |      WHERE p_partkey % 3 <> 0 AND p_partkey < 30)""".stripMargin,
      "id", "b64")
    s"""WITH $ctes
      |SELECT id, i - 1 AS dim, ROUND(v[i], 6) AS v
      |FROM feat CROSS JOIN generate_series(1, 64) AS t(i)
      |ORDER BY id, dim""".stripMargin
  }

  case class ImageBytes(id: Long, png: Array[Byte])
  case class DecodedImage(id: Long, width: Int, height: Int,
      mean_pixel: Double, h0: Int, h1: Int, h2: Int, h3: Int)

  /** 16-byte payload laid out as a 4×4 8-bit grayscale raster. */
  private[graft] def grayRaster4x4(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < 16) {
      raster.setSample(i % 4, i / 4, 0, bytes(i) & 0xff)
      i += 1
    }
    img
  }

  /** One 4×4 grayscale raster as a spec-conformant PNG (single-raster
    * form — shared with the AVI frame muxer, [[Avi]]).
    *
    * Written directly from the public PNG spec (signature, IHDR,
    * zlib-deflated filter-0 scanlines in IDAT, IEND, CRC-32 per
    * chunk) instead of through `ImageIO.write`: the AVI mux path
    * encodes millions of frames per query, and ImageIO's per-call
    * registry lookup + stream setup dominates at that volume
    * (measured: q97 21.7 s → ImageIO-free encode below). The output
    * is a REAL PNG — `ImageIO.read` (the decode side everywhere in
    * this module) round-trips it pixel-exactly, which MediaSpec and
    * the q78/q97 oracles keep pinned. */
  private[graft] def pngBytes(bytes: Array[Byte]): Array[Byte] =
    pngBytesWH(bytes, 4, 4)

  /** General-dims form of the direct PNG writer (row-major grayscale
    * payload, w·h bytes). */
  private[graft] def pngBytesWH(bytes: Array[Byte], w: Int, h: Int)
      : Array[Byte] = {
    require(bytes.length == w * h, s"payload ${bytes.length} != $w x $h")
    // raw scanlines, filter byte 0 per row
    val raw = new Array[Byte](h * (w + 1))
    var y = 0
    while (y < h) {
      // raw(y*(w+1)) stays 0: filter type None
      var x = 0
      while (x < w) {
        raw(y * (w + 1) + 1 + x) = bytes(y * w + x)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream(96)
    def u32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def chunk(typ: String, data: Array[Byte]): Unit = {
      u32(data.length.toLong)
      val tb = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(tb); out.write(data); u32(crc.getValue)
    }
    out.write(Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte))
    val ihdr = new java.io.ByteArrayOutputStream(13)
    def ih32(v: Int): Unit = {
      ihdr.write(v >> 24); ihdr.write((v >> 16) & 0xff)
      ihdr.write((v >> 8) & 0xff); ihdr.write(v & 0xff)
    }
    ih32(w); ih32(h)
    ihdr.write(8)  // bit depth
    ihdr.write(0)  // color type: grayscale
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // deflate, filter 0, no interlace
    chunk("IHDR", ihdr.toByteArray)
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val zbuf = new Array[Byte](64 + raw.length * 2)
    var zn = 0
    while (!d.finished()) zn += d.deflate(zbuf, zn, zbuf.length - zn)
    d.end()
    chunk("IDAT", java.util.Arrays.copyOf(zbuf, zn))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Seekable in-memory `ImageInputStream` over a byte array for the
    * per-frame decode hot paths (Scenes/Video). The stock
    * `MemoryCacheImageInputStream` inherits a non-trivial
    * `ImageInputStreamImpl.finalize()` (still present in JDK 17), so
    * one stream per frame queues hundreds of thousands of FINALIZABLE
    * objects per query — measured as multi-second erratic GC stalls
    * (q175 reps swinging 3 s → 36 s) once the decode stages went
    * 32-way parallel (r15). The empty `finalize` override here is the
    * documented HotSpot trivial-finalizer escape: the class is not
    * registered for finalization, and there is nothing to clean up —
    * the buffer is plain heap memory. */
  private[graft] final class ByteArrayImageInputStream(buf: Array[Byte])
      extends javax.imageio.stream.ImageInputStreamImpl {
    override def read(): Int = {
      checkClosed(); bitOffset = 0
      if (streamPos >= buf.length) -1
      else { val b = buf(streamPos.toInt) & 0xff; streamPos += 1; b }
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      checkClosed(); bitOffset = 0
      if (streamPos >= buf.length) -1
      else {
        val n = math.min(len, buf.length - streamPos.toInt)
        System.arraycopy(buf, streamPos.toInt, b, off, n)
        streamPos += n
        n
      }
    }
    override def length(): Long = buf.length.toLong
    override def isCached: Boolean = true
    override def isCachedMemory: Boolean = true
    @annotation.nowarn("cat=deprecation")
    override protected def finalize(): Unit = {}
  }

  /** One 4×4 grayscale raster through the JDK's JPEG encoder. */
  private[graft] def jpegBytes(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(grayRaster4x4(bytes), "jpg", bos)
    bos.toByteArray
  }

  /** REAL image encode: the 16-byte payload laid out as a 4×4 8-bit
    * grayscale raster and written through the JDK's PNG encoder —
    * actual image bytes, per partition, no driver involvement. */
  private[graft] def encodePng(rows: Iterator[MediaRow]): Iterator[ImageBytes] =
    rows.map(r => ImageBytes(r.id, pngBytes(r.content)))

  /** REAL image encode, JPEG flavor: same 4×4 grayscale raster
    * through the JDK's JPEG writer. The reference re-encodes ANY
    * fetched image to JPEG before embedding
    * (`backend/src/embeddings.py:22-31`, PIL `convert("RGB")` +
    * `save(format="JPEG")`); this is that normalization step. JPEG is
    * LOSSY, so this path is spec-pinned (MediaSpec tolerance + chain
    * checks) rather than cross-engine oracle-hashed — the DCT output
    * is codec-specific. */
  private[graft] def encodeJpeg(rows: Iterator[MediaRow]): Iterator[ImageBytes] =
    rows.map(r => ImageBytes(r.id, jpegBytes(r.content)))

  /** The reference's image-normalization step as a per-partition
    * transform: decode WHATEVER format the payload is in (ImageIO
    * sniffs PNG/JPEG/GIF/BMP from the bytes) and re-encode as JPEG —
    * the byte-level contract `embeddings.py:22-31` establishes before
    * the vision model sees anything. */
  private[graft] def reencodeJpeg(rows: Iterator[ImageBytes]): Iterator[ImageBytes] =
    rows.map { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.png))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      ImageBytes(r.id, bos.toByteArray)
    }

  /** REAL image decode: `javax.imageio` sniffs the container format
    * from the bytes (PNG and JPEG both ride this path — the reference
    * accepts arbitrary fetched images) and the features come off the
    * decoded raster. For PNG (lossless) the raster equals the original
    * payload bytes, which is what makes the q78 roundtrip
    * oracle-checkable; the JPEG flavor is pinned by MediaSpec. */
  private[graft] def decodeImage(rows: Iterator[ImageBytes]): Iterator[DecodedImage] =
    rows.map { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.png))
      val w = img.getWidth
      val h = img.getHeight
      val raster = img.getRaster
      val hist = new Array[Int](4)
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = raster.getSample(x, y, 0)
          sum += p
          hist(p >> 6) += 1
          x += 1
        }
        y += 1
      }
      DecodedImage(r.id, w, h,
        math.round(sum.toDouble / (w * h) * 10000.0) / 10000.0,
        hist(0), hist(1), hist(2), hist(3))
    }

  /** q78: encode → decode through the real PNG codec, features from
    * the decoded raster, one row per image. */
  def imageDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ds = mediaTable(spark, sfDir)
      .filter(col("kind") === "image" && col("id") < 50)
      .as[MediaRow]
    ds.mapPartitions(rows => decodeImage(encodePng(rows))).toDF()
      .select(col("id"), col("width"), col("height"), col("mean_pixel"),
        col("h0"), col("h1"), col("h2"), col("h3"))
      .orderBy(col("id"))
  }

  /** Oracle: PNG is lossless, so the decoded raster features equal
    * the same byte math DuckDB derives straight from the md5 hex. */
  val imageDecodeSql: String =
    """WITH media AS (
      |  SELECT p_partkey AS id, md5(p_name) AS hx
      |  FROM part
      |  WHERE p_partkey % 3 <> 0 AND p_partkey < 50),
      |bytes AS (
      |  SELECT id,
      |    list_transform(generate_series(0, 15),
      |      i -> ('0x' || substr(hx, 2 * i + 1, 2))::INT) AS bs
      |  FROM media)
      |SELECT id, CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
      |  ROUND(CAST(list_sum(bs) AS DOUBLE) / 16, 4) AS mean_pixel,
      |  CAST(len(list_filter(bs, b -> b // 64 = 0)) AS INT) AS h0,
      |  CAST(len(list_filter(bs, b -> b // 64 = 1)) AS INT) AS h1,
      |  CAST(len(list_filter(bs, b -> b // 64 = 2)) AS INT) AS h2,
      |  CAST(len(list_filter(bs, b -> b // 64 = 3)) AS INT) AS h3
      |FROM bytes
      |ORDER BY id""".stripMargin

  /** Oracle: identical byte math from the md5 hex string (DuckDB
    * derives the same 16 bytes as hex digit pairs). */
  val mediaFeaturesSql: String =
    """WITH media AS (
      |  SELECT p_partkey AS id,
      |    CASE WHEN p_partkey % 3 = 0 THEN 'audio' ELSE 'image' END AS kind,
      |    md5(p_name) AS hx
      |  FROM part),
      |bytes AS (
      |  SELECT id, kind,
      |    list_transform(generate_series(0, 15),
      |      i -> ('0x' || substr(hx, 2 * i + 1, 2))::INT) AS bs
      |  FROM media),
      |feats AS (
      |  SELECT id, kind,
      |    ROUND(CAST(list_sum(bs) AS DOUBLE) / 16, 4) AS mean_byte,
      |    len(list_filter(bs, b -> b // 64 = 0)) AS h0,
      |    len(list_filter(bs, b -> b // 64 = 1)) AS h1,
      |    len(list_filter(bs, b -> b // 64 = 2)) AS h2,
      |    len(list_filter(bs, b -> b // 64 = 3)) AS h3
      |  FROM bytes)
      |SELECT kind, COUNT(*) AS n_media,
      |  ROUND(CAST(SUM(CAST(mean_byte AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS avg_mean_byte,
      |  CAST(SUM(h0) AS BIGINT) AS h0, CAST(SUM(h1) AS BIGINT) AS h1, CAST(SUM(h2) AS BIGINT) AS h2, CAST(SUM(h3) AS BIGINT) AS h3
      |FROM feats GROUP BY kind ORDER BY kind""".stripMargin

  // ---- q169: image resize through the real codec ----------------

  case class ResizedImage(id: Long, width: Int, height: Int,
      p00: Int, p01: Int, p10: Int, p11: Int, mean_pixel: Double)

  /** Area (box-filter) 2× downscale on the DECODED raster: each
    * output pixel is the floor-average of its 2×2 source block — the
    * normalization step every vision pipeline runs before embedding
    * (PIL `Image.resize(..., BOX)` semantics on integer grids). The
    * result is re-encoded as a real 2×2 PNG, so the downstream decode
    * exercises the codec at the new dimensions. */
  private[graft] def resizeHalf(rows: Iterator[ImageBytes])
      : Iterator[ImageBytes] =
    rows.map { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.png))
      val raster = img.getRaster
      val out = new Array[Byte](4)
      var ry = 0
      while (ry < 2) {
        var rx = 0
        while (rx < 2) {
          val s = raster.getSample(2 * rx, 2 * ry, 0) +
            raster.getSample(2 * rx + 1, 2 * ry, 0) +
            raster.getSample(2 * rx, 2 * ry + 1, 0) +
            raster.getSample(2 * rx + 1, 2 * ry + 1, 0)
          out(ry * 2 + rx) = (s / 4).toByte
          rx += 1
        }
        ry += 1
      }
      ImageBytes(r.id, pngBytesWH(out, 2, 2))
    }

  private[graft] def decodeResized(rows: Iterator[ImageBytes])
      : Iterator[ResizedImage] =
    rows.map { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.png))
      val raster = img.getRaster
      val p = Array(raster.getSample(0, 0, 0), raster.getSample(1, 0, 0),
        raster.getSample(0, 1, 0), raster.getSample(1, 1, 0))
      ResizedImage(r.id, img.getWidth, img.getHeight,
        p(0), p(1), p(2), p(3),
        math.round(p.sum.toDouble / 4 * 10000.0) / 10000.0)
    }

  /** q169: encode → decode → area-resize → RE-encode at 2×2 → decode,
    * all through the real PNG codec inside the scan partition (the
    * missing member of the decode / feature-extract / resize /
    * frame-sample quartet). Exposes the resized pixels themselves so
    * the oracle certifies the resample arithmetic, not just a
    * digest. */
  def imageResize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ds = mediaTable(spark, sfDir)
      .filter(col("kind") === "image" && col("id") < 50)
      .as[MediaRow]
    ds.mapPartitions(rows => decodeResized(resizeHalf(encodePng(rows))))
      .toDF()
      .select(col("id"), col("width"), col("height"),
        col("p00"), col("p01"), col("p10"), col("p11"), col("mean_pixel"))
      .orderBy(col("id"))
  }

  /** Oracle: PNG is lossless at both sizes, so the resized pixels
    * equal the 2×2 block floor-averages of the md5 byte math. */
  val imageResizeSql: String =
    """WITH media AS (
      |  SELECT p_partkey AS id, md5(p_name) AS hx
      |  FROM part
      |  WHERE p_partkey % 3 <> 0 AND p_partkey < 50),
      |bytes AS (
      |  SELECT id,
      |    list_transform(generate_series(0, 15),
      |      i -> ('0x' || substr(hx, 2 * i + 1, 2))::INT) AS bs
      |  FROM media),
      |rs AS (
      |  SELECT id,
      |    (bs[1] + bs[2] + bs[5] + bs[6]) // 4 AS p00,
      |    (bs[3] + bs[4] + bs[7] + bs[8]) // 4 AS p01,
      |    (bs[9] + bs[10] + bs[13] + bs[14]) // 4 AS p10,
      |    (bs[11] + bs[12] + bs[15] + bs[16]) // 4 AS p11
      |  FROM bytes)
      |SELECT id, CAST(2 AS INT) AS width, CAST(2 AS INT) AS height,
      |  CAST(p00 AS INT) AS p00, CAST(p01 AS INT) AS p01,
      |  CAST(p10 AS INT) AS p10, CAST(p11 AS INT) AS p11,
      |  ROUND(CAST(p00 + p01 + p10 + p11 AS DOUBLE) / 4, 4) AS mean_pixel
      |FROM rs
      |ORDER BY id""".stripMargin
}
