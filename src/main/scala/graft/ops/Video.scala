package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Video-column plumbing over a REAL container codec: each video is
  * one opaque `binary` cell holding an actual RIFF/AVI file ([[Avi]])
  * whose frames are complete PNG codestreams (the `MPNG` flavor of
  * the MJPEG codec family — one still-image codestream per `00dc`
  * chunk, here produced by the same per-frame image encoder as q78).
  * Frame-stride sampling is the preprocessing step every multimodal
  * training pipeline runs before a vision encoder sees anything: you
  * never featurize all 30 fps, you sample.
  *
  * Reference anchor: the vision ingest path
  * `/root/reference/backend/src/embeddings.py:18-43` (fetch → decode
  * → re-encode) generalized to frames.
  *
  * Oracle strategy (same split as q78): PNG frames are LOSSLESS, so
  * each decoded 4×4 raster equals the frame's source bytes —
  * md5(video_id:idx), which DuckDB derives independently from the hex
  * — putting real mux → demux → per-frame decode under the
  * cross-engine hash check. The MJPG (JPEG-frame) flavor rides the
  * same writer/reader and is spec-pinned instead (VideoSpec — DCT
  * output is codec-specific, like q78's JPEG tier).
  *
  * Scale shape: the container is built and parsed INSIDE
  * `mapPartitions` (no driver involvement); frame extraction slices
  * the `movi` chunk list, so only SAMPLED frames are ever decoded;
  * the only fan-out is one row per sampled frame (stride 4 → 4×
  * fewer rows than frames); features reduce per duration bucket with
  * decimal-accumulated means (partial aggs).
  */
object Video {

  /** Sampling stride: keep every 4th frame. */
  val Stride = 4

  case class VideoMeta(video_id: Long, n_frames: Int)
  case class VideoFile(video_id: Long, n_frames: Int, content: Array[Byte])
  case class FrameFeatures(video_id: Long, bucket: String, n_frames: Int,
    mean_byte: Double, h0: Int, h1: Int, h2: Int, h3: Int)

  /** Frame idx of video id — 16 deterministic bytes both engines can
    * derive: md5("<id>:<idx>"), same derivation as the former inline
    * synthesis so the oracle math is unchanged. */
  private[graft] def frameBytes(videoId: Long, idx: Int): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$videoId:$idx".getBytes("UTF-8"))

  /** Mux one synthetic video: n frames of md5-derived 4×4 rasters,
    * each PNG-encoded ([[Media.pngBytes]]) and written into a real
    * AVI container. */
  private[graft] def muxVideo(videoId: Long, nFrames: Int,
      handler: String = "MPNG"): Array[Byte] = {
    val frames = (0 until nFrames).map { i =>
      val b = frameBytes(videoId, i)
      if (handler == "MJPG") Media.jpegBytes(b) else Media.pngBytes(b)
    }
    Avi.write(frames, 4, 4, handler)
  }

  /** Synthetic video table: one real AVI binary per part row, 8-32
    * PNG frames each, muxed per partition. */
  def videoTable(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, sfDir).select(
      col("p_partkey").as("video_id"),
      (lit(8) + pmod(col("p_partkey"), lit(25))).cast("int").as("n_frames"))
      // the part scan is ONE input split at bench SF (a few MB of
      // parquet), which serialized every mux+demux+decode onto a
      // single task — spread the metadata rows across cores BEFORE
      // the CPU-bound codec stages (r15; guide §2.5 input skew, the
      // same fix Phash.imageNearDup already carries). Only (id,
      // n_frames) rows cross the exchange; every downstream rollup is
      // an order-independent partial agg, so results are unchanged.
      .repartition(spark.sparkContext.defaultParallelism)
      .as[VideoMeta]
      .mapPartitions(_.map(v =>
        VideoFile(v.video_id, v.n_frames, muxVideo(v.video_id, v.n_frames))))
      .toDF()
  }

  /** Demux + stride-sample + per-frame decode, per partition: parse
    * the container, take every [[Stride]]th frame chunk, decode ONLY
    * those through the image codec, feature each raster. The frame
    * count comes from the PARSED header (cross-checked against the
    * declared metadata — a real pipeline trusts the container, then
    * audits it). One PNG ImageReader is hoisted per PARTITION —
    * `ImageIO.read`'s per-call registry scan + stream setup is the
    * dominant cost at millions of frames; the reader itself (the
    * real JDK PNG decoder) is what runs either way. */
  private def sampleAndDecode(rows: Iterator[VideoFile]): Iterator[FrameFeatures] = {
    val pngReader = javax.imageio.ImageIO
      .getImageReadersByFormatName("png").next()
    def decodeFrame(frame: Array[Byte]): java.awt.image.BufferedImage =
      if (frame.length >= 8 && (frame(0) & 0xff) == 0x89 && frame(1) == 'P') {
        // finalizer-free in-memory stream (Media doc): the disk-cache
        // convenience path costs IO, and the MemoryCache variant
        // queues one FINALIZABLE object per frame — a GC-stall source
        // at 32-way parallelism (r15)
        pngReader.setInput(new Media.ByteArrayImageInputStream(frame))
        pngReader.read(0)
      } else // non-PNG flavors (MJPG) keep the sniffing path
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frame))
    rows.flatMap { r =>
      val av = Avi.read(r.content)
      require(av.totalFrames == av.frames.length,
        s"video ${r.video_id}: header declares ${av.totalFrames} frames, " +
          s"movi carries ${av.frames.length}")
      require(av.totalFrames == r.n_frames,
        s"video ${r.video_id}: container says ${av.totalFrames} frames, " +
          s"metadata column says ${r.n_frames}")
      val n = av.totalFrames
      val bucket =
        if (n < 16) "short" else if (n < 24) "medium" else "long"
      (0 until n by Stride).iterator.map { idx =>
        val img = decodeFrame(av.frames(idx))
        val raster = img.getRaster
        val hist = new Array[Int](4)
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = raster.getSample(x, y, 0)
            sum += p
            hist(p >> 6) += 1
            x += 1
          }
          y += 1
        }
        val np = img.getWidth * img.getHeight
        FrameFeatures(r.video_id, bucket, n,
          math.round(sum.toDouble / np * 10000.0) / 10000.0,
          hist(0), hist(1), hist(2), hist(3))
      }
    }
  }

  /** q97: mux → demux → stride-sample → decode real frames out of the
    * AVI binary column, roll up by duration bucket. */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val feats: Dataset[FrameFeatures] =
      videoTable(spark, sfDir).as[VideoFile].mapPartitions(sampleAndDecode)
    feats.toDF().groupBy(col("bucket")).agg(
      countDistinct(col("video_id")).as("n_videos"),
      count(lit(1)).as("n_sampled"),
      round(sum(col("mean_byte").cast("decimal(18,4)")).cast("double")
        / count(lit(1)), 4).as("avg_mean_byte"),
      sum(col("h0")).as("h0"), sum(col("h1")).as("h1"),
      sum(col("h2")).as("h2"), sum(col("h3")).as("h3"))
      .orderBy(col("bucket"))
  }

  /** Oracle: PNG frames are lossless, so every decoded raster equals
    * the md5-derived source bytes — DuckDB runs the identical feature
    * math straight from the hex, never touching the container. */
  val frameSampleSql: String =
    s"""WITH videos AS (
      |  SELECT p_partkey AS video_id,
      |    8 + p_partkey % 25 AS n_frames,
      |    CASE WHEN 8 + p_partkey % 25 < 16 THEN 'short'
      |         WHEN 8 + p_partkey % 25 < 24 THEN 'medium'
      |         ELSE 'long' END AS bucket
      |  FROM part),
      |sampled AS (
      |  SELECT video_id, bucket, n_frames,
      |    unnest(range(0, n_frames, $Stride)) AS frame_idx
      |  FROM videos),
      |frames AS (
      |  SELECT video_id, bucket, n_frames, frame_idx,
      |    md5(video_id || ':' || frame_idx) AS hx
      |  FROM sampled),
      |feats AS (
      |  SELECT video_id, bucket,
      |    ROUND(CAST(list_sum(bs) AS DOUBLE) / 16, 4) AS mean_byte,
      |    len(list_filter(bs, b -> b // 64 = 0)) AS h0,
      |    len(list_filter(bs, b -> b // 64 = 1)) AS h1,
      |    len(list_filter(bs, b -> b // 64 = 2)) AS h2,
      |    len(list_filter(bs, b -> b // 64 = 3)) AS h3
      |  FROM (
      |    SELECT video_id, bucket,
      |      list_transform(generate_series(0, 15),
      |        i -> ('0x' || substr(hx, 2 * i + 1, 2))::INT) AS bs
      |    FROM frames))
      |SELECT bucket,
      |  CAST(COUNT(DISTINCT video_id) AS BIGINT) AS n_videos,
      |  CAST(COUNT(*) AS BIGINT) AS n_sampled,
      |  ROUND(CAST(SUM(CAST(mean_byte AS DECIMAL(18,4))) AS DOUBLE)
      |        / COUNT(*), 4) AS avg_mean_byte,
      |  CAST(SUM(h0) AS BIGINT) AS h0, CAST(SUM(h1) AS BIGINT) AS h1,
      |  CAST(SUM(h2) AS BIGINT) AS h2, CAST(SUM(h3) AS BIGINT) AS h3
      |FROM feats GROUP BY bucket ORDER BY bucket""".stripMargin
}
