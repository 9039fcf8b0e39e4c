package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Scene-change (shot-boundary) detection — the multimodal curation
  * step after frame SAMPLING (q97): a training pipeline doesn't want
  * every 4th frame, it wants one frame per SHOT, and the classic
  * detector is a mean-absolute-difference threshold between
  * consecutive decoded frames (the histogram/pixel-difference family;
  * see Boreczky & Rowe, "Comparison of video shot boundary detection
  * techniques", 1996). Videos here are real AVI containers whose
  * frames carry SCENE STRUCTURE: runs of near-identical frames
  * (md5-derived base raster + a 1-byte within-scene jitter) split by
  * hard cuts to a fresh base — so within-scene MAD is tiny, cut MAD
  * is ~85, and the threshold genuinely separates them.
  *
  * Oracle strategy (q97's): PNG frames are lossless, so DuckDB
  * recomputes every decoded raster from the md5 hex + jitter math and
  * runs the identical pair-difference detector — real mux → demux →
  * full-decode → adjacent-frame differencing lands under the
  * cross-engine hash gate, including the detector's hits/misses
  * against the planted scene truth.
  *
  * Scale shape: mux, demux, decode, and differencing all live inside
  * one `mapPartitions` (payload bytes never cross a shuffle; the
  * adjacent-pair state is two rasters); only per-PAIR scalar rows
  * (sad, flags) leave the scan, and the rollup is partial-agged. A
  * full decode is inherent to pixel-difference detection — the knob
  * at 100 TB is the same stride-vs-accuracy trade q97 models, not a
  * different plan. */
object Scenes {

  /** Detector threshold on the 16-pixel sum of absolute differences:
    * SAD > 256 ⟺ MAD > 16 gray levels — integer compare, exact in
    * both engines. */
  val SadThreshold = 256

  case class SceneVideo(video_id: Long, n_frames: Int, scene_len: Int,
    content: Array[Byte])
  case class PairRow(video_id: Long, scene_len: Int, sad: Long,
    detected: Boolean, true_cut: Boolean)

  /** Frame raster: 16 bytes = md5("<id>:<scene>") with byte 0
    * jittered by the within-scene frame offset — scenes are
    * near-constant, cuts jump to fresh md5 noise. */
  private[graft] def sceneFrame(videoId: Long, idx: Int,
      sceneLen: Int): Array[Byte] = {
    val b = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$videoId:${idx / sceneLen}".getBytes("UTF-8"))
    b(0) = (((b(0) & 0xff) + idx % sceneLen) % 256).toByte
    b
  }

  /** Synthetic scene-structured video table: one real AVI per part
    * row, 12-24 PNG frames in scenes of 3-6. */
  def videoTable(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, sfDir).select(
      col("p_partkey").as("video_id"),
      (lit(12) + pmod(col("p_partkey"), lit(13))).cast("int").as("n_frames"),
      (lit(3) + pmod(col("p_partkey"), lit(4))).cast("int").as("scene_len"))
      // spread the metadata rows across cores BEFORE the CPU-bound
      // mux/decode stages — the part scan is one input split at bench
      // SF, which serialized the whole codec pipeline onto a single
      // task (r15; guide §2.5, same fix as Phash/Video). Rollups are
      // order-independent partial aggs, so results are unchanged.
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Int, Int)]
      .mapPartitions(_.map { case (id, n, len) =>
        val frames = (0 until n).map(i =>
          Media.pngBytes(sceneFrame(id, i, len)))
        SceneVideo(id, n, len, Avi.write(frames, 4, 4, "MPNG"))
      })
      .toDF()
  }

  /** Demux + decode ALL frames + adjacent SAD, per partition. */
  private def pairDiffs(rows: Iterator[SceneVideo]): Iterator[PairRow] = {
    val pngReader = javax.imageio.ImageIO
      .getImageReadersByFormatName("png").next()
    def decode(frame: Array[Byte]): Array[Int] = {
      // finalizer-free stream (Media.ByteArrayImageInputStream): the
      // per-frame MemoryCacheImageInputStream queued one FINALIZABLE
      // object per decode — at 32-way parallelism the finalizer
      // backlog caused multi-second GC stalls (r15)
      pngReader.setInput(new Media.ByteArrayImageInputStream(frame))
      val img = pngReader.read(0)
      val out = new Array[Int](img.getWidth * img.getHeight)
      val raster = img.getRaster
      var k = 0; var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) { out(k) = raster.getSample(x, y, 0); k += 1; x += 1 }
        y += 1
      }
      out
    }
    rows.flatMap { v =>
      val av = Avi.read(v.content)
      require(av.totalFrames == v.n_frames,
        s"video ${v.video_id}: container ${av.totalFrames} != meta ${v.n_frames}")
      var prev = decode(av.frames(0))
      (1 until av.totalFrames).iterator.map { i =>
        val cur = decode(av.frames(i))
        var sad = 0L; var k = 0
        while (k < cur.length) { sad += math.abs(cur(k) - prev(k)); k += 1 }
        prev = cur
        PairRow(v.video_id, v.scene_len, sad,
          sad > SadThreshold, i % v.scene_len == 0)
      }
    }
  }

  /** q175: scene-cut census per scene length — detector hits vs the
    * planted truth, plus the separation the threshold exploits (mean
    * SAD at true cuts vs within scenes). */
  def sceneCuts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pairs: Dataset[PairRow] =
      videoTable(spark, sfDir).as[SceneVideo].mapPartitions(pairDiffs)
    pairs.toDF().groupBy(col("scene_len"))
      .agg(countDistinct(col("video_id")).as("n_videos"),
        count(lit(1)).as("n_pairs"),
        sum(when(col("detected"), 1L).otherwise(0L)).as("detected_cuts"),
        sum(when(col("true_cut"), 1L).otherwise(0L)).as("true_cuts"),
        sum(when(col("detected") && col("true_cut"), 1L).otherwise(0L))
          .as("matched_cuts"),
        round(sum(when(col("true_cut"), col("sad")).otherwise(0L))
          .cast("double")
          / (sum(when(col("true_cut"), 1L).otherwise(0L)) * 16.0), 4)
          .as("mean_cut_mad"),
        round(sum(when(!col("true_cut"), col("sad")).otherwise(0L))
          .cast("double")
          / (sum(when(!col("true_cut"), 1L).otherwise(0L)) * 16.0), 4)
          .as("mean_scene_mad"))
      .orderBy(col("scene_len"))
  }

  /** DuckDB oracle: rasters recomputed from the md5 hex + jitter
    * math (PNG lossless), identical integer SAD detector. */
  val sceneCutsSql: String =
    s"""WITH videos AS (
      |  SELECT p_partkey AS video_id,
      |    12 + p_partkey % 13 AS n_frames,
      |    3 + p_partkey % 4 AS scene_len
      |  FROM part),
      |idx AS (
      |  SELECT video_id, scene_len,
      |    unnest(range(0, n_frames)) AS i
      |  FROM videos),
      |fb AS (
      |  SELECT video_id, scene_len, i,
      |    list_transform(generate_series(0, 15), j -> CASE WHEN j = 0
      |      THEN (('0x' || substr(md5(video_id || ':' || (i // scene_len)),
      |              1, 2))::INT + (i % scene_len)) % 256
      |      ELSE ('0x' || substr(md5(video_id || ':' || (i // scene_len)),
      |              2 * j + 1, 2))::INT END) AS bs
      |  FROM idx),
      |pairs AS (
      |  SELECT a.video_id, a.scene_len,
      |    list_sum(list_transform(generate_series(1, 16),
      |      k -> abs(a.bs[k] - b.bs[k]))) AS sad,
      |    (b.i % b.scene_len = 0) AS true_cut
      |  FROM fb a JOIN fb b
      |    ON a.video_id = b.video_id AND b.i = a.i + 1)
      |SELECT CAST(scene_len AS INT) AS scene_len,
      |  CAST(COUNT(DISTINCT video_id) AS BIGINT) AS n_videos,
      |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(SUM(CASE WHEN sad > $SadThreshold THEN 1 ELSE 0 END) AS BIGINT)
      |    AS detected_cuts,
      |  CAST(SUM(CASE WHEN true_cut THEN 1 ELSE 0 END) AS BIGINT)
      |    AS true_cuts,
      |  CAST(SUM(CASE WHEN sad > $SadThreshold AND true_cut
      |    THEN 1 ELSE 0 END) AS BIGINT) AS matched_cuts,
      |  ROUND(CAST(SUM(CASE WHEN true_cut THEN sad ELSE 0 END) AS DOUBLE)
      |    / (SUM(CASE WHEN true_cut THEN 1 ELSE 0 END) * 16.0), 4)
      |    AS mean_cut_mad,
      |  ROUND(CAST(SUM(CASE WHEN NOT true_cut THEN sad ELSE 0 END) AS DOUBLE)
      |    / (SUM(CASE WHEN NOT true_cut THEN 1 ELSE 0 END) * 16.0), 4)
      |    AS mean_scene_mad
      |FROM pairs
      |GROUP BY scene_len
      |ORDER BY scene_len""".stripMargin
}
