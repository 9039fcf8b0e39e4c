package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Video-column plumbing: frame-stride sampling over an opaque
  * `binary` video payload — the preprocessing step every multimodal
  * training pipeline runs before a vision encoder sees anything
  * (decode is per-frame; you never featurize all 30 fps, you sample).
  *
  * The payload is synthesized — one video per part row, 16-byte md5
  * "frames" concatenated behind a frame count (this container ships
  * no video codec, same honest-stub contract as q33) — but every
  * Spark-side mechanism is
  * the real one: the video is ONE binary cell, frames come out with
  * byte-offset `substr` slicing on the binary column, the sampled
  * frame set explodes from a stride sequence (never one row per raw
  * frame), and per-frame "decode" runs as a typed mapPartitions
  * batch — the exact shape a JNI/FFmpeg decode would drop into.
  *
  * Scale: one row per SAMPLED frame is the only fan-out (stride 4 →
  * 4× fewer rows than frames); features reduce per duration bucket
  * with decimal-accumulated means (partial aggs). Nothing touches the
  * driver.
  */
object Video {

  /** Sampling stride: keep every 4th frame. */
  val Stride = 4

  case class FrameRow(video_id: Long, bucket: String, n_frames: Int,
    frame_idx: Int, frame: Array[Byte])
  case class FrameFeatures(video_id: Long, bucket: String, n_frames: Int,
    mean_byte: Double, h0: Int, h1: Int, h2: Int, h3: Int)

  /** Synthetic video table: 8-32 frames of 16 bytes each per part. */
  def videoTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir).select(
      col("p_partkey").as("video_id"),
      (lit(8) + pmod(col("p_partkey"), lit(25))).cast("int").as("n_frames"))
      .withColumn("content",
        unhex(concat_ws("", transform(
          sequence(lit(0), col("n_frames") - lit(1)),
          f => md5(concat(col("video_id").cast("string"), lit(":"),
            f.cast("string")))))))

  /** Per-frame decode stub over real frame bytes (q33 contract). */
  private def decodeFrames(rows: Iterator[FrameRow]): Iterator[FrameFeatures] =
    rows.map { r =>
      val bytes = r.frame.map(_ & 0xff)
      val hist = new Array[Int](4)
      bytes.foreach(b => hist(b >> 6) += 1)
      FrameFeatures(r.video_id, r.bucket, r.n_frames,
        math.round(bytes.sum.toDouble / bytes.length * 10000.0) / 10000.0,
        hist(0), hist(1), hist(2), hist(3))
    }

  /** q97: stride-sample frames out of the binary video column,
    * feature each sampled frame, roll up by duration bucket. */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sampled = videoTable(spark, sfDir)
      .withColumn("bucket",
        when(col("n_frames") < 16, lit("short"))
          .when(col("n_frames") < 24, lit("medium"))
          .otherwise(lit("long")))
      .select(col("video_id"), col("bucket"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - lit(1), lit(Stride)))
          .as("frame_idx"),
        col("content"))
      .withColumn("frame",
        col("content").substr(col("frame_idx") * lit(16) + lit(1), lit(16)))
      .select(col("video_id"), col("bucket"), col("n_frames"),
        col("frame_idx"), col("frame"))
    val feats: Dataset[FrameFeatures] =
      sampled.as[FrameRow].mapPartitions(decodeFrames)
    feats.toDF().groupBy(col("bucket")).agg(
      countDistinct(col("video_id")).as("n_videos"),
      count(lit(1)).as("n_sampled"),
      round(sum(col("mean_byte").cast("decimal(18,4)")).cast("double")
        / count(lit(1)), 4).as("avg_mean_byte"),
      sum(col("h0")).as("h0"), sum(col("h1")).as("h1"),
      sum(col("h2")).as("h2"), sum(col("h3")).as("h3"))
      .orderBy(col("bucket"))
  }

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
