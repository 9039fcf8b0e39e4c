package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-stream interval join: impressions joined to the clicks that
  * follow them within an attribution window — the canonical
  * two-unbounded-sides join. Both sides carry watermarks so the join
  * state is bounded: Spark keeps only rows inside the watermark +
  * interval bound, then drops them — the property that lets this run
  * forever at production rates.
  */
object StreamJoin {

  /** impressions(ad_id, imp_ts) ⋈ clicks(ad_id, click_ts) with
    * click within [imp_ts, imp_ts + windowMinutes]. */
  def attribution(impressions: DataFrame, clicks: DataFrame,
      windowMinutes: Int = 10): DataFrame = {
    val imp = impressions.withWatermark("imp_ts", "30 minutes")
    val clk = clicks.withWatermark("click_ts", "30 minutes")
    imp.join(clk,
      expr(s"""ad_id = c_ad_id AND
              |click_ts >= imp_ts AND
              |click_ts <= imp_ts + interval $windowMinutes minutes""".stripMargin))
  }

  /** Sort one side into 4 contiguous ts slices, one pinned-mtime file
    * per slice, so the stream drains it oldest-first. */
  private def stageSorted(df: DataFrame, tsCol: String, dir: String): Unit = {
    val tmp = s"$dir.tmp"
    df.repartitionByRange(4, col(tsCol)).sortWithinPartitions(col(tsCol))
      .write.parquet(tmp)
    val stage = new java.io.File(dir)
    stage.mkdirs()
    val parts = new java.io.File(tmp).listFiles()
      .filter(f => f.getName.startsWith("part-")
        && f.getName.endsWith(".parquet")).sortBy(_.getName)
    require(parts.length >= 2, s"expected >=2 staged slices in $dir")
    parts.zipWithIndex.foreach { case (p, i) =>
      val dst = new java.io.File(stage, f"b$i%02d.parquet")
      java.nio.file.Files.move(p.toPath, dst.toPath)
      require(dst.setLastModified(1400000000000L + i * 60000L),
        s"cannot pin mtime on $dst")
    }
  }

  /** q162: the stream-stream interval join as a DECLARED query —
    * views attributed to the same user's clicks within 60 minutes,
    * both sides REAL unbounded streams with watermark-bounded join
    * state, replayed over the events table and rolled up per ad so
    * DuckDB can certify the exact pair set the join emitted.
    *
    * Completeness argument (why the stream's answer equals the batch
    * join): both sides are staged ts-sorted, so (a) no input row is
    * ever late against the watermark, and (b) a view's join state is
    * evicted only once the CLICK-side maximum exceeds
    * `imp_ts + 90 min` (30-min watermark + 60-min interval bound) —
    * and every later click then has `click_ts > imp_ts + 60 min`, so
    * nothing evicted could still match. Inner joins emit on arrival,
    * so after draining, the emitted set IS the batch interval join,
    * arrival-order-insensitively. ≥ 2 micro-batches hard-asserted.
    *
    * Scale shape: join state is bounded by the watermark horizon on
    * both sides (the property that lets this run forever); each
    * trigger shuffles only that batch's rows on ad_id. */
  def streamedAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    val base = graft.Scratch.dir("stream_join", sfDir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val ev = Tables.events(spark, sfDir)
    stageSorted(ev.filter(col("event_type") === "view")
      .select(col("user_id").as("ad_id"), col("ts").as("imp_ts")),
      "imp_ts", s"$base/imps")
    stageSorted(ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_ad_id"), col("ts").as("click_ts")),
      "click_ts", s"$base/clicks")
    val imps = spark.readStream.schema("ad_id BIGINT, imp_ts TIMESTAMP")
      .option("maxFilesPerTrigger", 1).parquet(s"$base/imps")
    val clicks = spark.readStream.schema("c_ad_id BIGINT, click_ts TIMESTAMP")
      .option("maxFilesPerTrigger", 1).parquet(s"$base/clicks")
    val q = StreamTune.withStatePartitions(spark) {
      attribution(imps, clicks, windowMinutes = 60).writeStream
        .outputMode("append").format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .start()
    }
    try q.processAllAvailable() finally q.stop()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    require(batches >= 2,
      s"attribution stream must run multiple micro-batches, saw $batches")
    spark.read.parquet(s"$base/out")
      .groupBy(col("ad_id")).agg(
        count(lit(1)).as("n_attrib"),
        sum(unix_micros(col("click_ts")) - unix_micros(col("imp_ts")))
          .as("gap_us_sum"))
      .orderBy(col("ad_id"))
  }

  /** The batch interval join, per-ad rollup — certifies the streamed
    * pair set exactly (count AND summed gaps). */
  val streamedAttributionSql: String =
    """WITH v AS (
      |  SELECT user_id AS ad_id, ts AS imp_ts
      |  FROM events WHERE event_type = 'view'),
      |c AS (
      |  SELECT user_id, ts AS click_ts
      |  FROM events WHERE event_type = 'click'),
      |j AS (
      |  SELECT ad_id, imp_ts, click_ts
      |  FROM v JOIN c ON ad_id = user_id
      |    AND click_ts >= imp_ts
      |    AND click_ts <= imp_ts + INTERVAL 60 MINUTE)
      |SELECT ad_id, COUNT(*) AS n_attrib,
      |  CAST(SUM(epoch_us(click_ts) - epoch_us(imp_ts)) AS BIGINT)
      |    AS gap_us_sum
      |FROM j GROUP BY ad_id ORDER BY ad_id""".stripMargin
}
