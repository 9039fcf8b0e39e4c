package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval peak-concurrency via the classic ±1 sweep-line — the
  * capacity-planning measurement the window family doesn't cover:
  * q47/q35 count events per fixed bucket, q64/q36 group them into
  * sessions, but "how many intervals are OPEN at once, at peak?"
  * (concurrent sessions, simultaneous fetches, GPU-slot demand) is a
  * property of interval OVERLAP, not membership. The naive answer is
  * an interval self-join (quadratic in the overlap degree); the sweep
  * is linear: explode each interval to a +1 boundary at its start and
  * a −1 at its end, order boundaries by time, and the running sum IS
  * the concurrency — its max per group is the peak.
  *
  * Tie convention (deterministic in both engines): boundaries order by
  * (t, delta), so at equal timestamps every −1 precedes every +1 —
  * intervals are half-open [s, e), and an interval ending exactly when
  * another starts never counts as concurrent with it. The default
  * window frame is RANGE (all peers aggregate together), so the
  * running sum never depends on an order WITHIN equal (t, delta) keys.
  *
  * Scale shape: there is no interval join and no all-pairs anything —
  * two boundary rows per interval, one range-partitioned sort per
  * (event_type, day) group, O(1) running state. The day segmentation
  * is the scale lever: each interval is CLIPPED at day boundaries
  * (durations here are < 60 min, so an interval touches ≤ 2 days and
  * the day list is a 2-element array_distinct, no sequence explode),
  * which makes every (type, day) partition's sweep self-contained —
  * the global time sort becomes thousands of independent bounded
  * sorts, exactly how a 100 TB event log is already laid out (q164's
  * day partitioning). A segment crossing midnight counts in BOTH days
  * (it is genuinely open in both), each day seeing its clipped
  * [max(s, day), min(e, day+1)) span.
  */
object Intervals {

  /** Synthetic interval derivation over events: each event opens an
    * interval at `ts` lasting 1 + event_id % 59 minutes — key-derived
    * and identically restated in the oracle. */
  private def intervals(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir).select(
      col("event_type"), col("ts").as("s"),
      (col("ts") + expr("make_interval(0, 0, 0, 0, 0, CAST(1 + event_id % 59 AS INT), 0)"))
        .as("e"))

  /** Per-(event_type, day) peak concurrency of an
    * (event_type, s, e) interval relation — the sweep core, exposed
    * for the spec's crafted-interval and brute-force replays. */
  private[graft] def dailyPeaks(intervals: DataFrame): DataFrame = {
    val iv = intervals
      // durations are minutes-scale by construction: the 2-element
      // day list below assumes an interval never spans 3 calendar days
      .withColumn("day", explode(array_distinct(
        array(to_date(col("s")), to_date(col("e"))))))
      .withColumn("seg_s", greatest(col("s"), col("day").cast("timestamp")))
      .withColumn("seg_e", least(col("e"),
        date_add(col("day"), 1).cast("timestamp")))
      // an interval ending EXACTLY at midnight is half-open [s, e):
      // not open in the next day — drop the zero-length segment the
      // 2-day list fabricates for it (phantom day rows otherwise)
      .filter(col("seg_s") < col("seg_e"))
    val boundaries = iv.select(
      col("event_type"), col("day"),
      explode(array(
        struct(col("seg_s").as("t"), lit(1).as("delta")),
        struct(col("seg_e").as("t"), lit(-1).as("delta")))).as("b"))
      .select(col("event_type"), col("day"),
        col("b.t").as("t"), col("b.delta").as("delta"))
    // default RANGE frame: all peers at equal (t, delta) sum together
    val sweep = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("t"), col("delta"))
    boundaries
      .withColumn("conc", sum(col("delta")).over(sweep))
      .groupBy(col("event_type"), col("day"))
      .agg(max(col("conc")).as("peak"))
  }

  /** q206: per-event-type peak concurrency — the maximum number of
    * simultaneously open intervals, the day it peaks (earliest on
    * ties), days observed, and the mean daily peak. */
  def peakConcurrency(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = dailyPeaks(intervals(spark, sfDir))
    val perType = Window.partitionBy(col("event_type"))
    daily
      .withColumn("pmax", max(col("peak")).over(perType))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        max(col("peak")).as("peak_max"),
        min(when(col("peak") === col("pmax"), col("day"))).as("peak_day"),
        round(sum(col("peak").cast("decimal(28,0)")).cast("double")
          / count(lit(1)), 6).as("avg_peak"))
      .orderBy(col("event_type"))
  }

  val peakConcurrencySql: String =
    """WITH iv AS (
      |  SELECT event_type, ts AS s,
      |    ts + INTERVAL (1 + event_id % 59) MINUTE AS e
      |  FROM events),
      |segs AS (
      |  SELECT event_type, day, seg_s, seg_e FROM (
      |    SELECT event_type, day,
      |      GREATEST(s, CAST(day AS TIMESTAMP)) AS seg_s,
      |      LEAST(e, CAST(day + 1 AS TIMESTAMP)) AS seg_e
      |    FROM iv, UNNEST(list_distinct([CAST(s AS DATE), CAST(e AS DATE)])) AS u(day))
      |  WHERE seg_s < seg_e),
      |boundaries AS (
      |  SELECT event_type, day, seg_s AS t, 1 AS delta FROM segs
      |  UNION ALL
      |  SELECT event_type, day, seg_e AS t, -1 AS delta FROM segs),
      |sweep AS (
      |  SELECT event_type, day,
      |    SUM(delta) OVER (PARTITION BY event_type, day
      |      ORDER BY t, delta) AS conc
      |  FROM boundaries),
      |daily AS (
      |  SELECT event_type, day, CAST(MAX(conc) AS BIGINT) AS peak
      |  FROM sweep GROUP BY event_type, day),
      |flagged AS (
      |  SELECT event_type, day, peak,
      |    MAX(peak) OVER (PARTITION BY event_type) AS pmax
      |  FROM daily)
      |SELECT event_type, COUNT(*) AS n_days,
      |  CAST(MAX(peak) AS BIGINT) AS peak_max,
      |  MIN(CASE WHEN peak = pmax THEN day END) AS peak_day,
      |  ROUND(CAST(SUM(CAST(peak AS DECIMAL(28,0))) AS DOUBLE) / COUNT(*), 6) AS avg_peak
      |FROM flagged GROUP BY event_type ORDER BY event_type""".stripMargin
}
