package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream analytics over the `events` table — the batch
  * equivalents of the streaming shapes a pipeline needs (and the
  * reference's crawl-stats surface, A5): multi-level rollups,
  * tumbling time windows, gap-based sessionization, JSON payload
  * decoding (P13 shape), and per-job crawl counters.
  */
object Events {

  private def dsum(c: org.apache.spark.sql.Column) =
    round(sum(c.cast("decimal(28,10)")).cast("double"), 2)

  /** ROLLUP (type × day) — grouping-sets aggregation; null group
    * keys folded to 'ALL' so cross-engine null ordering can't bite. */
  def rollupTypeDay(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("day", col("ts").cast("date"))
      .rollup(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(
        coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("day").cast("string"), lit("ALL")).as("day"),
        col("n"), col("total_value"))
      .orderBy(col("event_type"), col("day"))

  val rollupTypeDaySql: String =
    """SELECT COALESCE(event_type, 'ALL') AS event_type,
      |  COALESCE(CAST(day AS VARCHAR), 'ALL') AS day,
      |  COUNT(*) AS n,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 2) AS total_value
      |FROM (SELECT event_type, CAST(ts AS DATE) AS day, value FROM events)
      |GROUP BY ROLLUP (event_type, day)
      |ORDER BY event_type, day""".stripMargin

  /** CUBE (type × day-of-week) — the full grouping-sets lattice
    * (rollup's sibling, all four subsets): per-cell counts plus both
    * marginals and the grand total in one pass. */
  def cubeTypeDow(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("dow", dayofweek(col("ts")).cast("long"))
      .cube(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(
        coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("dow").cast("string"), lit("ALL")).as("dow"),
        col("n"), col("total_value"))
      .orderBy(col("event_type"), col("dow"))

  val cubeTypeDowSql: String =
    """SELECT COALESCE(event_type, 'ALL') AS event_type,
      |  COALESCE(CAST(dow AS VARCHAR), 'ALL') AS dow,
      |  COUNT(*) AS n,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 2) AS total_value
      |FROM (SELECT event_type, CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS BIGINT) AS dow, value
      |      FROM events)
      |GROUP BY CUBE (event_type, dow)
      |ORDER BY event_type, dow""".stripMargin

  /** Tumbling 1-day windows via the time-window operator (the batch
    * twin of the Structured Streaming windowed aggregation). */
  def tumblingDaily(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(unix_timestamp(col("w.start")).as("w_start"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy(col("w_start"), col("event_type"))

  val tumblingDailySql: String =
    """SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS w_start,
      |  event_type, COUNT(*) AS n,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 2) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY w_start, event_type""".stripMargin

  /** Gap-based sessionization (30-min inactivity): lag + running sum
    * of session-start markers per user — the batch formulation of
    * session windows. */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val e = Tables.events(spark, sfDir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800,
          1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
    e.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (unix_timestamp(max(col("ts")))
          - unix_timestamp(min(col("ts")))).as("dur_s"))
      .groupBy(col("user_id"))
      .agg(max(col("session_id")).as("n_sessions"),
        max(col("n_events")).as("max_session_events"),
        max(col("dur_s")).as("max_session_dur_s"))
      .filter(col("user_id") < 20)
      .orderBy(col("user_id"))
  }

  val sessionizeSql: String =
    """WITH marked AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, ts,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM marked),
      |per_session AS (
      |  SELECT user_id, session_id, COUNT(*) AS n_events,
      |    CAST(floor(epoch(MAX(ts))) AS BIGINT) - CAST(floor(epoch(MIN(ts))) AS BIGINT) AS dur_s
      |  FROM sessions GROUP BY user_id, session_id)
      |SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions,
      |  MAX(n_events) AS max_session_events,
      |  MAX(dur_s) AS max_session_dur_s
      |FROM per_session
      |WHERE user_id < 20
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Native session windows (the engine-managed twin of the
    * lag-based [[sessionize]]): Spark's `session_window` merges
    * events whose start falls strictly before the previous window's
    * end (= last event + gap, exact microsecond comparison); the
    * oracle replays the identical rule as an epoch_us island query.
    * One session row per (user, session), windows via the same
    * operator Structured Streaming uses (StreamingSessionSpec drives
    * it on a stream). */
  def sessionWindows(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("user_id") < 10)
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("user_id"),
        unix_timestamp(col("w.start")).as("s_start"),
        unix_timestamp(col("w.end")).as("s_end"),
        col("n_events"), col("total_value"))
      .orderBy(col("user_id"), col("s_start"))

  val sessionWindowsSql: String =
    """WITH e AS (
      |  SELECT user_id, ts, value, epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events WHERE user_id < 10),
      |marked AS (
      |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
      |                   OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0
      |            END AS new_session
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
      |sessions AS (
      |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY us
      |    ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked)
      |SELECT user_id,
      |  MIN(us) // 1000000 AS s_start,
      |  (MAX(us) + 1800000000) // 1000000 AS s_end,
      |  COUNT(*) AS n_events,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 2) AS total_value
      |FROM sessions
      |GROUP BY user_id, sid
      |ORDER BY user_id, s_start""".stripMargin

  /** JSON payload decode (P13 shape: per-record JSON parse → field
    * extraction → filter/aggregate). */
  def jsonDecode(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("k",
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
          .getField("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).cast("long").as("k_sum"),
        max(col("k")).cast("long").as("k_max"),
        count(when(col("k") > 50, 1)).as("k_over_50"))
      .orderBy(col("event_type"))

  val jsonDecodeSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(k) AS BIGINT) AS k_sum, CAST(MAX(k) AS BIGINT) AS k_max,
      |  COUNT(*) FILTER (WHERE k > 50) AS k_over_50
      |FROM (SELECT event_type,
      |        CAST(json_extract_string(props, '$.k') AS INT) AS k
      |      FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Crawl stats (A5): per-job counters the reference exposes on its
    * status API — items scraped, errors, duration — from the event
    * stream, jobs keyed by user_id here. */
  def crawlStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id").as("job_id"))
      .agg(
        count(when(col("event_type") === "view", 1)).as("pages_visited"),
        count(when(col("event_type") === "purchase", 1)).as("items_scraped"),
        count(when(col("event_type") === "error", 1)).as("errors_count"),
        (unix_timestamp(max(col("ts")))
          - unix_timestamp(min(col("ts")))).as("duration_s"))
      .filter(col("job_id") < 25)
      .orderBy(col("job_id"))

  val crawlStatsSql: String =
    """SELECT user_id AS job_id,
      |  COUNT(*) FILTER (WHERE event_type = 'view') AS pages_visited,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS items_scraped,
      |  COUNT(*) FILTER (WHERE event_type = 'error') AS errors_count,
      |  CAST(floor(epoch(MAX(ts))) AS BIGINT) - CAST(floor(epoch(MIN(ts))) AS BIGINT) AS duration_s
      |FROM events
      |GROUP BY user_id
      |HAVING user_id < 25
      |ORDER BY job_id""".stripMargin
}
