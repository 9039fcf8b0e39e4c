package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interval (range) join, binned: events × time windows where
  * `start ≤ ts < end`. A naive theta-join is a cartesian product;
  * the scalable formulation buckets time into fixed bins, explodes
  * each interval to the bins it overlaps, equi-joins on the bin, and
  * re-checks the exact predicate — shuffle is hash(bin), candidates
  * are bounded by bin width × interval density. Same result set as
  * the theta-join (which is exactly what the oracle runs).
  */
object RangeJoin {

  private val BinSeconds = 21600L // 6-hour bins

  /** q54: per-campaign event counts. Campaigns: 40 deterministic
    * half-open windows (1-3 days each) over the event epoch. */
  def campaignWindows(spark: SparkSession, sfDir: String): DataFrame =
    spark.range(40).select(
      col("id").as("campaign_id"),
      (lit(1704067200L) + col("id") * 10800L).as("start_s"),
      (lit(1704067200L) + col("id") * 10800L
        + lit(86400L) + pmod(col("id"), lit(3)) * 86400L).as("end_s"))

  def eventsInCampaigns(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ts_s"))
      .withColumn("bin", (col("ts_s") / BinSeconds).cast("long"))
    val campaigns = campaignWindows(spark, sfDir)
      .withColumn("bin", explode(sequence(
        (col("start_s") / BinSeconds).cast("long"),
        // end is exclusive: last bin is the one holding end_s - 1
        ((col("end_s") - 1) / BinSeconds).cast("long"))))
    ev.join(campaigns, Seq("bin"))
      .filter(col("ts_s") >= col("start_s") && col("ts_s") < col("end_s"))
      .groupBy(col("campaign_id"))
      .agg(count(lit(1)).as("n_events"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"))
      .orderBy(col("campaign_id"))
  }

  /** Oracle: the plain BETWEEN theta-join — proving the binned plan
    * is a pure physical rewrite. */
  val eventsInCampaignsSql: String =
    """WITH campaigns AS (
      |  SELECT i AS campaign_id,
      |    1704067200 + i * 10800 AS start_s,
      |    1704067200 + i * 10800 + 86400 + (i % 3) * 86400 AS end_s
      |  FROM generate_series(0, 39) AS t(i)),
      |ev AS (
      |  SELECT event_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      |  FROM events)
      |SELECT c.campaign_id, COUNT(*) AS n_events,
      |  COUNT(*) FILTER (WHERE e.event_type = 'purchase') AS n_purchases
      |FROM ev e JOIN campaigns c
      |  ON e.ts_s >= c.start_s AND e.ts_s < c.end_s
      |GROUP BY c.campaign_id
      |ORDER BY c.campaign_id""".stripMargin
}
