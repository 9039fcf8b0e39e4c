package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Customer/behavior segmentation analytics: RFM decile grids, robust
  * (MAD) outlier detection, and sequential path mining — the
  * workloads a marketing/product warehouse layers on the same event
  * and order history the engine already serves.
  */
object Segment {

  /** q131: RFM segmentation — per customer recency (days since last
    * order, vs the corpus max date), frequency (order count), and
    * monetary (total spend); customers land in NTILE(10) deciles per
    * dimension (order pinned by (metric, custkey) so both engines
    * tile identically), reported as the (r_decile, f_decile) grid
    * with counts and average spend.
    *
    * Shape: one partial-agg groupBy per customer, a broadcast 1-row
    * anchor, two global NTILE windows (the one intrinsically global
    * step of decile ranking — at 100 TB you'd swap exact ntile for
    * q101-style two-pass quantile boundaries, same output), then a
    * ≤100-row grid aggregate. */
  def rfmSegments(spark: SparkSession, sfDir: String): DataFrame = {
    val anchor = Tables.orders(spark, sfDir)
      .agg(max(to_date(col("o_orderdate"))).as("maxd"))
    val rfm = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("lastd"),
        count(lit(1)).as("frequency"),
        round(sum(col("o_totalprice").cast("decimal(28,6)")).cast("double"), 4)
          .as("monetary"))
      .crossJoin(broadcast(anchor))
      .select(col("o_custkey"),
        datediff(col("maxd"), col("lastd")).as("recency"),
        col("frequency"), col("monetary"))
    val withDeciles = rfm
      .withColumn("r_decile", ntile(10).over(
        Window.orderBy(col("recency"), col("o_custkey"))))
      .withColumn("f_decile", ntile(10).over(
        Window.orderBy(col("frequency").desc, col("o_custkey"))))
    withDeciles.groupBy(col("r_decile"), col("f_decile"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("monetary").cast("decimal(28,6)")).cast("double")
          / count(lit(1)), 4).as("avg_monetary"))
      .orderBy(col("r_decile"), col("f_decile"))
  }

  val rfmSegmentsSql: String =
    """WITH anchor AS (
      |  SELECT MAX(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
      |rfm AS (
      |  SELECT o_custkey,
      |    date_diff('day', MAX(CAST(o_orderdate AS DATE)),
      |      (SELECT maxd FROM anchor)) AS recency,
      |    COUNT(*) AS frequency,
      |    ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 4)
      |      AS monetary
      |  FROM orders GROUP BY o_custkey),
      |tiled AS (
      |  SELECT *,
      |    NTILE(10) OVER (ORDER BY recency, o_custkey) AS r_decile,
      |    NTILE(10) OVER (ORDER BY frequency DESC, o_custkey) AS f_decile
      |  FROM rfm)
      |SELECT r_decile, f_decile, COUNT(*) AS n_customers,
      |  ROUND(CAST(SUM(CAST(monetary AS DECIMAL(28,6))) AS DOUBLE)
      |    / COUNT(*), 4) AS avg_monetary
      |FROM tiled GROUP BY r_decile, f_decile
      |ORDER BY r_decile, f_decile""".stripMargin

  /** MAD outlier multiplier (the standard 3×MAD ≈ 2σ-equivalent rule,
    * scale factor folded in). */
  val MadK = 3.0

  /** q132: robust outlier detection — per event_type, median and MAD
    * (median absolute deviation) of `value`, flagging rows beyond
    * [[MadK]]·MAD of the median. MAD tolerates the heavy tails that
    * make mean/stddev rules useless on revenue-like columns (one whale
    * inflates σ until nothing is an outlier).
    *
    * Shape: two grouped exact-percentile aggregates (value, then
    * |value − median| after a broadcast-join of the ≤types-row median
    * table) and one counting pass — three scans of one column,
    * partial-agg all the way; at 100 TB each percentile would run the
    * q101 two-pass selection, same contract. */
  def madOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"))
    val med = e.groupBy(col("event_type"))
      .agg(round(expr("percentile(value, 0.5)"), 6).as("med"))
    val withDev = e.join(broadcast(med), Seq("event_type"))
      .withColumn("adev", round(abs(col("value") - col("med")), 6))
    val mad = withDev.groupBy(col("event_type"))
      .agg(round(expr("percentile(adev, 0.5)"), 6).as("mad"))
    withDev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"), col("med"), col("mad"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("adev") > lit(MadK) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("event_type"), col("med"), col("mad"), col("n"),
        col("n_outliers"),
        round(col("n_outliers").cast("double") / col("n"), 6)
          .as("outlier_rate"))
      .orderBy(col("event_type"))
  }

  val madOutliersSql: String =
    s"""WITH med AS (
      |  SELECT event_type, ROUND(quantile_cont(value, 0.5), 6) AS med
      |  FROM events GROUP BY event_type),
      |dev AS (
      |  SELECT e.event_type, med, ROUND(ABS(value - med), 6) AS adev
      |  FROM events e JOIN med ON e.event_type = med.event_type),
      |mad AS (
      |  SELECT event_type, ROUND(quantile_cont(adev, 0.5), 6) AS mad
      |  FROM dev GROUP BY event_type)
      |SELECT dev.event_type, dev.med, mad.mad, COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN adev > $MadK * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  ROUND(CAST(SUM(CASE WHEN adev > $MadK * mad THEN 1 ELSE 0 END)
      |    AS DOUBLE) / COUNT(*), 6) AS outlier_rate
      |FROM dev JOIN mad ON dev.event_type = mad.event_type
      |GROUP BY dev.event_type, dev.med, mad.mad
      |ORDER BY dev.event_type""".stripMargin

  /** q134: sequential path mining — the top-10 3-step event-type
    * paths users actually walk (each user's event stream ordered by
    * time, consecutive triples counted across all users). The Markov
    * path-analysis behind "where do users go after X" product
    * questions; the reference's dashboard counts are the 1-step
    * degenerate case.
    *
    * Shape: one window pass (two LEADs over one (user, time) sort —
    * same partitioning, one shuffle), then a partial-agg count and a
    * top-10 TakeOrderedAndProject. Path cardinality is bounded by
    * |event_types|³, never by user count. */
  def eventPaths(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("e2").as("step2"),
        col("e3").as("step3"))
      .agg(count(lit(1)).as("n_walks"))
      .orderBy(col("n_walks").desc, col("step1"), col("step2"), col("step3"))
      .limit(10)
  }

  val eventPathsSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type AS step1,
      |    LEAD(event_type, 1) OVER
      |      (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS step2,
      |    LEAD(event_type, 2) OVER
      |      (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS step3
      |  FROM events)
      |SELECT step1, step2, step3, COUNT(*) AS n_walks
      |FROM seq WHERE step2 IS NOT NULL AND step3 IS NOT NULL
      |GROUP BY step1, step2, step3
      |ORDER BY n_walks DESC, step1, step2, step3 LIMIT 10""".stripMargin
}
