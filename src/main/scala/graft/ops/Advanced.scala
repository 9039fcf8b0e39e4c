package graft.ops

import graft.Tables
import graft.plans.TopKPerKey
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Advanced relational shapes: top-k-per-group through the custom
  * physical operator, as-of (temporal) join, pivot.
  */
object Advanced {

  /** q43: top-3 orders per priority class via [[TopKPerKey]] — the
    * custom bounded-heap operator in a declared query. The score is
    * made collision-free (price + orderkey·1e-9) so heap retention
    * and the oracle's window tiebreak provably agree. */
  def topOrdersPerPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .withColumn("score",
        col("o_totalprice") + col("o_orderkey").cast("double") * 1e-9)
    TopKPerKey.perKey(o, Seq("o_orderpriority"), "score", 3)
      .select(col("o_orderpriority"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  val topOrdersPerPrioritySql: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice + o_orderkey * 1e-9 DESC) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  /** q44: as-of join — for each early event, the user's most recent
    * order at or before the event time (orders replayed as if
    * o_custkey were the user and o_orderdate shifted into the event
    * epoch). Spark lacks a native as-of join: the union + last_value
    * window is the standard formulation (sort once, carry the last
    * seen build-side row forward). The oracle uses DuckDB's NATIVE
    * ASOF JOIN — two independent formulations, one semantics. */
  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    // epoch-second timelines on both sides: tz-proof and totally
    // ordered; synthetic order times are globally unique (7s apart)
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_id") < 300)
      .select(col("user_id").as("k"), unix_timestamp(col("ts")).as("ts_s"),
        col("event_id"), col("event_type"))
    val ord = Tables.orders(spark, sfDir)
      .select(pmod(col("o_custkey"), lit(150)).as("k"),
        (lit(1704067200L) + col("o_orderkey") * 7L).as("ts_s"),
        col("o_orderkey"))
    val tagged = ev.select(col("k"), col("ts_s"), col("event_id"),
        col("event_type"), lit(null).cast("long").as("o_orderkey"),
        lit(1).as("side"))
      .unionByName(ord.select(col("k"), col("ts_s"),
        lit(null).cast("long").as("event_id"),
        lit(null).cast("string").as("event_type"),
        col("o_orderkey"), lit(0).as("side")))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("ts_s"), col("side"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("last_order",
        last(col("o_orderkey"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("k"), col("event_type"),
        col("last_order"))
      .orderBy(col("event_id"))
  }

  val asofJoinSql: String =
    """WITH ev AS (
      |  SELECT user_id AS k, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
      |    event_id, event_type
      |  FROM events WHERE event_id < 300),
      |ord AS (
      |  SELECT o_custkey % 150 AS k,
      |    1704067200 + o_orderkey * 7 AS ts_s, o_orderkey
      |  FROM orders)
      |SELECT e.event_id, e.k, e.event_type, o.o_orderkey AS last_order
      |FROM ev e
      |ASOF LEFT JOIN ord o ON e.k = o.k AND e.ts_s >= o.ts_s
      |ORDER BY e.event_id""".stripMargin

  /** q45: pivot — per-user event-type counts as columns (the
    * wide-table reshape every analytics surface needs). */
  def pivotEventCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .pivot("event_type",
        Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .filter(col("user_id") < 30)
      .orderBy(col("user_id"))

  val pivotEventCountsSql: String =
    """SELECT user_id,
      |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
      |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
      |  COUNT(*) FILTER (WHERE event_type = 'view') AS "view"
      |FROM events
      |GROUP BY user_id
      |HAVING user_id < 30
      |ORDER BY user_id""".stripMargin
}
