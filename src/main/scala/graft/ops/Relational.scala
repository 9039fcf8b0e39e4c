package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operator family over the shared testdata —
  * aggregation, join (broadcast + shuffle, semi/anti), top-k,
  * window pagination, set ops, conditional aggregation.
  *
  * The reference delegates all of this to Postgres (SURVEY §2.D-2.H);
  * here each shape is declared with the DataFrame API so Catalyst
  * plans it (predicate pushdown, partial aggregation,
  * TakeOrderedAndProject, broadcast-hash joins).
  *
  * Numeric determinism contract with the DuckDB oracle: double
  * aggregates go through an exact per-row DECIMAL cast, are summed
  * exactly, and only then return to DOUBLE — so Spark's
  * partition-order-dependent double addition can never flip a value.
  */
object Relational {

  /** sum(double) made order-independent: exact decimal accumulate,
    * then round(2) on the way back to double — DuckDB's decimal→double
    * cast can be 1 ulp off Spark's correctly-rounded one, and the
    * round re-synchronizes both engines to the identical double. */
  private def dsum(c: org.apache.spark.sql.Column) =
    round(sum(c.cast("decimal(28,10)")).cast("double"), 2)

  /** Pricing summary (shape of TPC-H Q1): scan + filter + 8-way agg.
    * Partial aggregation (map-side combine) keeps the shuffle tiny:
    * 32 partitions × 4 groups. */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .withColumn("avg_price", col("sum_base_price") / col("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE), 2) AS sum_qty,
      |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE), 2) AS sum_base_price,
      |  ROUND(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DOUBLE), 2) AS sum_disc_price,
      |  ROUND(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,10))) AS DOUBLE), 2) AS sum_charge,
      |  COUNT(*) AS count_order,
      |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE), 2) / COUNT(*) AS avg_qty,
      |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE), 2) / COUNT(*) AS avg_price
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Revenue by nation (shape of TPC-H Q5 inner): two shuffle joins on
    * the big tables + two BROADCAST joins on the dims. customer and
    * nation are small at every SF → explicit broadcast() so the plan
    * survives a 100× scale-up of orders/lineitem without reshuffling
    * the dims. */
  def revenueByNation(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  val revenueByNationSql: String =
    """SELECT n_name,
      |  ROUND(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DOUBLE), 2) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Top-k orders by revenue (O1 shape): agg + orderBy + limit →
    * Spark plans TakeOrderedAndProject (no global sort). */
  def topOrdersByRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.groupBy(col("l_orderkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val topOrdersByRevenueSql: String =
    """SELECT l_orderkey,
      |  ROUND(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DOUBLE), 2) AS revenue
      |FROM lineitem
      |GROUP BY l_orderkey
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Deterministic LIMIT/OFFSET pagination (O2 shape — reference
    * `search.py:68-72`): total order includes the unique key as
    * tiebreak, offset 40 / limit 20. Planned as TakeOrderedAndProject
    * with offset — per-partition (offset+limit)-row heaps, then one
    * driver-side merge of k·P rows. No global-window single-partition
    * funnel, so the plan survives a 100× scale-up (the previous
    * row_number-over-everything formulation did not). */
  def paginateOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    o.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").as("o_date"), col("o_totalprice"))
      .orderBy(col("o_date").desc, col("o_orderkey"))
      .offset(40).limit(20)
  }

  val paginateOrdersSql: String =
    """SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_date,
      |       o_totalprice
      |FROM orders
      |ORDER BY o_date DESC, o_orderkey
      |LIMIT 20 OFFSET 40""".stripMargin

  /** Semi/anti join (J3 / dedup shape): per-segment counts of
    * customers with and without orders, one pass each side. */
  def customerOrderCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("with_orders"))
    val without = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("without_orders"))
    withO.join(without, Seq("c_mktsegment"), "full_outer")
      .select(col("c_mktsegment"),
        coalesce(col("with_orders"), lit(0L)).as("with_orders"),
        coalesce(col("without_orders"), lit(0L)).as("without_orders"))
      .orderBy(col("c_mktsegment"))
  }

  val customerOrderCoverageSql: String =
    """SELECT c_mktsegment,
      |  COUNT(*) FILTER (WHERE has_o) AS with_orders,
      |  COUNT(*) FILTER (WHERE NOT has_o) AS without_orders
      |FROM (
      |  SELECT c_mktsegment,
      |         EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_o
      |  FROM customer)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Set ops (§2.G): (user, day) pairs with a purchase but no error
    * that day — EXCEPT over a derived composite key. */
  def eventSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    def days(t: String) = e.filter(col("event_type") === t)
      .select(col("user_id"), col("ts").cast("date").as("d")).distinct()
    days("purchase").except(days("error"))
      .orderBy(col("user_id"), col("d"))
  }

  val eventSetOpsSql: String =
    """SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events WHERE event_type = 'purchase'
      |EXCEPT
      |SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events WHERE event_type = 'error'
      |ORDER BY user_id, d""".stripMargin

  /** Conditional aggregation in one pass (A3 shape — the reference's
    * dashboard runs 4 separate queries; ours is a single scan). */
  def eventTypeStats(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    e.agg(
      count(lit(1)).as("total_events"),
      countDistinct(col("user_id")).as("distinct_users"),
      count(when(col("event_type") === "purchase", 1)).as("purchases"),
      count(when(col("event_type") === "error", 1)).as("errors"),
      dsum(when(col("event_type") === "purchase", col("value"))
        .otherwise(lit(0.0))).as("purchase_value"))
  }

  val eventTypeStatsSql: String =
    """SELECT COUNT(*) AS total_events,
      |  COUNT(DISTINCT user_id) AS distinct_users,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchases,
      |  COUNT(*) FILTER (WHERE event_type = 'error') AS errors,
      |  ROUND(CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(28,10))) AS DOUBLE), 2) AS purchase_value
      |FROM events""".stripMargin
}
