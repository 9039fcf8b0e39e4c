package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-contract validation — the expectation-suite
  * operator (Great Expectations / dbt-test shape) a production feed
  * runs BEFORE anything downstream trusts the drop: each table's
  * rules evaluate in ONE pass, referential rules as broadcast-pruned
  * anti-join counts, and the report is one row per rule with its
  * violation count — the artifact a data SLA points at.
  *
  * Rule classes covered (one of each, the canonical set):
  *   not_null    — required column present
  *   unique_key  — declared primary key actually unique
  *   accepted    — enum column within its declared domain
  *   range       — numeric/measure bounds
  *   ref         — foreign key resolves (orphan count)
  *
  * Scale shape: the per-table rule families compile to conditional
  * aggregates inside a SINGLE partial-agg'd scan per table (adding a
  * rule never adds a pass — the q140/q170 sweep discipline);
  * `unique_key` rides the same scan's COUNT vs COUNT(DISTINCT key);
  * the two referential rules are anti-join counts keyed on the
  * foreign key (at 100 TB these become shuffle joins on the key the
  * fact table is already bucketed by — q153's layout serves exactly
  * this check). The final report is a union of rule-count rows —
  * bytes, not data.
  */
object Contract {

  /** q186: run the declared expectation suite over the star schema
    * and publish per-rule violation counts. */
  def validate(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)

    // orders: one scan, four rules
    val ordersRules = orders.agg(
      count(lit(1)).as("n"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("v_notnull"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_unique"),
      sum(when(col("o_orderstatus").isin("O", "F", "P"), 0L).otherwise(1L))
        .as("v_accepted"),
      sum(when(col("o_totalprice") > 0.0, 0L).otherwise(1L)).as("v_range"))
      .select(expr(
        """stack(4,
          |  'orders.o_custkey_not_null', n, v_notnull,
          |  'orders.o_orderkey_unique', n, v_unique,
          |  'orders.o_orderstatus_accepted', n, v_accepted,
          |  'orders.o_totalprice_positive', n, v_range)
          |  AS (rule, n_checked, n_violations)""".stripMargin))

    // lineitem: one scan, three rules
    val lineitemRules = lineitem.agg(
      count(lit(1)).as("n"),
      sum(when(col("l_quantity").between(1.0, 50.0), 0L).otherwise(1L))
        .as("v_qty"),
      sum(when(col("l_discount").between(0.0, 0.1), 0L).otherwise(1L))
        .as("v_disc"),
      sum(when(col("l_extendedprice") > 0.0, 0L).otherwise(1L)).as("v_price"))
      .select(expr(
        """stack(3,
          |  'lineitem.l_quantity_in_1_50', n, v_qty,
          |  'lineitem.l_discount_in_0_0.1', n, v_disc,
          |  'lineitem.l_extendedprice_positive', n, v_price)
          |  AS (rule, n_checked, n_violations)""".stripMargin))

    // referential: orphan counts via anti-joins
    val orphanOrders = orders.select(col("o_custkey"))
      .join(broadcast(customer.select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
    val nOrders = orders.agg(count(lit(1)).as("n"))
    val refOrders = nOrders.crossJoin(orphanOrders)
      .select(lit("orders.o_custkey_ref_customer").as("rule"),
        col("n").as("n_checked"), col("v").as("n_violations"))

    val orphanLines = lineitem.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
    val nLines = lineitem.agg(count(lit(1)).as("n"))
    val refLines = nLines.crossJoin(orphanLines)
      .select(lit("lineitem.l_orderkey_ref_orders").as("rule"),
        col("n").as("n_checked"), col("v").as("n_violations"))

    ordersRules.unionByName(lineitemRules)
      .unionByName(refOrders).unionByName(refLines)
      .withColumn("passed", col("n_violations") === 0L)
      .orderBy(col("rule"))
  }

  /** DuckDB oracle: each rule restated as plain SQL counts. */
  val validateSql: String =
    """WITH o AS (
      |  SELECT COUNT(*) AS n,
      |    SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v_notnull,
      |    COUNT(*) - COUNT(DISTINCT o_orderkey) AS v_unique,
      |    SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END)
      |      AS v_accepted,
      |    SUM(CASE WHEN o_totalprice > 0.0 THEN 0 ELSE 1 END) AS v_range
      |  FROM orders),
      |l AS (
      |  SELECT COUNT(*) AS n,
      |    SUM(CASE WHEN l_quantity BETWEEN 1.0 AND 50.0 THEN 0 ELSE 1 END)
      |      AS v_qty,
      |    SUM(CASE WHEN l_discount BETWEEN 0.0 AND 0.1 THEN 0 ELSE 1 END)
      |      AS v_disc,
      |    SUM(CASE WHEN l_extendedprice > 0.0 THEN 0 ELSE 1 END) AS v_price
      |  FROM lineitem),
      |ref_o AS (
      |  SELECT (SELECT COUNT(*) FROM orders) AS n,
      |    (SELECT COUNT(*) FROM orders
      |     WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS v),
      |ref_l AS (
      |  SELECT (SELECT COUNT(*) FROM lineitem) AS n,
      |    (SELECT COUNT(*) FROM lineitem
      |     WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS v),
      |rules AS (
      |  SELECT 'orders.o_custkey_not_null' AS rule, n AS n_checked,
      |    v_notnull AS n_violations FROM o
      |  UNION ALL SELECT 'orders.o_orderkey_unique', n, v_unique FROM o
      |  UNION ALL SELECT 'orders.o_orderstatus_accepted', n, v_accepted FROM o
      |  UNION ALL SELECT 'orders.o_totalprice_positive', n, v_range FROM o
      |  UNION ALL SELECT 'lineitem.l_quantity_in_1_50', n, v_qty FROM l
      |  UNION ALL SELECT 'lineitem.l_discount_in_0_0.1', n, v_disc FROM l
      |  UNION ALL SELECT 'lineitem.l_extendedprice_positive', n, v_price FROM l
      |  UNION ALL SELECT 'orders.o_custkey_ref_customer', n, v FROM ref_o
      |  UNION ALL SELECT 'lineitem.l_orderkey_ref_orders', n, v FROM ref_l)
      |SELECT rule, CAST(n_checked AS BIGINT) AS n_checked,
      |  CAST(n_violations AS BIGINT) AS n_violations,
      |  n_violations = 0 AS passed
      |FROM rules ORDER BY rule""".stripMargin
}
