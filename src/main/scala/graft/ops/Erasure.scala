package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten erasure with referential cascade — the
  * compliance operator (GDPR Art. 17) every data platform eventually
  * ships: given a deletion list of subjects, remove their rows from
  * every table they touch, CASCADE through foreign keys so no orphan
  * survives, and publish the audit trail a DPO can sign (per-table
  * before/deleted/after counts and a proved zero-orphan invariant).
  *
  * Cascade here: subjects = customers with custkey ≡ 0 (mod 97);
  * `customer` rows erase directly, `orders` erase by subject key,
  * `lineitem` erases by CASCADE (its order vanished — lineitem has
  * no customer column, which is the point: erasure must follow the
  * key graph, not grep for the subject id). `events` erases by
  * user_id, exercising a second independent fact table.
  *
  * Scale shape: erasure is anti-joins on the tables' own join keys
  * (the q153 bucketing co-locates exactly these); the audit is one
  * conditional-agg pass per table plus the anti-join counts; the
  * orphan check is an anti-join count hard-published as a column
  * (a non-zero value is a WRONG ANSWER, not a warning). Deletion
  * lists at production scale ride a broadcast (thousands of
  * subjects, not billions).
  */
object Erasure {

  val SubjectEvery = 97

  /** q199: execute the erasure and publish the audit. */
  def erasureAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val customer = Tables.customer(spark, sfDir)
    val orders = Tables.orders(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)
    val events = Tables.events(spark, sfDir)
    val isSubjectCust = pmod(col("c_custkey"), lit(SubjectEvery)) === 0
    val isSubjectOrd = pmod(col("o_custkey"), lit(SubjectEvery)) === 0

    val custAudit = customer.agg(count(lit(1)).as("n_before"),
      sum(when(isSubjectCust, 1L).otherwise(0L)).as("n_deleted"))
      .select(lit("customer").as("table"), col("n_before"), col("n_deleted"))
    val ordAudit = orders.agg(count(lit(1)).as("n_before"),
      sum(when(isSubjectOrd, 1L).otherwise(0L)).as("n_deleted"))
      .select(lit("orders").as("table"), col("n_before"), col("n_deleted"))
    val evAudit = events.agg(count(lit(1)).as("n_before"),
      sum(when(pmod(col("user_id"), lit(SubjectEvery)) === 0, 1L)
        .otherwise(0L)).as("n_deleted"))
      .select(lit("events").as("table"), col("n_before"), col("n_deleted"))

    // lineitem cascades: erased iff its order was erased
    val keptOrders = orders.filter(!isSubjectOrd)
      .select(col("o_orderkey"))
    val liBefore = lineitem.agg(count(lit(1)).as("n_before"))
    val liAfterRel = lineitem.join(keptOrders,
      col("l_orderkey") === col("o_orderkey"), "left_semi")
    val liAfter = liAfterRel.agg(count(lit(1)).as("n_after"))
    val liAudit = liBefore.crossJoin(liAfter)
      .select(lit("lineitem").as("table"), col("n_before"),
        (col("n_before") - col("n_after")).as("n_deleted"))

    // the invariant: post-erasure, no published lineitem may reference
    // an ERASED order (a cascade bug is a wrong answer here). The
    // erased-key set is derived INDEPENDENTLY of the kept-side filter
    // (positive predicate vs its negation), so the check is not
    // tautological against the semi-join that built liAfterRel — a
    // predicate drift between the two sides (null custkey handling, a
    // mod rewrite touching one branch) lands here as a non-zero
    // orphan count instead of vanishing by construction (ADVICE r9).
    val erasedOrders = orders.filter(isSubjectOrd)
      .select(col("o_orderkey"))
    val orphans = liAfterRel.select(col("l_orderkey"))
      .join(erasedOrders, col("l_orderkey") === col("o_orderkey"),
        "left_semi")
      .agg(count(lit(1)).as("o"))

    custAudit.unionByName(ordAudit).unionByName(evAudit)
      .unionByName(liAudit)
      .crossJoin(broadcast(orphans))
      .select(col("table"), col("n_before"), col("n_deleted"),
        (col("n_before") - col("n_deleted")).as("n_after"),
        col("o").as("orphans_after"))
      .orderBy(col("table"))
  }

  /** DuckDB oracle: the same erasure restated as plain counts. */
  val erasureAuditSql: String =
    s"""WITH li AS (
      |  SELECT COUNT(*) AS n_before,
      |    SUM(CASE WHEN o_custkey % $SubjectEvery = 0 THEN 1 ELSE 0 END)
      |      AS n_deleted
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |rows_ AS (
      |  SELECT 'customer' AS "table", COUNT(*) AS n_before,
      |    SUM(CASE WHEN c_custkey % $SubjectEvery = 0 THEN 1 ELSE 0 END)
      |      AS n_deleted
      |  FROM customer
      |  UNION ALL
      |  SELECT 'orders', COUNT(*),
      |    SUM(CASE WHEN o_custkey % $SubjectEvery = 0 THEN 1 ELSE 0 END)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'events', COUNT(*),
      |    SUM(CASE WHEN user_id % $SubjectEvery = 0 THEN 1 ELSE 0 END)
      |  FROM events
      |  UNION ALL
      |  SELECT 'lineitem', n_before, n_deleted FROM li)
      |SELECT "table", n_before, CAST(n_deleted AS BIGINT) AS n_deleted,
      |  CAST(n_before - n_deleted AS BIGINT) AS n_after,
      |  CAST(0 AS BIGINT) AS orphans_after
      |FROM rows_ ORDER BY "table"""".stripMargin
}
