package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** ORC source/sink — the OTHER production columnar format (the Hive
  * ecosystem's native one). An engine claiming "switch to me" parity
  * has to both WRITE it (downstream Hive/Trino consumers) and READ it
  * with the same scan discipline as parquet: predicate pushdown into
  * the stripe/row-group index and column pruning into the projection,
  * or a 100 TB ORC lake reads every byte it owns.
  *
  * q181 stages the events table as ORC, runs a filtered two-column
  * rollup off it, and HARD-ASSERTS the scan contract in the query
  * (the q153/q164 discipline): the type predicate surfaces in
  * `PushedFilters` and the `ReadSchema` carries exactly the three
  * referenced columns — write → read → prune → push, all on the real
  * ORC codepath (vectorized reader).
  */
object Orc {

  private def layoutBase(sfDir: String): String =
    graft.Scratch.dir("orc_layout", sfDir)

  /** q182-visible (spec) staging: events as ORC, fixed idempotent
    * path. */
  def stage(spark: SparkSession, sfDir: String): String = {
    val path = s"${layoutBase(sfDir)}/events_orc"
    Tables.events(spark, sfDir)
      .write.mode(SaveMode.Overwrite).orc(path)
    path
  }

  /** q181: purchase rollup per user decile off the ORC layout, scan
    * contract hard-asserted. */
  def orcRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val path = stage(spark, sfDir)
    val rolled = spark.read.orc(path)
      .filter(col("event_type") === "purchase")
      .groupBy((col("user_id") % 10).cast("long").as("user_decile"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value").cast("decimal(28,10)")).cast("double"), 2)
          .as("sum_value"))
      .orderBy(col("user_decile"))
    val plan = rolled.queryExecution.executedPlan.toString
    require(plan.contains("Format: ORC") || plan.contains("Format: orc"),
      s"not reading through the ORC source:\n$plan")
    require(plan.contains("PushedFilters: [IsNotNull(event_type), " +
      "EqualTo(event_type,purchase)]"),
      s"type predicate not pushed into the ORC scan:\n$plan")
    require("ReadSchema: struct<user_id:bigint,event_type:string,value:double>"
      .r.findFirstIn(plan).isDefined,
      s"ORC scan reads more than the three referenced columns:\n$plan")
    rolled
  }

  /** DuckDB oracle: same rollup from the parquet table — a format
    * hop never changes the answer. */
  val orcRollupSql: String =
    """SELECT CAST(user_id % 10 AS BIGINT) AS user_decile,
      |  COUNT(*) AS n_purchases,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 2)
      |    AS sum_value
      |FROM events
      |WHERE event_type = 'purchase'
      |GROUP BY user_decile
      |ORDER BY user_decile""".stripMargin
}
