package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Feature-flag config table (§1.1 `feature_flags`: reference
  * migration `4d700d415774`, read through a process-local cache
  * `feature_flags.py:12-30`). Spark shape: a tiny table loaded once
  * and collected to a broadcast-able Map — flag reads are then free
  * at plan-construction time, the same role the reference's
  * lru_cache plays.
  */
object Flags {

  /** Derived flag table: the reference's three seeded flags with
    * deterministic enablement. */
  def featureFlags(spark: SparkSession, sfDir: String): DataFrame = {
    val r = Tables.region(spark, sfDir)
    r.select(
      (col("r_regionkey") + 1).cast("long").as("id"),
      element_at(
        array(lit("chat_ui"), lit("multimodal_embeddings"),
          lit("structured_data_extraction"), lit("fts_listing"),
          lit("semantic_search")),
        (col("r_regionkey") + 1).cast("int")).as("name"),
      (pmod(col("r_regionkey"), lit(3)) =!= 2).as("is_enabled"))
  }

  /** Driver-side flag lookup (the lru_cache equivalent): collect the
    * tiny table once, consult it when BUILDING the plan. */
  def flagMap(spark: SparkSession, sfDir: String): Map[String, Boolean] =
    featureFlags(spark, sfDir).collect()
      .map(r => r.getAs[String]("name") -> r.getAs[Boolean]("is_enabled"))
      .toMap

  /** Flag-gated pipeline (the reference gates structured extraction
    * and chat this way, `tasks.py:92-93`, `main.py:222`): emit the
    * flag table joined with whether each gated stage would run. */
  def flagGatedPlan(spark: SparkSession, sfDir: String): DataFrame = {
    val flags = flagMap(spark, sfDir)
    val extractionOn = flags.getOrElse("structured_data_extraction", false)
    val gatedCount =
      if (extractionOn)
        Html.structuredExtract(spark, sfDir).count()
      else 0L
    featureFlags(spark, sfDir)
      .withColumn("gated_rows",
        when(col("name") === "structured_data_extraction",
          lit(gatedCount)).otherwise(lit(0L)))
      .select(col("id"), col("name"), col("is_enabled"), col("gated_rows"))
      .orderBy(col("id"))
  }

  /** Oracle replays the same gate logic in SQL (the flag derivation
    * is deterministic, so the gate outcome is too). */
  val flagGatedPlanSql: String =
    """WITH flags AS (
      |  SELECT CAST(r_regionkey + 1 AS BIGINT) AS id,
      |    (['chat_ui', 'multimodal_embeddings', 'structured_data_extraction',
      |      'fts_listing', 'semantic_search'])[r_regionkey + 1] AS name,
      |    r_regionkey % 3 <> 2 AS is_enabled
      |  FROM region),
      |web_pages AS (
      |  SELECT p_partkey AS id,
      |    CASE WHEN p_partkey % 10 < 8 THEN 'html'
      |         WHEN p_partkey % 10 = 8 THEN 'pdf' ELSE 'image' END AS file_type
      |  FROM part),
      |gated AS (
      |  SELECT COUNT(*) AS n FROM web_pages
      |  WHERE file_type = 'html' AND id < 40
      |    AND (SELECT is_enabled FROM flags
      |         WHERE name = 'structured_data_extraction'))
      |SELECT id, name, is_enabled,
      |  CASE WHEN name = 'structured_data_extraction'
      |       THEN (SELECT n FROM gated) ELSE 0 END AS gated_rows
      |FROM flags ORDER BY id""".stripMargin
}
