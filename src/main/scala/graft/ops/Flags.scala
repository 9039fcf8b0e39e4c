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

  // -----------------------------------------------------------------
  // Cache invalidation (reference `feature_flags.py:12-30`: reads go
  // through a process-local lru_cache; `POST /api/flags/clear-cache`,
  // `main.py:77`, calls `cache_clear()` so the next read re-queries)
  // -----------------------------------------------------------------

  private val cache =
    new java.util.concurrent.atomic.AtomicReference[Map[String, Boolean]](null)

  /** Cached flag read: the FIRST call materializes the given flag
    * table; later calls return the cached map even if the underlying
    * table has changed — exactly the staleness the reference's
    * lru_cache exhibits until clear-cache. Process-global, like the
    * reference's (one corpus per process). */
  def cachedFlagMap(flags: DataFrame): Map[String, Boolean] = {
    val cur = cache.get()
    if (cur != null) cur
    else {
      val loaded = flags.collect()
        .map(r => r.getAs[String]("name") -> r.getAs[Boolean]("is_enabled"))
        .toMap
      cache.compareAndSet(null, loaded)
      cache.get()
    }
  }

  /** The clear-cache endpoint: next [[cachedFlagMap]] re-reads. */
  def clearCache(): Unit = cache.set(null)

  /** The flag table after the reference's toggle UPDATE (flip
    * `structured_data_extraction`) — the deterministic stand-in for
    * an admin write between two reads. */
  def updatedFlags(spark: SparkSession, sfDir: String): DataFrame =
    featureFlags(spark, sfDir).withColumn("is_enabled",
      when(col("name") === "structured_data_extraction", !col("is_enabled"))
        .otherwise(col("is_enabled")))

  /** q76: the cache-invalidation story as a declared query. A flag is
    * toggled while a cached read is live: the gated stage still sees
    * the STALE value (gated_rows_cached) until clear-cache, after
    * which the reload sees the toggle (gated_rows_reloaded). Emits
    * per-flag cached/reloaded enablement plus the gated-stage row
    * counts under each. Idempotent: clears the cache on entry. */
  def flagReload(spark: SparkSession, sfDir: String): DataFrame = {
    clearCache()
    val stale = cachedFlagMap(featureFlags(spark, sfDir))
    val updated = updatedFlags(spark, sfDir)
    // the toggle happened; the cached read does NOT see it
    val cachedView = cachedFlagMap(updated)
    clearCache() // POST /api/flags/clear-cache
    val reloaded = cachedFlagMap(updated)
    def gatedCount(enabled: Boolean): Long =
      if (enabled) Html.structuredExtract(spark, sfDir).count() else 0L
    val gatedCached =
      gatedCount(cachedView.getOrElse("structured_data_extraction", false))
    val gatedReloaded =
      gatedCount(reloaded.getOrElse("structured_data_extraction", false))
    assert(cachedView == stale) // the staleness the cache guarantees
    featureFlags(spark, sfDir)
      .join(updated.select(col("id"), col("is_enabled").as("enabled_reloaded")),
        Seq("id"))
      .select(col("id"), col("name"),
        col("is_enabled").as("enabled_cached"), col("enabled_reloaded"),
        when(col("name") === "structured_data_extraction", lit(gatedCached))
          .otherwise(lit(0L)).as("gated_rows_cached"),
        when(col("name") === "structured_data_extraction", lit(gatedReloaded))
          .otherwise(lit(0L)).as("gated_rows_reloaded"))
      .orderBy(col("id"))
  }

  /** Oracle replays the gate outcomes (the flag derivation and the
    * toggle are deterministic, so both gate evaluations are too). */
  val flagReloadSql: String =
    """WITH flags AS (
      |  SELECT CAST(r_regionkey + 1 AS BIGINT) AS id,
      |    (['chat_ui', 'multimodal_embeddings', 'structured_data_extraction',
      |      'fts_listing', 'semantic_search'])[r_regionkey + 1] AS name,
      |    r_regionkey % 3 <> 2 AS is_enabled
      |  FROM region),
      |upd AS (
      |  SELECT id, name,
      |    CASE WHEN name = 'structured_data_extraction' THEN NOT is_enabled
      |         ELSE is_enabled END AS is_enabled
      |  FROM flags),
      |web_pages AS (
      |  SELECT p_partkey AS id,
      |    CASE WHEN p_partkey % 10 < 8 THEN 'html'
      |         WHEN p_partkey % 10 = 8 THEN 'pdf' ELSE 'image' END AS file_type
      |  FROM part),
      |gated AS (SELECT COUNT(*) AS n FROM web_pages
      |          WHERE file_type = 'html' AND id < 40),
      |gc AS (SELECT CASE WHEN (SELECT is_enabled FROM flags
      |                         WHERE name = 'structured_data_extraction')
      |              THEN (SELECT n FROM gated) ELSE 0 END AS n),
      |gr AS (SELECT CASE WHEN (SELECT is_enabled FROM upd
      |                         WHERE name = 'structured_data_extraction')
      |              THEN (SELECT n FROM gated) ELSE 0 END AS n)
      |SELECT f.id, f.name, f.is_enabled AS enabled_cached,
      |  u.is_enabled AS enabled_reloaded,
      |  CASE WHEN f.name = 'structured_data_extraction'
      |       THEN (SELECT n FROM gc) ELSE 0 END AS gated_rows_cached,
      |  CASE WHEN f.name = 'structured_data_extraction'
      |       THEN (SELECT n FROM gr) ELSE 0 END AS gated_rows_reloaded
      |FROM flags f JOIN upd u USING (id)
      |ORDER BY f.id""".stripMargin

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
