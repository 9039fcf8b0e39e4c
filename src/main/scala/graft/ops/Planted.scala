package graft.ops

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Guard for the planted-corpus convention (ADVICE r9): synthetic
  * copy/slice/retired families re-key rows as `doc_id + offset`, and
  * several censuses CLASSIFY rows by that id range (e.g. q194's
  * `contained >= 500000 → planted_slice`). That classification is
  * only sound while every ORGANIC id sits below the smallest offset —
  * at a larger SF an organic doc_id ≥ offset would silently
  * misreport as planted, and the shift itself would collide with
  * real ids.
  *
  * [[assertHeadroom]] turns that latent assumption into a loud
  * staging-time failure: the corpus max id is computed once per
  * (session, sfDir) from the pruned single-column parquet scan
  * (milliseconds, cached thereafter) and every carving site asserts
  * its own offset against it before building the planted union.
  */
object Planted {

  /** Smallest `doc_id` offset any carving in the repo uses
    * (Dedup's +100000 near-dup tail family). */
  val MinOffset = 100000L

  private val maxIdCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Max organic doc_id, computed once per sfDir per JVM. */
  def maxDocId(spark: SparkSession, sfDir: String): Long =
    maxIdCache.computeIfAbsent(
      new java.io.File(sfDir).getAbsolutePath,
      _ => Tables.documents(spark, sfDir)
        .agg(max(col("doc_id"))).head.getLong(0)).longValue()

  /** Fail loudly if a planted-id offset could collide with (or be
    * confused for) the organic id range. Call at staging time, before
    * the carved union is built. */
  def assertHeadroom(spark: SparkSession, sfDir: String,
      offset: Long, site: String): Unit = {
    val mx = maxDocId(spark, sfDir)
    require(mx < offset,
      s"[$site] planted-id offset $offset collides with the organic " +
        s"doc_id range (max=$mx at $sfDir): range-derived origin " +
        "classification would misreport — re-key the carving")
  }
}
