package graft

import org.apache.spark.sql.SparkSession

/** One place for the session config the engine's entry points share:
  * UTC timezone (deterministic timestamps vs the oracle),
  * shuffle partitions ≈ cores (not the 200 default),
  * nanos-as-long parquet reads (the events table is TIMESTAMP(NANOS),
  * which Spark's vectorized reader otherwise refuses), AQE on for the
  * runtime re-planning story at scale, and tmpfs-backed scratch space
  * when available.
  */
object GraftSession {

  /** Shuffle files, disk spills, and block-manager overflow go to
    * `spark.local.dir`. On this host the root disk is a virtio device
    * whose sustained throughput can collapse to MB/s once burst
    * credits drain (measured: 512 MB fsync = 83 s mid-session), which
    * turns every shuffle write into the bottleneck regardless of plan
    * quality. /dev/shm is RAM-backed and sized at half of physical
    * memory — more than any sf0.1 shuffle needs — so scratch traffic
    * never touches the slow disk. Falls back to the default /tmp when
    * tmpfs is absent (a real cluster configures local dirs on NVMe
    * the same way). */
  private def scratchDir: Option[String] = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      val d = new java.io.File(shm, "graft-spark-local")
      d.mkdirs()
      Some(d.getAbsolutePath)
    } else None
  }

  def builder(cores: String): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Streaming checkpoint logs (offset/commit WAL, state changelog
      // uploads, file-source/sink metadata) default to the
      // FileContext-based manager, whose local-FS rename path calls
      // RawLocalFileSystem.readLink — a fork+exec of a shell command
      // PER RENAME (driver thread dumps during q162 showed
      // Shell.runCommand under HDFSMetadataLog.write on every
      // micro-batch commit; 33/6-dump hits). The FileSystem-based
      // manager renames via File.renameTo — no subprocess, same
      // atomic-rename semantics on a local FS. Scoped to this builder
      // (local-mode sessions with tmpfs-local checkpoints); a cluster
      // deployment on HDFS/S3 keeps Spark's default manager choice.
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing." +
          "FileSystemBasedCheckpointFileManager")
      .config("spark.ui.enabled", "false")
    scratchDir.fold(b)(d => b.config("spark.local.dir", d))
  }

  private var scrubCount = 0

  /** Drop per-query session state so back-to-back query runs (Bench,
    * Verify, TimeQuery) can't poison each other. `clearCache()` only
    * covers `cache()`/`persist()` on tables; `localCheckpoint` blocks
    * stay pinned in the block manager until the driver GCs the RDD
    * object and the async ContextCleaner gets around to them — over a
    * 134-query × 2-rep run that lag accumulates into storage-memory
    * eviction churn. Unpersisting every still-registered RDD is
    * synchronous and safe between queries (nothing references them
    * across query boundaries); a periodic System.gc() lets the
    * ContextCleaner reclaim shuffle files and broadcasts too. */
  def scrub(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    scrubCount += 1
    if (scrubCount % 8 == 0) System.gc()
  }
}
