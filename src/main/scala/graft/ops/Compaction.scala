package graft.ops

import graft.Tables
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the OPERATIONAL storage lever the layout
  * family (Z-order q91, bucketing q153, partitioning q164/q165,
  * footer stats q168) presumes but nothing yet performs: streaming
  * ingest and per-batch upserts (the reference's write path,
  * `/root/reference/backend/src/db/postgres.py` one-transaction-per-
  * batch) fragment a table into thousands of KB-scale files, and at
  * 100 TB the scan cost of a fragmented table is dominated by file
  * OPEN overhead (a footer read + seek per file) rather than data
  * volume — every serious lakehouse runs an OPTIMIZE/compaction pass.
  *
  * The operator is a size-aware bin-packing rewrite: list the
  * fragment sizes from the file index (metadata only — no data read
  * to plan), compute the output file count from Σbytes / target, and
  * rewrite through a round-robin `repartition(n)` so output files
  * come out near-uniform at the target size. At scale the same two
  * passes hold (one metadata listing, one data rewrite), the rewrite
  * shuffles each byte exactly once, and the target size is the knob
  * that trades open-overhead against parallelism (128 MiB-1 GiB in
  * production; 1 MiB here so the sf0.01 fixture still exercises a
  * multi-file result).
  */
object Compaction {

  /** Target compacted file size. Production would use 128 MiB+; the
    * test SFs use 1 MiB so compaction still yields >1 file. */
  val TargetBytes: Long = 1L << 20

  /** Fragment count staged before compaction (the "thousand tiny
    * files after a day of micro-batches" shape, scaled down). */
  val Fragments = 48

  private def layoutBase(sfDir: String): String =
    graft.Scratch.dir("compaction_layout", sfDir)

  /** Parquet data files directly under `path` with their sizes —
    * metadata-only (one directory listing, no footers, no data). */
  private def dataFiles(spark: SparkSession, path: String): Seq[Long] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen)
  }

  /** Bin-packing rewrite of `inPath` into ceil(Σbytes / target) files
    * at `outPath`. Returns (filesBefore, filesAfter, totalBytes). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = TargetBytes): (Int, Int, Long) = {
    val sizes = dataFiles(spark, inPath)
    val total = sizes.sum
    val n = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inPath).repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    (sizes.size, dataFiles(spark, outPath).size, total)
  }

  /** q172: stage a deliberately fragmented lineitem layout (48 tiny
    * files), compact it, HARD-ASSERT the compaction contract in the
    * query itself (the q153/q164 discipline — the scale property is
    * part of the query), and answer a rollup read from the COMPACTED
    * layout. The oracle recomputes the rollup from the plain table:
    * compaction changes the layout, never the answer. */
  def compactedRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val frag = s"${layoutBase(sfDir)}/lineitem_fragmented"
    val out = s"${layoutBase(sfDir)}/lineitem_compacted"
    Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
        col("l_extendedprice"))
      .repartition(Fragments)
      .write.mode(SaveMode.Overwrite).parquet(frag)
    val (before, after, total) = compact(spark, frag, out)
    val expected = math.max(1L, (total + TargetBytes - 1) / TargetBytes).toInt
    require(before == Fragments, s"staged $before fragments, want $Fragments")
    require(after == expected,
      s"compaction produced $after files, want $expected for $total bytes")
    require(after < before, s"compaction did not reduce files: $after")
    val outSizes = dataFiles(spark, out)
    require(outSizes.forall(_ <= 2 * TargetBytes),
      s"oversized compacted file: ${outSizes.max} > 2x target")
    if (after > 1) require(outSizes.sum / after >= TargetBytes / 3,
      s"undersized compacted files: mean ${outSizes.sum / after}")
    spark.read.parquet(out)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity").cast("decimal(28,10)")).cast("double"), 2)
          .as("sum_qty"),
        round(sum(col("l_extendedprice").cast("decimal(28,10)"))
          .cast("double"), 2).as("sum_price"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** DuckDB oracle: the same rollup from the plain table — byte-moving
    * maintenance must be answer-invariant. */
  val compactedRollupSql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
      |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE), 2)
      |    AS sum_qty,
      |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE), 2)
      |    AS sum_price
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
