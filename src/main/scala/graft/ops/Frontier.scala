package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-frontier scheduling: turn an authority signal plus
  * politeness limits into the next fetch batch — the distributed
  * version of the reference's Scrapy scheduler settings
  * (`crawlers/README.md:300-313`: 2 requests per domain) applied to
  * a billion-URL frontier.
  */
object Frontier {

  /** Per-host politeness cap (the reference's per-domain concurrency). */
  val PerHostCap = 2

  /** Global fetch-batch size. */
  val BatchSize = 50

  /** q124: select the next crawl batch — rank frontier nodes by
    * in-degree (the cheap authority proxy; q66's PageRank slots in
    * unchanged), enforce [[PerHostCap]] per host via the bounded-heap
    * TopKPerKey operator, then cut the global [[BatchSize]].
    *
    * Determinism without trusting float ties: the per-host order
    * column packs (indeg, node) into one exactly-representable
    * integer-valued double (indeg·4096 − node; node < 4096), so heap
    * and window agree on every tie. Shape: one edge groupBy, the
    * O(n log k)/partition per-host heap (no global sort), a window
    * over the ≤ cap·hosts survivors, TakeOrderedAndProject for the
    * batch cut. */
  def nextBatch(spark: SparkSession, sfDir: String): DataFrame = {
    val indeg = Tables.lineitem(spark, sfDir)
      .select(pmod(col("l_orderkey"), lit(2000)).as("src"),
        pmod(col("l_partkey"), lit(2000)).as("dst"))
      .distinct()
      .groupBy(col("dst")).agg(count(lit(1)).as("indeg"))
      .select(col("dst").as("node"), col("indeg"),
        pmod(col("dst"), lit(50)).as("host"))
      .withColumn("ord",
        (col("indeg") * 4096L - col("node")).cast("double"))
    val perHost = graft.plans.TopKPerKey.perKey(
      indeg, Seq("host"), "ord", PerHostCap)
    perHost
      .withColumn("host_rank", row_number().over(
        Window.partitionBy(col("host")).orderBy(col("ord").desc)))
      .orderBy(col("indeg").desc, col("node"))
      .limit(BatchSize)
      .select(col("host"), col("node"), col("indeg"),
        col("host_rank").cast("long").as("host_rank"))
      .orderBy(col("indeg").desc, col("node"))
  }

  val nextBatchSql: String =
    s"""WITH edges AS (
      |  SELECT DISTINCT l_orderkey % 2000 AS src, l_partkey % 2000 AS dst
      |  FROM lineitem),
      |indeg AS (
      |  SELECT dst AS node, COUNT(*) AS indeg, dst % 50 AS host
      |  FROM edges GROUP BY dst),
      |ranked AS (
      |  SELECT host, node, indeg,
      |    ROW_NUMBER() OVER
      |      (PARTITION BY host ORDER BY indeg DESC, node) AS host_rank
      |  FROM indeg)
      |SELECT host, node, indeg, host_rank
      |FROM ranked WHERE host_rank <= $PerHostCap
      |ORDER BY indeg DESC, node LIMIT $BatchSize""".stripMargin
}
