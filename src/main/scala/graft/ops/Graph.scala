package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph analytics over the crawl graph (the same synthetic
  * edge list the BFS frontier uses): PageRank with damping 0.85, a
  * fixed 3 power iterations — the authority signal a crawl corpus
  * uses for per-domain/page sampling weights.
  *
  * Scale shape: each iteration is one (contrib join on src) + one
  * groupBy dst — exactly the shuffle pattern of the components loop,
  * localCheckpoint per iteration to cut lineage. Dangling-node mass
  * is dropped (not redistributed) — documented simplification, same
  * in the oracle.
  *
  * Determinism: per-iteration ranks round to 12 decimals and the
  * incoming-contribution sum accumulates in DECIMAL, so both engines
  * walk identical rank vectors. */
object Graph {

  val Damping = 0.85
  val Iters = 3

  private def edges(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(pmod(col("l_orderkey"), lit(2000)).as("src"),
        pmod(col("l_partkey"), lit(2000)).as("dst"))
      .distinct()

  def pageRank(spark: SparkSession, sfDir: String): DataFrame = {
    val es = edges(spark, sfDir).cache()
    try {
      val nodes = es.select(col("src").as("node"))
        .unionByName(es.select(col("dst").as("node"))).distinct()
        .localCheckpoint()
      val outdeg = es.groupBy(col("src"))
        .agg(count(lit(1)).cast("double").as("deg"))
      // one count up front (the loop materializes checkpoints anyway —
      // this is an iterative job, not a lazy plan), shared by every
      // iteration instead of a per-iteration 1-row cross join
      val n = nodes.count().toDouble
      var ranks = nodes
        .select(col("node"), round(lit(1.0) / lit(n), 12).as("rank"))
        .localCheckpoint()
      for (_ <- 1 to Iters) {
        val contribs = es
          .join(ranks, col("src") === col("node"))
          .join(outdeg, Seq("src"))
          .select(col("dst"), round(col("rank") / col("deg"), 12).as("c"))
        val inbound = contribs.groupBy(col("dst")).agg(
          round(sum(col("c").cast("decimal(28,14)")).cast("double"), 12)
            .as("insum"))
        ranks = nodes
          .join(inbound, col("node") === col("dst"), "left")
          .select(col("node"),
            round(lit(1.0 - Damping) / lit(n)
              + lit(Damping) * coalesce(col("insum"), lit(0.0)), 12)
              .as("rank"))
          .localCheckpoint()
      }
      ranks.orderBy(col("rank").desc, col("node")).limit(10)
        .select(col("node"), round(col("rank"), 9).as("rank"))
    } finally es.unpersist()
  }

  val pageRankSql: String = {
    val iters = (1 to Iters).map { i =>
      s"""c$i AS (
         |  SELECT e.dst, ROUND(r.rank / d.deg, 12) AS c
         |  FROM edges e
         |  JOIN r${i - 1} r ON r.node = e.src
         |  JOIN outdeg d ON d.src = e.src),
         |s$i AS (
         |  SELECT dst, ROUND(CAST(SUM(CAST(c AS DECIMAL(28,14))) AS DOUBLE), 12) AS insum
         |  FROM c$i GROUP BY dst),
         |r$i AS (
         |  SELECT n.node,
         |    ROUND(${1.0 - Damping} / (SELECT n FROM nn)
         |      + $Damping * COALESCE(s.insum, 0.0), 12) AS rank
         |  FROM nodes n LEFT JOIN s$i s ON s.dst = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS (
      |  SELECT DISTINCT l_orderkey % 2000 AS src, l_partkey % 2000 AS dst
      |  FROM lineitem),
      |nodes AS (
      |  SELECT DISTINCT node FROM (
      |    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
      |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
      |outdeg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg FROM edges GROUP BY src),
      |r0 AS (
      |  SELECT node, ROUND(1.0 / (SELECT n FROM nn), 12) AS rank FROM nodes),
      |$iters
      |SELECT node, ROUND(rank_raw, 9) AS rank
      |FROM (SELECT node, rank AS rank_raw FROM r$Iters)
      |ORDER BY rank_raw DESC, node
      |LIMIT 10""".stripMargin
  }
}
