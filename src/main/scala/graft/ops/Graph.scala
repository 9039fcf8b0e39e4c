package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph analytics over the crawl graph (the same synthetic
  * edge list the BFS frontier uses): PageRank with damping 0.85, a
  * fixed 3 power iterations — the authority signal a crawl corpus
  * uses for per-domain/page sampling weights.
  *
  * Scale shape: each iteration is one (contrib join on src) + one
  * groupBy dst — the shuffle pattern of the components loop —
  * localCheckpoint per iteration to cut lineage. The rank/outdeg
  * sides are broadcast and the per-iteration checkpoints collapse to
  * one partition when the measured node count is small (the node
  * count is already an up-front action); a billion-node graph takes
  * the shuffle-join path with full parallelism. Two mass semantics:
  *
  *   - [[pageRank]] DROPS dangling-node mass (documented
  *     simplification; ranks do not sum to 1),
  *   - [[pageRankFull]] redistributes it uniformly — the standard
  *     semantics — at the cost of one extra 1-row aggregate per
  *     iteration (broadcast back), over a bipartite-tail graph
  *     derivation where 500 sink nodes guarantee the dangling term
  *     is actually exercised.
  *
  * Determinism: per-iteration ranks round to 12 decimals and every
  * mass sum accumulates in DECIMAL, so both engines walk identical
  * rank vectors. */
object Graph {

  val Damping = 0.85
  val Iters = 3

  /** Graphs smaller than this many nodes run the loop with broadcast
    * rank joins and 1-partition checkpoints (pure fixed-cost cut);
    * larger graphs shuffle with full parallelism. */
  val SmallGraphNodes = 1000000L

  private def edges(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(pmod(col("l_orderkey"), lit(2000)).as("src"),
        pmod(col("l_partkey"), lit(2000)).as("dst"))
      .distinct()

  /** Edge list with a guaranteed dangling tail: order nodes 0..1999
    * link to part nodes 2000..2499, which never appear as sources —
    * 500 sinks whose mass the full variant must redistribute. */
  private def edgesWithSinks(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(pmod(col("l_orderkey"), lit(2000)).as("src"),
        (lit(2000) + pmod(col("l_partkey"), lit(500))).as("dst"))
      .distinct()

  def pageRank(spark: SparkSession, sfDir: String): DataFrame =
    pageRankOf(edges(spark, sfDir), redistributeDangling = false)

  def pageRankFull(spark: SparkSession, sfDir: String): DataFrame =
    pageRankOf(edgesWithSinks(spark, sfDir), redistributeDangling = true)

  private def pageRankOf(edgeList: DataFrame,
      redistributeDangling: Boolean): DataFrame = {
    val es = edgeList.cache()
    try {
      val nodes = es.select(col("src").as("node"))
        .unionByName(es.select(col("dst").as("node"))).distinct()
        .localCheckpoint()
      val outdeg = es.groupBy(col("src"))
        .agg(count(lit(1)).cast("double").as("deg"))
        .localCheckpoint()
      // one count up front (the loop materializes checkpoints anyway —
      // this is an iterative job, not a lazy plan), shared by every
      // iteration instead of a per-iteration 1-row cross join
      val n = nodes.count().toDouble
      val small = n < SmallGraphNodes
      // small graph → rank vector is broadcast-sized and one partition
      // holds it; 3 rounds × 32 shuffle partitions on 2000 nodes was
      // pure scheduling overhead
      def pin(df: DataFrame): DataFrame =
        (if (small) df.coalesce(1) else df).localCheckpoint()
      def maybeBroadcast(df: DataFrame): DataFrame =
        if (small) broadcast(df) else df
      var ranks = pin(nodes
        .select(col("node"), round(lit(1.0) / lit(n), 12).as("rank")))
      for (_ <- 1 to Iters) {
        val contribs = es
          .join(maybeBroadcast(ranks), col("src") === col("node"))
          .join(maybeBroadcast(outdeg), Seq("src"))
          .select(col("dst"), round(col("rank") / col("deg"), 12).as("c"))
        val inbound = contribs.groupBy(col("dst")).agg(
          round(sum(col("c").cast("decimal(28,14)")).cast("double"), 12)
            .as("insum"))
        val base = nodes
          .join(maybeBroadcast(inbound), col("node") === col("dst"), "left")
        val (withDm, mass) =
          if (!redistributeDangling)
            (base, coalesce(col("insum"), lit(0.0)))
          else {
            // dangling mass: total rank sitting on nodes with no
            // out-edges, spread uniformly — one 1-row aggregate per
            // iteration, broadcast back
            val dm = ranks
              .join(outdeg, col("node") === col("src"), "left_anti")
              .agg(round(sum(col("rank").cast("decimal(28,14)"))
                .cast("double"), 12).as("dm"))
            (base.crossJoin(broadcast(dm)),
              coalesce(col("insum"), lit(0.0)) +
                coalesce(col("dm"), lit(0.0)) / lit(n))
          }
        ranks = pin(withDm
          .select(col("node"),
            round(lit(1.0 - Damping) / lit(n) + lit(Damping) * mass, 12)
              .as("rank")))
      }
      ranks.orderBy(col("rank").desc, col("node")).limit(10)
        .select(col("node"), round(col("rank"), 9).as("rank"))
    } finally es.unpersist()
  }

  private def pageRankSqlOf(edgesSql: String,
      redistributeDangling: Boolean): String = {
    val iters = (1 to Iters).map { i =>
      val dmCte =
        if (!redistributeDangling) ""
        else s"""dm$i AS (
           |  SELECT ROUND(CAST(SUM(CAST(rank AS DECIMAL(28,14))) AS DOUBLE), 12) AS dm
           |  FROM r${i - 1}
           |  WHERE node NOT IN (SELECT src FROM edges)),
           |""".stripMargin
      val massSql =
        if (!redistributeDangling) "COALESCE(s.insum, 0.0)"
        else s"(COALESCE(s.insum, 0.0) + COALESCE((SELECT dm FROM dm$i), 0.0) / (SELECT n FROM nn))"
      s"""c$i AS (
         |  SELECT e.dst, ROUND(r.rank / d.deg, 12) AS c
         |  FROM edges e
         |  JOIN r${i - 1} r ON r.node = e.src
         |  JOIN outdeg d ON d.src = e.src),
         |s$i AS (
         |  SELECT dst, ROUND(CAST(SUM(CAST(c AS DECIMAL(28,14))) AS DOUBLE), 12) AS insum
         |  FROM c$i GROUP BY dst),
         |${dmCte}r$i AS (
         |  SELECT n.node,
         |    ROUND(${1.0 - Damping} / (SELECT n FROM nn)
         |      + $Damping * $massSql, 12) AS rank
         |  FROM nodes n LEFT JOIN s$i s ON s.dst = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS (
      |  $edgesSql),
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

  val pageRankSql: String = pageRankSqlOf(
    "SELECT DISTINCT l_orderkey % 2000 AS src, l_partkey % 2000 AS dst\n  FROM lineitem",
    redistributeDangling = false)

  val pageRankFullSql: String = pageRankSqlOf(
    "SELECT DISTINCT l_orderkey % 2000 AS src, 2000 + l_partkey % 500 AS dst\n  FROM lineitem",
    redistributeDangling = true)
}
