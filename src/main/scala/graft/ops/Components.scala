package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over the near-dup pair graph — dedup's last
  * mile: pairs are not enough, the pipeline needs dup GROUPS with one
  * canonical representative each (keep min-id, drop the rest).
  *
  * Algorithm: min-label propagation to CONVERGENCE (stop as soon as a
  * round changes no label), capped at 6 rounds so the result is
  * identical to the oracle's unrolled 6 rounds even on a
  * pathologically deep graph (extra rounds past the fixpoint are
  * no-ops, so early exit cannot change the answer). Each iteration is
  * one join + groupBy on the label, per-level localCheckpoint to cut
  * lineage; the convergence probe is a count over the already-
  * materialized checkpoint — at 100 TB you pay one cheap action per
  * round instead of blindly running worst-case depth.
  */
object Components {

  val Rounds = 6

  /** Undirected edge list from the exact Jaccard near-dup pairs.
    *
    * The pair pipeline (the full q23 plan: shingling, inverted index,
    * prefix-filtered self-join, exact verification, global sort) is
    * materialized EXACTLY ONCE by an eager localCheckpoint BEFORE the
    * symmetric union. The previous version unioned two references to
    * the lazy plan under a lazy `.cache()`, so the first loop action
    * could pay the pipeline (and the sort's range-sampling pass) per
    * branch — the r5 q53 pathology (72-216 s solo vs 9.5 s for q23).
    * The pair set itself is tiny (~10³ rows at sf0.1), so after the
    * checkpoint everything downstream is metadata-scale work.
    */
  private def edges(spark: SparkSession, sfDir: String): DataFrame = {
    val t0 = System.nanoTime()
    // materialize the pipeline at its natural parallelism …
    val wide = Dedup.jaccardPairs(spark, sfDir)
      .select(col("a_id"), col("b_id"))
      .localCheckpoint()
    // … then pin the tiny result as one block for the label loop
    val pairs = wide.coalesce(1).localCheckpoint()
    System.err.println(
      f"[q53] edges materialized in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionByName(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
  }

  /** q53: dup-group summary — component count, size distribution,
    * canonical-id checksum. */
  def dedupGroups(spark: SparkSession, sfDir: String): DataFrame = {
    val es = edges(spark, sfDir)
    // a small label table (the usual case — only dup-pair ENDPOINTS
    // carry labels) runs the loop with broadcast joins and 1-partition
    // checkpoints, the same fixed-cost cut as the PageRank loop; a
    // huge one keeps the shuffle path
    var labels = es.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint()
    val small = labels.count() < 1000000L
    def pin(df: DataFrame): DataFrame =
      (if (small) df.coalesce(1) else df).localCheckpoint()
    def maybeBroadcast(df: DataFrame): DataFrame =
      if (small) broadcast(df) else df
    var converged = false
    var round = 0
    while (round < Rounds && !converged) {
      val t0 = System.nanoTime()
      val neighborMin = es.join(maybeBroadcast(labels),
          col("dst") === col("node"))
        .groupBy(col("src")).agg(min(col("lbl")).as("nlbl"))
      val next = pin(labels
        .join(maybeBroadcast(neighborMin), col("node") === col("src"), "left")
        .select(col("node"), col("lbl").as("old_lbl"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl")))
      converged = next.filter(col("lbl") < col("old_lbl")).isEmpty
      labels = next.select(col("node"), col("lbl"))
      round += 1
      System.err.println(
        f"[q53] round $round: ${(System.nanoTime() - t0) / 1e9}%.2fs" +
          (if (converged) " (converged)" else ""))
    }
    labels.groupBy(col("lbl")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz")).agg(
        count(lit(1)).as("n_groups"),
        sum(col("lbl")).as("canonical_sum"))
      .orderBy(col("sz"))
  }

  val dedupGroupsSql: String = {
    val rounds = (1 to Rounds).map { i =>
      s"""l$i AS (
         |  SELECT l.node,
         |    LEAST(l.lbl, COALESCE(MIN(nb.lbl), l.lbl)) AS lbl
         |  FROM l${i - 1} l
         |  LEFT JOIN edges e ON e.src = l.node
         |  LEFT JOIN l${i - 1} nb ON nb.node = e.dst
         |  GROUP BY l.node, l.lbl)""".stripMargin
    }.mkString(",\n")
    // reuse the full q23 pipeline as the pair source
    val pairSource = Dedup.jaccardPairsSql
      .replace("ORDER BY a_id, b_id", "")
    s"""WITH pairs AS ($pairSource),
      |edges AS (
      |  SELECT a_id AS src, b_id AS dst FROM pairs
      |  UNION ALL SELECT b_id AS src, a_id AS dst FROM pairs),
      |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges),
      |$rounds
      |SELECT sz, COUNT(*) AS n_groups, CAST(SUM(lbl) AS BIGINT) AS canonical_sum
      |FROM (SELECT lbl, COUNT(*) AS sz FROM l$Rounds GROUP BY lbl)
      |GROUP BY sz ORDER BY sz""".stripMargin
  }
}
