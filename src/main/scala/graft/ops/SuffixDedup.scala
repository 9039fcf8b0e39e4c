package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact-substring deduplication via a distributed suffix sort — the
  * published ExactSubstr formulation (Lee et al., "Deduplicating
  * Training Data Makes Language Models Better", ACL 2022: suffix-array
  * dedup of spans ≥ a length threshold), re-expressed for Spark.
  * [[Curation.spanDedup]] (q81) approximates the paper with trigram
  * document frequency; this is the exact algorithm.
  *
  * A position p in doc d is DUPLICATED iff the corpus contains the
  * same ≥[[WindowLen]]-char substring somewhere else (another doc or
  * another position of d). Deciding that needs no all-pairs stage and
  * no full suffix comparison: a suffix shares a ≥L prefix with some
  * other suffix iff its L-TRUNCATED form equals another one's, and
  * equal L-windows are ADJACENT after sorting. So:
  *
  *   1. explode each doc into its L-truncated suffixes (tail suffixes
  *      shorter than L cannot carry an L-dup and are skipped — the
  *      paper's semantics);
  *   2. hash-partition by the fixed-depth prefix (first [[PrefixLen]]
  *      chars) — every pair of equal windows shares the prefix, so
  *      complete buckets co-locate and no cross-partition pair is
  *      lost;
  *   3. per-partition suffix sort (`sortWithinPartitions`, Spark's
  *      spillable external sort) puts equal windows adjacent;
  *   4. one linear scan marks positions whose window equals a sorted
  *      neighbor — O(1) state, never a pairwise join.
  *
  * 100 TB: the shuffle ships L bytes per corpus position — the honest
  * cost of exact-substring dedup (the single-node reference
  * implementation memory-maps the same data instead). The levers are
  * the window byte-packing, a deeper prefix for finer buckets (hot
  * prefixes like "the " split across more partitions at depth 3-4),
  * and Spark's external sort doing the per-bucket work without
  * driver-side anything. The scan and the rollup are partial-agg
  * shapes.
  */
object SuffixDedup {

  /** Duplicate-span threshold, in chars (the paper uses 50 BPE
    * tokens; chars are this corpus's unit). */
  val WindowLen = 24

  /** Fixed bucketing depth: equal windows agree on their first chars,
    * so partitioning by a 2-char prefix co-locates every equal pair. */
  val PrefixLen = 2

  /** Duplicated positions: (doc_id, source, pos) for every position
    * whose L-window occurs ≥ 2 times in the corpus. Exposed for the
    * spec's brute-force replay. */
  private[graft] def dupPositions(docs: DataFrame, L: Int = WindowLen)
      : DataFrame = {
    import docs.sparkSession.implicits._
    val windows = docs
      .filter(length(col("text")) >= L) // shorter docs carry no L-dup
      .select(col("doc_id"), col("source"), explode(
        transform(sequence(lit(1), length(col("text")) - lit(L - 1)),
          i => struct(col("text").substr(i, lit(L)).as("w"),
            i.as("pos")))).as("x"))
      .select(col("x.w"), col("doc_id"), col("source"), col("x.pos"))
    windows
      .repartition(col("w").substr(lit(1), lit(PrefixLen)))
      .sortWithinPartitions(col("w"))
      .as[(String, Long, String, Int)]
      .mapPartitions { it =>
        // equal windows are adjacent: emit a row iff its window
        // matches the previous or the next one
        val buf = it.buffered
        var prevW: String = null
        buf.flatMap { case (w, id, src, pos) =>
          val dup = w == prevW || (buf.hasNext && buf.head._1 == w)
          prevW = w
          if (dup) Some((id, src, pos)) else None
        }
      }
      .toDF("doc_id", "source", "pos")
  }

  /** q156: the per-source duplication report off the suffix sort —
    * how many positions sit inside an exact ≥L-char duplicated span
    * and how many docs carry at least one (the numbers that decide
    * how much a span-level dedup pass would cut). */
  def exactSubstr(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
    dupPositions(docs)
      .groupBy(col("source")).agg(
        count(lit(1)).as("dup_positions"),
        countDistinct(col("doc_id")).as("dup_docs"))
      .orderBy(col("source"))
  }

  /** DuckDB oracle: enumerate every L-window, keep those occurring
    * ≥ 2 times, roll up — the definition the suffix sort computes
    * without ever grouping full windows. */
  val exactSubstrSql: String =
    s"""WITH w AS (
      |  SELECT doc_id, source,
      |    substr(text, CAST(i AS INTEGER), $WindowLen) AS w
      |  FROM (
      |    SELECT doc_id, source, text,
      |      unnest(range(1, length(text) - ${WindowLen - 1} + 1)) AS i
      |    FROM documents
      |    WHERE length(text) >= $WindowLen)
      |), dup AS (
      |  SELECT w FROM w GROUP BY w HAVING COUNT(*) >= 2
      |)
      |SELECT source,
      |  CAST(COUNT(*) AS BIGINT) AS dup_positions,
      |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS dup_docs
      |FROM w JOIN dup USING (w)
      |GROUP BY source ORDER BY source""".stripMargin
}
