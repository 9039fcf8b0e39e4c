package graft.streaming

import graft.ops.Blocklist
import graft.expressions.MultiContains
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming twin of the q146 blocklist audit — content-policy
  * screening where production actually runs it: ON THE INGEST PATH,
  * before a document is ever written to the corpus. Batch screening
  * (q146) tells you what already shipped; the stream gate keeps it
  * from shipping.
  *
  * Two surfaces, both driven by the SAME shared Aho-Corasick
  * automaton expression as the batch audit
  * ([[graft.expressions.MultiContains]] over [[Blocklist.Patterns]]),
  * so stream and batch can never disagree on what counts as a hit:
  *
  *  - [[screen]]: per-document pass/block decision, append-mode — a
  *    stateless one-automaton-pass projection, so it rides inside
  *    whatever micro-batch pipeline ingest already runs (the same
  *    placement as [[Ingest]]'s guard filters).
  *  - [[runningAudit]]: per-pattern running totals across all
  *    micro-batches — a stateful streaming aggregation whose state is
  *    K pattern rows (constant, tiny), never per-document state.
  *
  * Scale shape: text is read once per arriving document inside its
  * micro-batch and never crosses an exchange; the only shuffled
  * relation is the K-row per-pattern rollup.
  */
object BlocklistScreen {

  case class Doc(doc_id: Long, text: String)

  /** A document is blocked when any blocklist pattern occurs. The
    * decision carries the total hit count so downstream triage can
    * rank the quarantine queue. */
  def screen(docs: Dataset[Doc]): DataFrame =
    docs.select(col("doc_id"),
        MultiContains.hits(col("text"), Blocklist.Patterns).as("hits"))
      .select(col("doc_id"),
        aggregate(col("hits"), lit(0L), (acc, x) => acc + x).as("n_hits"))
      .withColumn("blocked", col("n_hits") > 0)

  /** Running (pattern, n_docs, n_hits) totals over everything that
    * has arrived — the q146 audit, maintained incrementally. Run with
    * outputMode "complete" (or "update"): state is exactly K rows. */
  def runningAudit(docs: Dataset[Doc]): DataFrame = {
    val patArr = array(Blocklist.Patterns.map(lit): _*)
    docs.select(posexplode(
        MultiContains.hits(col("text"), Blocklist.Patterns))
        .as(Seq("idx", "n")))
      .select(element_at(patArr, col("idx") + 1).as("pattern"), col("n"))
      .groupBy(col("pattern")).agg(
        sum(when(col("n") > 0, 1L).otherwise(0L)).as("n_docs"),
        sum(col("n")).as("n_hits"))
  }
}
