package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view delta
  * algebra (Gupta & Mumick 1995): a recurring 100 TB refresh must
  * NOT recompute its dashboard aggregates from scratch when 2% of
  * rows changed; it applies the delta —
  *
  *   new_agg = old_agg + added − removed + (changed_new − changed_old)
  *
  * — touching only the delta rows. This query maintains the
  * per-source (n_docs, chars_sum) aggregate across the q106 snapshot
  * generations THROUGH THE DELTA PATH, and the oracle recomputes the
  * same aggregate directly from the NEW generation: cross-engine
  * equality is a proof that the increment algebra is exact, not an
  * approximation of the recompute.
  *
  * Honesty of shape: the Spark side never aggregates the NEW
  * generation — it aggregates the OLD base once (at production: a
  * STORED aggregate, zero scan) and three delta slices carved by the
  * q106 rules (added ids, retired ids, changed ids), each a
  * predicate-pushed scan that at production reads only delta files.
  * The merge is a 4-way outer join on the handful of group keys.
  *
  * Change deltas are computed as (new − old) contributions from the
  * changed rows' both texts — NOT hard-coded from knowledge that the
  * revision appends 3 chars; the algebra must survive any edit.
  */
object IncrementalAgg {

  /** q195: the maintained per-source aggregate after applying the
    * generation delta. */
  def maintainedAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
    val newText = when(pmod(col("doc_id"), lit(7)) === 0,
      concat(col("text"), lit(" v2"))).otherwise(col("text"))

    // the stored base: OLD generation = ids%5!=0 (current text) plus
    // retired rows (+300000 for id%13==0) — q106's carving
    val oldAgg = d.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .select(col("source"), length(col("text")).as("chars"))
      .unionByName(d.filter(pmod(col("doc_id"), lit(13)) === 0)
        .select(col("source"), length(col("text")).as("chars")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n0"), sum(col("chars")).cast("long").as("c0"))

    // delta slices (predicate-pushed; at production: delta files only)
    val added = d.filter(pmod(col("doc_id"), lit(5)) === 0)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_add"),
        sum(length(newText)).cast("long").as("c_add"))
    val removed = d.filter(pmod(col("doc_id"), lit(13)) === 0)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rem"),
        sum(length(col("text"))).cast("long").as("c_rem"))
    val changed = d.filter(pmod(col("doc_id"), lit(7)) === 0
        && pmod(col("doc_id"), lit(5)) =!= 0)
      .groupBy(col("source"))
      .agg((sum(length(newText)) - sum(length(col("text"))))
        .cast("long").as("c_chg"))

    oldAgg
      .join(added, Seq("source"), "full_outer")
      .join(removed, Seq("source"), "full_outer")
      .join(changed, Seq("source"), "full_outer")
      .na.fill(0L, Seq("n0", "c0", "n_add", "c_add", "n_rem", "c_rem", "c_chg"))
      .select(col("source"),
        (col("n0") + col("n_add") - col("n_rem")).as("n_docs"),
        (col("c0") + col("c_add") - col("c_rem") + col("c_chg"))
          .as("chars_sum"))
      .orderBy(col("source"))
  }

  /** DuckDB oracle: the DIRECT recompute over the NEW generation —
    * equality proves the delta algebra exact. */
  val maintainedAggSql: String =
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(length(CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
      |                       ELSE text END)) AS BIGINT) AS chars_sum
      |FROM documents
      |GROUP BY source ORDER BY source""".stripMargin
}
