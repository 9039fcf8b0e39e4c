package graft.ops

import graft.Tables
import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the change-data accounting between two
  * crawl/ingest generations: which documents were added, removed,
  * changed, or untouched. The upsert sink (S5) answers "what is the
  * latest state"; this answers "what happened between generations" —
  * the audit a recurring 100 TB refresh publishes with every run.
  *
  * Shape: both snapshots reduce to (id, fingerprint) AT THE SCAN
  * (the 60-bit content hash from q22), so the full-outer join that
  * classifies every id shuffles 16 bytes per document — never text.
  * The classification is a null/equality pattern on the joined pair;
  * the report is a 4-key partial aggregate.
  *
  * Snapshots are carved deterministically from `documents`:
  * OLD = ids with id%5 != 0, plus retired ids (slot-3 planted
  * offset for id%13==0);
  * NEW = every current id, with text revised (' v2' suffix) for
  * id%7==0. So: id%5==0 → added, retired → removed, id%7==0 (and
  * id%5!=0) → changed, rest unchanged.
  */
object Snapshot {

  /** q106: snapshot diff rollup — status × count × id range. */
  def snapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val off = Planted.familyOffset(spark, sfDir, 3, "q106 snapshot carving")
    val d = Tables.documents(spark, sfDir)
    val old = d.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("old_fp"))
      .unionByName(d.filter(pmod(col("doc_id"), lit(13)) === 0)
        .select((col("doc_id") + off).as("doc_id"),
          TextOps.fingerprint(col("text")).as("old_fp")))
    val neu = d.select(col("doc_id"),
      TextOps.fingerprint(
        when(pmod(col("doc_id"), lit(7)) === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text"))).as("new_fp"))
    old.join(neu, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") =!= col("new_fp"), lit("changed"))
          .otherwise(lit("unchanged")))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      .orderBy(col("status"))
  }

  /** q136: snapshot DISTRIBUTION drift — per-source share shift and
    * KL(new ‖ old) contribution between the same two generations
    * q106 diffs row-wise. Row-level diff says WHAT changed; this says
    * whether the corpus MIX moved (the check a recurring pretraining
    * refresh runs before retraining — a silent crawler failure shows
    * up as a source's share collapsing long before anyone reads row
    * diffs).
    *
    * Shape: one partial-agg groupBy per generation (source keys), a
    * 1-row total broadcast onto each, and a 20-row join — constant
    * output, no row-level exchange at all. Transcendentals follow the
    * engine-parity recipe: shares rounded to 9 before the ln, the ln
    * rounded to 9 before the multiply. */
  def snapshotDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val off = Planted.familyOffset(spark, sfDir, 3, "q136 snapshot carving")
    val d = Tables.documents(spark, sfDir)
    val old = d.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .select(col("doc_id"), col("source"))
      .unionByName(d.filter(pmod(col("doc_id"), lit(13)) === 0)
        .select((col("doc_id") + off).as("doc_id"), col("source")))
    val neu = d.select(col("doc_id"), col("source"))
    def shares(gen: DataFrame, n: String, p: String): DataFrame = {
      val counts = gen.groupBy(col("source")).agg(count(lit(1)).as(n))
      counts.crossJoin(broadcast(
          counts.agg(sum(col(n)).cast("long").as(s"${n}_total"))))
        .select(col("source"), col(n),
          round(col(n).cast("double") / col(s"${n}_total"), 9).as(p))
    }
    shares(old, "n_old", "p_old").join(shares(neu, "n_new", "p_new"),
        Seq("source"))
      .withColumn("kl_term",
        round(col("p_new") * round(log(col("p_new") / col("p_old")), 9), 9))
      .select(col("source"), col("n_old"), col("n_new"),
        round(col("p_old"), 6).as("p_old"),
        round(col("p_new"), 6).as("p_new"),
        round(abs(col("p_new") - col("p_old")), 6).as("abs_shift"),
        col("kl_term"))
      .orderBy(col("source"))
  }

  val snapshotDriftSql: String =
    s"""WITH old AS (
      |  SELECT doc_id, source FROM documents WHERE doc_id % 5 <> 0
      |  UNION ALL
      |  SELECT doc_id + ${Planted.offsetSql(3)} AS doc_id, source
      |  FROM documents WHERE doc_id % 13 = 0),
      |neu AS (SELECT doc_id, source FROM documents),
      |o AS (
      |  SELECT source, COUNT(*) AS n_old,
      |    ROUND(CAST(COUNT(*) AS DOUBLE)
      |      / (SELECT COUNT(*) FROM old), 9) AS p_old
      |  FROM old GROUP BY source),
      |n AS (
      |  SELECT source, COUNT(*) AS n_new,
      |    ROUND(CAST(COUNT(*) AS DOUBLE)
      |      / (SELECT COUNT(*) FROM neu), 9) AS p_new
      |  FROM neu GROUP BY source)
      |SELECT o.source, n_old, n_new,
      |  ROUND(p_old, 6) AS p_old, ROUND(p_new, 6) AS p_new,
      |  ROUND(ABS(p_new - p_old), 6) AS abs_shift,
      |  ROUND(p_new * ROUND(LN(p_new / p_old), 9), 9) AS kl_term
      |FROM o JOIN n ON o.source = n.source
      |ORDER BY o.source""".stripMargin

  val snapshotDiffSql: String = {
    val fp = (src: String) =>
      s"('0x' || substr(md5(array_to_string(${TextOps.tokSql(src)}, ' ')), 1, 15))::BIGINT"
    s"""WITH old AS (
      |  SELECT doc_id, ${fp("text")} AS old_fp
      |  FROM documents WHERE doc_id % 5 <> 0
      |  UNION ALL
      |  SELECT doc_id + ${Planted.offsetSql(3)} AS doc_id, ${fp("text")} AS old_fp
      |  FROM documents WHERE doc_id % 13 = 0),
      |neu AS (
      |  SELECT doc_id,
      |    ${fp("CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END")}
      |      AS new_fp
      |  FROM documents),
      |j AS (
      |  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
      |    CASE WHEN o.old_fp IS NULL THEN 'added'
      |         WHEN n.new_fp IS NULL THEN 'removed'
      |         WHEN o.old_fp <> n.new_fp THEN 'changed'
      |         ELSE 'unchanged' END AS status
      |  FROM old o FULL OUTER JOIN neu n ON o.doc_id = n.doc_id)
      |SELECT status, COUNT(*) AS n,
      |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      |FROM j GROUP BY status
      |ORDER BY status""".stripMargin
  }
}
