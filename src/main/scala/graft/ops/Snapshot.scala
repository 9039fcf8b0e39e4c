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
  * OLD = ids with id%5 != 0, plus retired ids (+300000 for id%13==0);
  * NEW = every current id, with text revised (' v2' suffix) for
  * id%7==0. So: id%5==0 → added, +300000 → removed, id%7==0 (and
  * id%5!=0) → changed, rest unchanged.
  */
object Snapshot {

  /** q106: snapshot diff rollup — status × count × id range. */
  def snapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val old = d.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("old_fp"))
      .unionByName(d.filter(pmod(col("doc_id"), lit(13)) === 0)
        .select((col("doc_id") + 300000).as("doc_id"),
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

  val snapshotDiffSql: String = {
    val fp = (src: String) =>
      s"('0x' || substr(md5(array_to_string(${TextOps.tokSql(src)}, ' ')), 1, 15))::BIGINT"
    s"""WITH old AS (
      |  SELECT doc_id, ${fp("text")} AS old_fp
      |  FROM documents WHERE doc_id % 5 <> 0
      |  UNION ALL
      |  SELECT doc_id + 300000 AS doc_id, ${fp("text")} AS old_fp
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
