package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k-anonymity auditing (Sweeney, "k-Anonymity: A Model for
  * Protecting Privacy", 2002) — the privacy lever the PII scrub
  * (q86) doesn't cover: scrubbing direct identifiers is useless if
  * the remaining QUASI-identifiers (location × segment × coarse
  * balance) single out individuals by combination. A release is
  * k-anonymous when every quasi-identifier combination is shared by
  * at least k records; the audit reports, for each candidate k, how
  * much of the table would need suppression or coarsening.
  *
  * Scale shape: ONE scan with a map-side partial aggregate down to
  * the quasi-identifier group sizes (the group count is bounded by
  * the QI domain, not the row count), then a second aggregation over
  * those sizes — at 100 TB the heavy exchange carries one row per QI
  * combination, and the k-sweep is conditional aggregation over that
  * small relation, never a rescan (the q140 calibration-sweep
  * shape).
  */
object Privacy {

  /** Candidate anonymity thresholds for the audit sweep. */
  val Ks: Seq[Int] = Seq(2, 5, 10, 25)

  /** Quasi-identifier: nation × market segment × account-balance
    * band (1000-unit floor — the coarsening a release would apply). */
  private def qiCols = Seq(
    col("c_nationkey").cast("long").as("nation"),
    col("c_mktsegment").as("segment"),
    floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"))

  /** q170: the k-anonymity audit — for each k, how many
    * quasi-identifier groups fall below k, how many ROWS sit in those
    * groups (re-identifiable at that k), and the violating-row share.
    * The release decision reads straight off this curve. */
  def kAnonymityAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val groups = Tables.customer(spark, sfDir)
      .select(qiCols: _*)
      .groupBy(col("nation"), col("segment"), col("bal_band"))
      .agg(count(lit(1)).as("sz"))
    // the whole k-sweep is conditional-agg columns on ONE pass over
    // the group sizes (q140 shape), unpivoted to the curve with stack
    val sweepCols = Ks.flatMap(k => Seq(
      sum(when(col("sz") < k, 1L).otherwise(0L)).as(s"gb_$k"),
      sum(when(col("sz") < k, col("sz")).otherwise(lit(0L))).as(s"rb_$k")))
    val wide = groups.agg(
      count(lit(1)).as("n_groups"),
      (sum(col("sz")).as("n_rows") +: sweepCols): _*)
    val stackExpr = s"stack(${Ks.size}, " + Ks.map(k =>
      s"CAST($k AS BIGINT), gb_$k, rb_$k").mkString(", ") +
      ") AS (k, groups_below, rows_below)"
    wide.select(col("n_groups"), col("n_rows"), expr(stackExpr))
      .select(col("k"), col("n_groups"), col("groups_below"),
        col("rows_below"),
        round(col("rows_below").cast("double") / col("n_rows"), 6)
          .as("violating_share"))
      .orderBy(col("k"))
  }

  /** Candidate diversity thresholds for the l-diversity sweep. */
  val Ls: Seq[Int] = Seq(2, 3, 4, 5)

  /** q174: the l-diversity audit (Machanavajjhala et al., "l-Diversity:
    * Privacy Beyond k-Anonymity", 2007) — k-anonymity's blind spot:
    * a QI group of 25 identical-segment customers is 25-anonymous yet
    * leaks every member's segment. A release is l-diverse when every
    * QI group carries ≥ l DISTINCT sensitive values; here the QI is
    * nation × balance band and the sensitive attribute is the market
    * segment. Same one-pass shape as q170: the heavy exchange carries
    * one row per QI group (count + distinct-sensitive), and the
    * l-sweep is conditional aggregation over that small relation. */
  def lDiversityAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val groups = Tables.customer(spark, sfDir)
      .select(col("c_nationkey").cast("long").as("nation"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"),
        col("c_mktsegment").as("segment"))
      .groupBy(col("nation"), col("bal_band"))
      .agg(count(lit(1)).as("sz"), countDistinct(col("segment")).as("div"))
    val sweepCols = Ls.flatMap(l => Seq(
      sum(when(col("div") < l, 1L).otherwise(0L)).as(s"gb_$l"),
      sum(when(col("div") < l, col("sz")).otherwise(lit(0L))).as(s"rb_$l")))
    val wide = groups.agg(
      count(lit(1)).as("n_groups"),
      (sum(col("sz")).as("n_rows") +: sweepCols): _*)
    val stackExpr = s"stack(${Ls.size}, " + Ls.map(l =>
      s"CAST($l AS BIGINT), gb_$l, rb_$l").mkString(", ") +
      ") AS (l, groups_below, rows_below)"
    wide.select(col("n_groups"), col("n_rows"), expr(stackExpr))
      .select(col("l"), col("n_groups"), col("groups_below"),
        col("rows_below"),
        round(col("rows_below").cast("double") / col("n_rows"), 6)
          .as("leaking_share"))
      .orderBy(col("l"))
  }

  /** DuckDB oracle: identical QI/sensitive derivation and sweep. */
  val lDiversityAuditSql: String = {
    val lRows = Ls.map(l => s"($l)").mkString(", ")
    s"""WITH qi AS (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
      |    CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
      |    c_mktsegment AS segment
      |  FROM customer),
      |groups AS (
      |  SELECT nation, bal_band, COUNT(*) AS sz,
      |    COUNT(DISTINCT segment) AS div
      |  FROM qi GROUP BY nation, bal_band),
      |total AS (
      |  SELECT CAST(SUM(sz) AS BIGINT) AS n_rows,
      |    COUNT(*) AS n_groups FROM groups),
      |ls(l) AS (VALUES $lRows)
      |SELECT CAST(ls.l AS BIGINT) AS l, t.n_groups,
      |  CAST(SUM(CASE WHEN g.div < ls.l THEN 1 ELSE 0 END) AS BIGINT)
      |    AS groups_below,
      |  CAST(SUM(CASE WHEN g.div < ls.l THEN g.sz ELSE 0 END) AS BIGINT)
      |    AS rows_below,
      |  ROUND(CAST(SUM(CASE WHEN g.div < ls.l THEN g.sz ELSE 0 END) AS DOUBLE)
      |    / t.n_rows, 6) AS leaking_share
      |FROM groups g CROSS JOIN ls CROSS JOIN total t
      |GROUP BY ls.l, t.n_groups, t.n_rows
      |ORDER BY l""".stripMargin
  }

  /** DuckDB oracle: identical QI derivation and sweep. */
  val kAnonymityAuditSql: String = {
    val kRows = Ks.map(k => s"($k)").mkString(", ")
    s"""WITH qi AS (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment,
      |    CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band
      |  FROM customer),
      |groups AS (
      |  SELECT nation, segment, bal_band, COUNT(*) AS sz
      |  FROM qi GROUP BY nation, segment, bal_band),
      |total AS (
      |  SELECT CAST(SUM(sz) AS BIGINT) AS n_rows,
      |    COUNT(*) AS n_groups FROM groups),
      |ks(k) AS (VALUES $kRows)
      |SELECT CAST(ks.k AS BIGINT) AS k, t.n_groups,
      |  CAST(SUM(CASE WHEN g.sz < ks.k THEN 1 ELSE 0 END) AS BIGINT)
      |    AS groups_below,
      |  CAST(SUM(CASE WHEN g.sz < ks.k THEN g.sz ELSE 0 END) AS BIGINT)
      |    AS rows_below,
      |  ROUND(CAST(SUM(CASE WHEN g.sz < ks.k THEN g.sz ELSE 0 END) AS DOUBLE)
      |    / t.n_rows, 6) AS violating_share
      |FROM groups g CROSS JOIN ks CROSS JOIN total t
      |GROUP BY ks.k, t.n_groups, t.n_rows
      |ORDER BY k""".stripMargin
  }
}
