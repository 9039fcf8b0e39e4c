package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-aware join: the salting pattern for hot keys. A skewed big
  * side gets a deterministic salt in [0, S); the small side is
  * exploded S× so every (key, salt) bucket lands in its own task.
  * Results are provably identical to the unsalted join (the oracle
  * runs the plain join) — only the shuffle distribution changes.
  *
  * At 100 TB this is the difference between one straggler task
  * holding the hot key's entire partition and S parallel tasks; AQE
  * skew-join handles moderate skew automatically, salting handles the
  * pathological single-key case (every crawl corpus has one: the
  * dominant domain).
  */
object Skew {

  val SaltBuckets = 8

  /** Generic salted equi-join: `big` (skewed) × `small` (dim). The
    * salt on the big side derives from a unique column, so it is
    * deterministic; the small side cross-joins the salt range. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltSource: Column, salts: Int = SaltBuckets): DataFrame = {
    val saltedBig = big.withColumn("_salt", pmod(saltSource, lit(salts)))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Demo query: events with a planted hot key (a third of all
    * traffic folded onto user 0 — the "dominant domain" shape) joined
    * to a per-user dim table, salted, then aggregated. */
  def saltedHotKeyJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .withColumn("k",
        when(pmod(col("user_id"), lit(3)) === 0, lit(0L))
          .otherwise(col("user_id")))
    val dim = Tables.events(spark, sfDir)
      .select(when(pmod(col("user_id"), lit(3)) === 0, lit(0L))
        .otherwise(col("user_id")).as("k")).distinct()
      .withColumn("cohort",
        when(col("k") === 0, lit("hot")).otherwise(
          when(pmod(col("k"), lit(2)) === 0, lit("even")).otherwise(lit("odd"))))
    saltedJoin(e, dim, "k", col("event_id"))
      .groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("k")).as("n_keys"))
      .orderBy(col("cohort"))
  }

  /** Oracle is the PLAIN join — proving the salted plan is a pure
    * physical rewrite. */
  val saltedHotKeyJoinSql: String =
    """WITH e AS (
      |  SELECT CASE WHEN user_id % 3 = 0 THEN 0 ELSE user_id END AS k
      |  FROM events),
      |dim AS (
      |  SELECT k, CASE WHEN k = 0 THEN 'hot'
      |                 WHEN k % 2 = 0 THEN 'even' ELSE 'odd' END AS cohort
      |  FROM (SELECT DISTINCT k FROM e))
      |SELECT cohort, COUNT(*) AS n_events, COUNT(DISTINCT e.k) AS n_keys
      |FROM e JOIN dim ON e.k = dim.k
      |GROUP BY cohort ORDER BY cohort""".stripMargin
}
