package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Differentially-private count release (Dwork et al., "Calibrating
  * Noise to Sensitivity in Private Data Analysis", 2006) — the
  * privacy family's RELEASE mechanism: q170/q174 AUDIT a table for
  * re-identification risk; this query publishes group counts with
  * ε-calibrated Laplace noise so the release itself carries the
  * guarantee. Count queries have sensitivity 1, so noise ~
  * Laplace(1/ε) per released cell.
  *
  * Determinism: production DP draws noise from a CSPRNG; a
  * cross-engine-verifiable query needs a SEEDED draw, so the uniform
  * comes from md5(group-key ‖ ε) (52 hash bits → u ∈ [0,1)) pushed
  * through the Laplace inverse CDF — the exact mechanism, a
  * deterministic seed. The ln is rounded to 9 decimals (the q69
  * libm-parity discipline) before the release rounds to 3.
  *
  * Scale shape: one partial-agg'd pass to group counts, then the
  * noise is a per-ROW scalar expression over the (tiny) group
  * relation and the ε-sweep an explode over it — no rescan, no
  * shuffle beyond the count's own. */
object DpRelease {

  /** Privacy budgets under audit. */
  val Epsilons: Seq[String] = Seq("0.1", "1.0")

  private[ops] val Denom = math.pow(2.0, 52)

  /** Seeded uniform in [0,1): 13 hex chars = 52 bits of the key's
    * md5. */
  private[ops] def seededU(key: Column): Column =
    conv(substring(md5(key), 1, 13), 16, 10).cast("long") / lit(Denom)

  /** q179: per-(nation, segment) customer counts released under each
    * ε — released = count + Laplace(1/ε) inverse-CDF noise from the
    * seeded uniform. */
  def dpCountRelease(spark: SparkSession, sfDir: String): DataFrame = {
    val groups = Tables.customer(spark, sfDir)
      .groupBy(col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"))
    val swept = groups.select(col("nation"), col("segment"), col("n"),
      explode(array(Epsilons.map(lit): _*)).as("eps"))
    val u = seededU(concat(col("nation"), lit("|"), col("segment"),
      lit("|"), col("eps")))
    val b = lit(1.0) / col("eps").cast("double")
    val noise = round(-b * signum(u - 0.5) * log(lit(1.0)
      - lit(2.0) * abs(u - 0.5)), 9)
    swept.select(col("eps"), col("nation"), col("segment"),
        round(col("n") + noise, 3).as("released"))
      .orderBy(col("eps"), col("nation"), col("segment"))
  }

  /** DuckDB oracle: identical seed, inverse CDF, and rounding
    * ladder. */
  val dpCountReleaseSql: String = {
    val epsRows = Epsilons.map(e => s"('$e')").mkString(", ")
    s"""WITH groups AS (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
      |    c_mktsegment AS segment, COUNT(*) AS n
      |  FROM customer GROUP BY 1, 2),
      |eps(eps) AS (VALUES $epsRows),
      |seeded AS (
      |  SELECT nation, segment, n, eps,
      |    ('0x' || substr(md5(nation || '|' || segment || '|' || eps),
      |      1, 13))::BIGINT / ${Denom.toLong}.0 AS u
      |  FROM groups CROSS JOIN eps)
      |SELECT eps, nation, segment,
      |  ROUND(n + ROUND(-(1.0 / eps::DOUBLE) * SIGN(u - 0.5)
      |    * LN(1.0 - 2.0 * ABS(u - 0.5)), 9), 3) AS released
      |FROM seeded
      |ORDER BY eps, nation, segment""".stripMargin
  }
}
