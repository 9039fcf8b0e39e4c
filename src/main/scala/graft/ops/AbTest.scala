package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Two-proportion A/B z-test (the pooled-variance two-sample test
  * every experimentation platform runs) — the INFERENTIAL member the
  * funnel family lacks: q107/q126 measure conversion, q211 bootstraps
  * a mean's CI, but "arm B converts 1.3 points better — is that
  * noise?" is a hypothesis test on two binomial proportions:
  * z = (r₁ − r₀) / √(p̂(1−p̂)(1/n₀ + 1/n₁)) with p̂ pooled under H₀,
  * |z| > 1.96 rejecting at α = 0.05. Assignment is the deterministic
  * hash-arm split every experiment framework uses (here user_id
  * parity — the q121 split discipline); conversion = the user is an
  * ABOVE-AVERAGE purchaser (purchase count strictly above the global
  * per-user mean, decided by exact integer cross-multiplication
  * c·N > T — no float threshold; "ever purchased" saturates at the
  * fixture's density and would only ever exercise the degenerate
  * branch).
  *
  * Determinism: every input to the statistic is an integer count;
  * the closed form combines them in double with engine-identical
  * parenthesization, rounded once; a degenerate pooled variance
  * (p̂ ∈ {0, 1}) publishes NULL.
  *
  * Scale shape: per-user conversion flags partial-agg in one events
  * pass; the arm rollup is 2 rows; the test is arithmetic on one
  * row. At 100 TB this is a metadata-cost query.
  */
object AbTest {

  /** |z| threshold at α = 0.05, two-sided. */
  val ZCrit = 1.96

  /** q220: the pooled two-proportion z-test over the parity split. */
  def abTest(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.events(spark, sfDir)
      .groupBy(col("user_id")).agg(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("c"))
    val totals = counts.agg(count(lit(1)).as("nu"), sum(col("c")).as("t"))
    val users = counts.crossJoin(broadcast(totals))
      .select(pmod(col("user_id"), lit(2)).as("arm"),
        (col("c") * col("nu") > col("t")).cast("int").as("conv"))
    zTestOf(users)
  }

  /** The test over any (arm ∈ {0,1}, conv ∈ {0,1}) relation — the
    * statistic core, exposed for the spec's crafted cells. */
  private[graft] def zTestOf(users: DataFrame): DataFrame = {
    val cells = users.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(col("arm") === 0, col("conv").cast("long"))
        .otherwise(0L)).as("c0"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("arm") === 1, col("conv").cast("long"))
        .otherwise(0L)).as("c1"))
    val r0 = col("c0").cast("double") / col("n0")
    val r1 = col("c1").cast("double") / col("n1")
    val p = (col("c0") + col("c1")).cast("double") / (col("n0") + col("n1"))
    val se = sqrt(p * (lit(1.0) - p)
      * (lit(1.0) / col("n0") + lit(1.0) / col("n1")))
    val z = (r1 - r0) / se
    cells.select(
      col("n0"), col("c0"), round(r0, 6).as("rate0"),
      col("n1"), col("c1"), round(r1, 6).as("rate1"),
      round(r1 - r0, 6).as("lift"),
      when(p * (lit(1.0) - p) === 0.0, lit(null).cast("double"))
        .otherwise(round(z, 6)).as("z"),
      when(p * (lit(1.0) - p) === 0.0, lit(null).cast("boolean"))
        .otherwise(abs(z) > ZCrit).as("significant"))
  }

  val abTestSql: String =
    s"""WITH counts AS (
      |  SELECT user_id,
      |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
      |  FROM events GROUP BY user_id),
      |totals AS (SELECT COUNT(*) AS nu, SUM(c) AS t FROM counts),
      |users AS (
      |  SELECT user_id % 2 AS arm,
      |    CASE WHEN c * nu > t THEN 1 ELSE 0 END AS conv
      |  FROM counts CROSS JOIN totals),
      |cells AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
      |    CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS c0,
      |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS c1
      |  FROM users),
      |stats AS (
      |  SELECT n0, c0, n1, c1,
      |    CAST(c0 AS DOUBLE) / n0 AS r0,
      |    CAST(c1 AS DOUBLE) / n1 AS r1,
      |    CAST(c0 + c1 AS DOUBLE) / (n0 + n1) AS p
      |  FROM cells)
      |SELECT n0, c0, ROUND(r0, 6) AS rate0,
      |  n1, c1, ROUND(r1, 6) AS rate1,
      |  ROUND(r1 - r0, 6) AS lift,
      |  CASE WHEN p * (1.0 - p) = 0.0 THEN NULL
      |    ELSE ROUND((r1 - r0) / sqrt(p * (1.0 - p)
      |      * (1.0 / n0 + 1.0 / n1)), 6) END AS z,
      |  CASE WHEN p * (1.0 - p) = 0.0 THEN NULL
      |    ELSE ABS((r1 - r0) / sqrt(p * (1.0 - p)
      |      * (1.0 / n0 + 1.0 / n1))) > $ZCrit END AS significant
      |FROM stats""".stripMargin
}
