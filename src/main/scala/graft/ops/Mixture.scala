package graft.ops

import graft.Tables
import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-mixture budgeting — the step between corpus curation and
  * training: given per-domain token supplies, a global token budget,
  * and a temperature that flattens the natural distribution (the
  * multilingual-training reweighting, p_d ∝ n_d^α with α < 1), decide
  * how many tokens to take from each domain.
  *
  * The allocation is EXACT water-filling with supply caps: find the
  * water level λ such that Σ_d min(n_d, λ·w_d) = B (w_d = n_d^α).
  * Small domains get boosted by the temperature until their whole
  * supply is consumed (capped); the rest share the remaining budget
  * in proportion to their flattened weights. λ has a closed form per
  * "number of capped domains", and the right count is found with ONE
  * window pass over domains ordered by saturation ratio n_d/w_d —
  * no iteration, no driver loop.
  *
  * Scale: everything after the first groupBy runs on ONE ROW PER
  * DOMAIN (thousands at 100 TB, not billions); the only data-sized
  * operation is the token-count aggregation, which is a partial-agg
  * shuffle on the domain key. The domain-level window is a single
  * tiny exchange.
  *
  * Cross-engine float story: α = 0.5 so the weight is sqrt (IEEE
  * correctly rounded in both engines, unlike pow); weights are
  * rounded to 9 decimals and accumulated as DECIMAL(28,9) so every
  * running sum is exact and order-independent; λ candidates divide
  * one double by one double, so both engines branch identically.
  */
object Mixture {

  /** Fraction of the total corpus that fits the training budget. */
  val BudgetFrac = 0.95

  /** q93: per-domain token allocation under a 0.95·total budget with
    * sqrt-temperature flattening. `capped` marks domains whose whole
    * supply is consumed; `util` is allocation/supply. */
  def tokenBudget(spark: SparkSession, sfDir: String): DataFrame = {
    val supply = Tables.documents(spark, sfDir)
      .groupBy(col("source"))
      .agg(sum(TextOps.tokenCount(col("text")).cast("long")).as("n_tokens"))
      .withColumn("w", round(sqrt(col("n_tokens").cast("double")), 9))
      .withColumn("w_dec", col("w").cast("decimal(28,9)"))
      .withColumn("r", col("n_tokens").cast("double") / col("w"))

    // global scalars (total supply/weight → budget) via one aggregate
    // broadcast back — not a window; the only window left is the
    // ordered cum-sum over DOMAINS, whose cardinality is thousands at
    // 100 TB, not data-sized
    val totals = supply.agg(
      sum(col("n_tokens")).as("tot_n"),
      sum(col("w_dec")).as("tot_w"))
    val byRatio = Window.orderBy(col("r"), col("source"))
    val staged = supply.crossJoin(broadcast(totals))
      .withColumn("cum_n", sum(col("n_tokens")).over(byRatio))
      .withColumn("cum_w", sum(col("w_dec")).over(byRatio))
      .withColumn("b", col("tot_n").cast("double") * lit(BudgetFrac))
      // λ if every domain ordered ≤ this row is capped; the LAST row's
      // denominator is exactly 0 (all weight consumed) → null it out,
      // the feasibility filter drops it in both engines
      .withColumn("lam_k",
        when((col("tot_w") - col("cum_w")).cast("double") === 0.0, lit(null))
          .otherwise((col("b") - col("cum_n").cast("double")) /
            (col("tot_w") - col("cum_w")).cast("double")))
      .withColumn("r_next", lead(col("r"), 1).over(byRatio))
      .localCheckpoint()

    // the water level: the unique feasible candidate — k capped
    // domains is consistent iff the k-th ratio is under λ_k and the
    // (k+1)-th is over it; k = 0 (nobody capped) iff B/W clears the
    // smallest ratio
    val lam0 = staged
      .agg((min(col("b")) / min(col("tot_w")).cast("double")).as("lam"),
        min(col("r")).as("r1"))
      .where(col("lam") < col("r1"))
      .select(col("lam"))
    val lamK = staged
      .where(col("r") <= col("lam_k") &&
        (col("r_next").isNull || col("lam_k") < col("r_next")))
      .agg(min(col("lam_k")).as("lam"))
      .where(col("lam").isNotNull)
    // the feasible candidate is mathematically unique; MIN over the
    // union (vs LIMIT 1) keeps the pick order-independent even at a
    // float boundary where both branches fire
    val lam = lam0.unionByName(lamK).agg(min(col("lam")).as("lam"))

    supply.crossJoin(broadcast(lam))
      .withColumn("alloc",
        least(col("n_tokens").cast("double"), col("lam") * col("w")))
      .select(
        col("source"),
        col("n_tokens"),
        round(col("alloc"), 6).as("alloc_tokens"),
        (col("r") <= col("lam")).as("capped"),
        round(col("alloc") / col("n_tokens").cast("double"), 6).as("util"))
      .orderBy(col("source"))
  }

  val tokenBudgetSql: String = {
    val tok = TextOps.tokSql()
    s"""WITH supply AS (
      |  SELECT source,
      |    CAST(SUM(len($tok)) AS BIGINT) AS n_tokens,
      |    ROUND(SQRT(CAST(SUM(len($tok)) AS DOUBLE)), 9) AS w
      |  FROM documents GROUP BY source),
      |staged AS (
      |  SELECT source, n_tokens, w,
      |    CAST(n_tokens AS DOUBLE) / w AS r,
      |    SUM(n_tokens) OVER (ORDER BY CAST(n_tokens AS DOUBLE) / w, source) AS cum_n,
      |    SUM(CAST(w AS DECIMAL(28,9))) OVER (ORDER BY CAST(n_tokens AS DOUBLE) / w, source) AS cum_w,
      |    SUM(n_tokens) OVER () AS tot_n,
      |    SUM(CAST(w AS DECIMAL(28,9))) OVER () AS tot_w,
      |    LEAD(CAST(n_tokens AS DOUBLE) / w, 1) OVER (ORDER BY CAST(n_tokens AS DOUBLE) / w, source) AS r_next
      |  FROM supply),
      |with_lam AS (
      |  SELECT *,
      |    CAST(tot_n AS DOUBLE) * $BudgetFrac AS b,
      |    CASE WHEN CAST(tot_w - cum_w AS DOUBLE) = 0 THEN NULL
      |         ELSE (CAST(tot_n AS DOUBLE) * $BudgetFrac - CAST(cum_n AS DOUBLE))
      |              / CAST(tot_w - cum_w AS DOUBLE) END AS lam_k
      |  FROM staged),
      |lam0 AS (
      |  SELECT b / CAST(tot_w AS DOUBLE) AS lam
      |  FROM with_lam
      |  WHERE b / CAST(tot_w AS DOUBLE) < (SELECT MIN(r) FROM with_lam)
      |  LIMIT 1),
      |lamk AS (
      |  SELECT MIN(lam_k) AS lam FROM with_lam
      |  WHERE r <= lam_k AND (r_next IS NULL OR lam_k < r_next)),
      |lam AS (
      |  SELECT MIN(lam) AS lam FROM (
      |    SELECT lam FROM lam0
      |    UNION ALL
      |    SELECT lam FROM lamk WHERE lam IS NOT NULL))
      |SELECT s.source, s.n_tokens,
      |  ROUND(LEAST(CAST(s.n_tokens AS DOUBLE), l.lam * s.w), 6) AS alloc_tokens,
      |  (CAST(s.n_tokens AS DOUBLE) / s.w <= l.lam) AS capped,
      |  ROUND(LEAST(CAST(s.n_tokens AS DOUBLE), l.lam * s.w)
      |        / CAST(s.n_tokens AS DOUBLE), 6) AS util
      |FROM supply s CROSS JOIN lam l
      |ORDER BY s.source""".stripMargin
  }
}
