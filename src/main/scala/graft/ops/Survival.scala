package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation (Kaplan & Meier 1958 — THE
  * nonparametric survival curve) over user activity lifetimes: the
  * retention family reports fixed-window rates (q108 cohorts, q128
  * DAU/WAU), but "what fraction of users survive past day t" under
  * RIGHT-CENSORING — users still active when the observation window
  * closes, whose lifetimes are only known to exceed their observed
  * span — needs the KM product-limit estimator: S(t) = Π_{tᵢ ≤ t}
  * (1 − dᵢ/nᵢ), with nᵢ the at-risk count just before tᵢ. Naively
  * dropping censored users biases survival DOWN; counting them as
  * churned biases it UP; KM is the unbiased middle and the standard
  * every analytics suite ships.
  *
  * Lifetime model (key-derived, restated in the oracle): activity is
  * the PURCHASE stream (the rare signal — the dense event stream
  * touches every user every day, which would make every lifetime
  * censored and the death path vacuous); a user's span = first → last
  * purchase in whole days, churned if the last purchase precedes the
  * corpus horizon by more than [[ChurnGapDays]] days, censored
  * otherwise. Both estimator paths are genuinely exercised at the
  * test SFs (spec-pinned).
  *
  * Determinism: dᵢ/nᵢ are exact integer counts; the product-limit
  * accumulates as Σ ln(1 − dᵢ/nᵢ) with each ln rounded to 9 (q69
  * libm parity; a dᵢ = nᵢ terminal point would be ln 0 — surfaced as
  * survival 0 via an explicit guard, identically in both engines),
  * exponentiated once and rounded at publish.
  *
  * Scale shape: per-user spans are one partial-agg'd pass over
  * events; the KM table groups by DISTINCT duration (bounded by the
  * observation window in days — the q185 bounded-relation argument),
  * and the at-risk/cumulative sums ride that bounded relation in one
  * ordered window. |durations| rows publish.
  */
object Survival {

  /** A user whose last purchase is further than this from the
    * horizon has churned; closer, and the lifetime is
    * right-censored. */
  val ChurnGapDays = 2

  /** q219: the Kaplan–Meier survival table over user purchase
    * lifetimes. */
  def kaplanMeier(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
    val horizon = ev.agg(max(to_date(col("ts"))).as("h"))
    val spans = ev.groupBy(col("user_id")).agg(
      to_date(min(col("ts"))).as("first_day"),
      to_date(max(col("ts"))).as("last_day"))
      .crossJoin(broadcast(horizon))
      .select(col("user_id"),
        datediff(col("last_day"), col("first_day")).as("duration"),
        (datediff(col("h"), col("last_day")) > ChurnGapDays).as("churned"))
    kmOf(spans)
  }

  /** The KM table of a (duration, churned) span relation — the
    * estimator core, exposed for the spec's closed-form cohorts. */
  private[graft] def kmOf(spans: DataFrame): DataFrame = {
    // KM table over distinct durations: deaths/censored at t, then
    // at-risk = total − (all spans that ENDED before t)
    val byDur = spans.groupBy(col("duration")).agg(
      sum(when(col("churned"), 1L).otherwise(0L)).as("d"),
      sum(when(!col("churned"), 1L).otherwise(0L)).as("c"))
    val ordered = Window.orderBy(col("duration"))
    val run = ordered.rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy()
    val km = byDur
      .withColumn("ended_before",
        coalesce(sum(col("d") + col("c")).over(run), lit(0L)))
      .withColumn("total", sum(col("d") + col("c")).over(all))
      .withColumn("n_risk", col("total") - col("ended_before"))
      // Σ ln(1 − d/n) with per-term round-9; d = n ⇒ survival hits 0
      .withColumn("lnterm",
        when(col("d") === col("n_risk"), lit(null).cast("double"))
          .otherwise(round(log(lit(1.0)
            - col("d").cast("double") / col("n_risk")), 9)))
      .withColumn("lnsum", sum(col("lnterm").cast("decimal(28,9)"))
        .over(ordered.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("hit_zero", max(when(col("d") === col("n_risk"), 1)
        .otherwise(0)).over(ordered.rowsBetween(Window.unboundedPreceding, 0)))
    km.select(col("duration"), col("n_risk"),
        col("d").as("n_churned"), col("c").as("n_censored"),
        when(col("hit_zero") === 1, lit(0.0))
          .otherwise(round(exp(col("lnsum").cast("double")), 6))
          .as("survival"))
      .orderBy(col("duration"))
  }

  val kaplanMeierSql: String =
    s"""WITH p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
      |spans AS (
      |  SELECT user_id,
      |    date_diff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE)) AS duration,
      |    date_diff('day', CAST(MAX(ts) AS DATE),
      |      (SELECT CAST(MAX(ts) AS DATE) FROM p)) > $ChurnGapDays AS churned
      |  FROM p GROUP BY user_id),
      |bydur AS (
      |  SELECT duration,
      |    CAST(SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS d,
      |    CAST(SUM(CASE WHEN NOT churned THEN 1 ELSE 0 END) AS BIGINT) AS c
      |  FROM spans GROUP BY duration),
      |km AS (
      |  SELECT duration, d, c,
      |    COALESCE(SUM(d + c) OVER (ORDER BY duration
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ended_before,
      |    SUM(d + c) OVER () AS total
      |  FROM bydur),
      |terms AS (
      |  SELECT duration, d, c, total - ended_before AS n_risk,
      |    CASE WHEN d = total - ended_before THEN NULL
      |      ELSE ROUND(ln(1.0 - CAST(d AS DOUBLE) / (total - ended_before)), 9)
      |    END AS lnterm,
      |    CASE WHEN d = total - ended_before THEN 1 ELSE 0 END AS zero
      |  FROM km),
      |acc AS (
      |  SELECT duration, n_risk, d, c,
      |    SUM(CAST(lnterm AS DECIMAL(28,9))) OVER (ORDER BY duration
      |      ROWS UNBOUNDED PRECEDING) AS lnsum,
      |    MAX(zero) OVER (ORDER BY duration ROWS UNBOUNDED PRECEDING) AS hit_zero
      |  FROM terms)
      |SELECT duration, CAST(n_risk AS BIGINT) AS n_risk,
      |  d AS n_churned, c AS n_censored,
      |  CASE WHEN hit_zero = 1 THEN 0.0
      |    ELSE ROUND(exp(CAST(lnsum AS DOUBLE)), 6) END AS survival
      |FROM acc ORDER BY duration""".stripMargin
}
