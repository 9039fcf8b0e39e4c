package graft.ops

import graft.Tables
import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K-fold cross-validation of the q166 seed-corpus NB classifier —
  * the train/eval hygiene step between "trained a filter" (q166) and
  * "trusted its AUC" (q185): q166 scores the documents it trained
  * on, which flatters any model; CV scores every document under a
  * model that NEVER saw it, which is the number a pipeline may
  * actually act on (Stone 1974; standard practice everywhere a
  * learned filter gates a corpus).
  *
  * The scale trick is LEAVE-FOLD-OUT BY SUBTRACTION: train K models
  * in ONE counting pass by keeping (fold, class, bin) counts and
  * deriving fold f's training counts as totals − fold_f. No per-fold
  * rescan, no K training jobs — the K models materialize as one
  * K×2×[[Bayes.Bins]] relation (a few KB, broadcast), and scoring
  * joins each document's tokens to ITS OWN fold's held-out weights.
  * At 100 TB: exactly two corpus scans (count + score), identical to
  * the single-model q166 — K is free.
  *
  * Determinism: the q166/q139 discipline — 9-decimal rounding at the
  * log, DECIMAL(28,12) per-doc sums, 6-decimal publish.
  */
object CrossVal {

  /** Fold count; fold assignment is content-stable (doc_id mod K). */
  val K = 4

  /** q188: per-fold held-out keep rate, mean LLR, and accuracy
    * against the seed labels — the cross-validated report card of
    * the trained quality filter. */
  def nbCrossVal(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        pmod(col("doc_id"), lit(K.toLong)).as("fold"),
        col("source").isin(Bayes.CuratedSources: _*).as("curated"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      .withColumn("bin", pmod(TextOps.hash60(col("tok")), lit(Bayes.Bins)))

    // ONE counting pass: (fold, curated, bin) → cnt
    val foldCounts = toks.groupBy(col("fold"), col("curated"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    // full K×2×Bins grid so unseen cells carry the smoothing floor
    val grid = spark.range(K).select(col("id").as("fold"))
      .crossJoin(spark.range(Bayes.Bins).select(col("id").as("bin")))
      .crossJoin(broadcast(Seq(true, false).toDF("curated")))
    val full = grid.join(foldCounts, Seq("fold", "curated", "bin"), "left")
      .na.fill(0L, Seq("cnt"))
    // totals over ALL folds per (curated, bin); fold f's TRAINING
    // count = total − own-fold count (leave-fold-out by subtraction)
    val totals = full.groupBy(col("curated"), col("bin"))
      .agg(sum(col("cnt")).as("cnt_all"))
    val looCounts = full.join(broadcast(totals), Seq("curated", "bin"))
      .select(col("fold"), col("curated"), col("bin"),
        (col("cnt_all") - col("cnt")).as("cnt"))
    val looTotals = looCounts.groupBy(col("fold"), col("curated"))
      .agg(sum(col("cnt")).cast("double").as("total"))
    val model = looCounts.join(broadcast(looTotals), Seq("fold", "curated"))
      .select(col("fold"), col("curated"), col("bin"),
        round(log((col("cnt").cast("double") + 1.0)
          / (col("total") + lit(Bayes.Bins.toDouble))), 9).as("lp"))
    val weights = model.groupBy(col("fold"), col("bin")).agg(
      (sum(when(col("curated"), col("lp")).otherwise(lit(0.0)))
        - sum(when(!col("curated"), col("lp")).otherwise(lit(0.0)))).as("w"))

    // scoring pass: each token joins its OWN fold's held-out weights
    val perDoc = toks
      .select(col("doc_id"), col("fold"), col("curated"), col("bin"))
      .join(broadcast(weights), Seq("fold", "bin"))
      .groupBy(col("fold"), col("curated"), col("doc_id"))
      .agg(round(sum(col("w").cast("decimal(28,12)")).cast("double")
        / count(lit(1)), 6).as("llr"))
    perDoc.groupBy(col("fold")).agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("llr") > 0.0, 1L).otherwise(0L)).as("n_kept"),
      round(sum(when(col("llr") > 0.0, 1L).otherwise(0L)).cast("double")
        / count(lit(1)), 6).as("keep_rate"),
      round(sum(col("llr").cast("decimal(28,6)")).cast("double")
        / count(lit(1)), 6).as("avg_llr"),
      round(sum(when((col("llr") > 0.0) === col("curated"), 1L)
        .otherwise(0L)).cast("double") / count(lit(1)), 6).as("accuracy"))
      .orderBy(col("fold"))
  }

  /** DuckDB oracle: the same LOO-by-subtraction restated CTE-for-CTE
    * (tokenizer/hash renderings single-sourced). */
  val nbCrossValSql: String = {
    val tokSql = TextOps.tokSql()
    val curatedIn = Bayes.CuratedSources.map(s => s"'$s'").mkString(", ")
    s"""WITH raw_toks AS (
      |  SELECT doc_id, doc_id % $K AS fold,
      |    source IN ($curatedIn) AS curated,
      |    unnest($tokSql) AS tok
      |  FROM documents),
      |toks AS (
      |  SELECT doc_id, fold, curated,
      |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % ${Bayes.Bins} AS bin
      |  FROM raw_toks),
      |fold_counts AS (
      |  SELECT fold, curated, bin, COUNT(*) AS cnt
      |  FROM toks GROUP BY fold, curated, bin),
      |grid AS (
      |  SELECT f.range AS fold, b.range AS bin, g.curated
      |  FROM range($K) f CROSS JOIN range(${Bayes.Bins}) b
      |  CROSS JOIN (VALUES (TRUE), (FALSE)) g(curated)),
      |full_counts AS (
      |  SELECT g.fold, g.curated, g.bin, COALESCE(c.cnt, 0) AS cnt
      |  FROM grid g LEFT JOIN fold_counts c
      |    ON g.fold = c.fold AND g.curated = c.curated AND g.bin = c.bin),
      |totals AS (
      |  SELECT curated, bin, SUM(cnt) AS cnt_all
      |  FROM full_counts GROUP BY curated, bin),
      |loo_counts AS (
      |  SELECT f.fold, f.curated, f.bin, t.cnt_all - f.cnt AS cnt
      |  FROM full_counts f JOIN totals t
      |    ON f.curated = t.curated AND f.bin = t.bin),
      |loo_totals AS (
      |  SELECT fold, curated, CAST(SUM(cnt) AS DOUBLE) AS total
      |  FROM loo_counts GROUP BY fold, curated),
      |model AS (
      |  SELECT c.fold, c.curated, c.bin,
      |    ROUND(ln((CAST(c.cnt AS DOUBLE) + 1.0)
      |      / (t.total + ${Bayes.Bins}.0)), 9) AS lp
      |  FROM loo_counts c JOIN loo_totals t
      |    ON c.fold = t.fold AND c.curated = t.curated),
      |weights AS (
      |  SELECT fold, bin,
      |    SUM(CASE WHEN curated THEN lp ELSE 0.0 END)
      |      - SUM(CASE WHEN NOT curated THEN lp ELSE 0.0 END) AS w
      |  FROM model GROUP BY fold, bin),
      |perdoc AS (
      |  SELECT t.fold, t.curated, t.doc_id,
      |    ROUND(CAST(SUM(CAST(w.w AS DECIMAL(28,12))) AS DOUBLE)
      |      / COUNT(*), 6) AS llr
      |  FROM toks t JOIN weights w ON t.fold = w.fold AND t.bin = w.bin
      |  GROUP BY t.fold, t.curated, t.doc_id)
      |SELECT fold, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN llr > 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  ROUND(CAST(SUM(CASE WHEN llr > 0.0 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / COUNT(*), 6) AS keep_rate,
      |  ROUND(CAST(SUM(CAST(llr AS DECIMAL(28,6))) AS DOUBLE)
      |    / COUNT(*), 6) AS avg_llr,
      |  ROUND(CAST(SUM(CASE WHEN (llr > 0.0) = curated THEN 1 ELSE 0 END)
      |    AS DOUBLE) / COUNT(*), 6) AS accuracy
      |FROM perdoc GROUP BY fold ORDER BY fold""".stripMargin
  }
}
