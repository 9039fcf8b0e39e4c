package graft.ops

import graft.Tables
import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trained model-based quality filtering — the CCNet/fastText-style
  * seed-corpus classifier (Wenzek et al., "CCNet: Extracting High
  * Quality Monolingual Datasets from Web Crawl Data", LREC 2020): a
  * multinomial Naive Bayes model is TRAINED on seed labels (curated
  * sources vs general crawl) and every document is scored by its
  * per-token log-likelihood ratio. Complements q84's fixed-weight
  * heuristic classifier: here the weights come out of the corpus
  * itself, which is how production pipelines bootstrap quality
  * filters when hand-written rules run out.
  *
  * Determinism across engines follows the q139 (perplexity-buckets)
  * discipline: per-bin log-probabilities are rounded to 9 decimals
  * the moment they are computed, per-document sums run in exact
  * DECIMAL(28,12) (order-independent), and published doubles are
  * rounded to 6.
  *
  * Scale shape: the vocabulary NEVER materializes — tokens hash into
  * [[Bins]] buckets, so the trained model is a fixed 2×[[Bins]]-row
  * relation regardless of corpus size (broadcast to the scorers).
  * Training is one codegen'd scan with a map-side partial agg down to
  * ≤ 2×[[Bins]] rows; scoring is a second scan where the broadcast
  * bin-weight join happens BEFORE the per-document aggregation, and
  * because a document's tokens never leave its input partition the
  * map-side combine collapses them to one partial row per document
  * ahead of the exchange. At 100 TB: two corpus scans, shuffles carry
  * per-document decimals, the model is a few KB.
  */
object Bayes {

  /** Hashed feature bins. 256 keeps the model broadcast-trivial and
    * collision smoothing acts like feature bucketing (Weinberger et
    * al., "Feature Hashing for Large Scale Multitask Learning"). */
  val Bins = 256

  /** Seed positive class: the curated sources. Deterministic stand-in
    * for "Wikipedia-like" reference data in the CCNet recipe. */
  val CuratedSources: Seq[String] =
    Seq("src0", "src1", "src2", "src3", "src4")

  private def binCol = pmod(TextOps.hash60(col("tok")), lit(Bins))

  /** The trained model: for each (curated?, bin) the Laplace-smoothed
    * log P(bin | class), rounded to 9 — the full 2×[[Bins]] grid, so
    * unseen bins carry the smoothing floor instead of vanishing. */
  private[graft] def model(spark: SparkSession, toks: DataFrame): DataFrame = {
    import spark.implicits._
    val counts = toks.groupBy(col("curated"), binCol.as("bin"))
      .agg(count(lit(1)).as("cnt"))
    val grid = spark.range(Bins).select(col("id").as("bin"))
      .crossJoin(broadcast(Seq(true, false).toDF("curated")))
    val full = grid.join(counts, Seq("curated", "bin"), "left")
      .na.fill(0L, Seq("cnt"))
    val totals = full.groupBy(col("curated"))
      .agg(sum(col("cnt")).cast("double").as("total"))
    full.join(broadcast(totals), Seq("curated"))
      .select(col("curated"), col("bin"),
        round(log((col("cnt").cast("double") + 1.0)
          / (col("total") + lit(Bins.toDouble))), 9).as("lp"))
  }

  /** Per-doc (source, doc_id, llr) under the trained model — the
    * scoring relation shared by q166's keep curve and q215's
    * inter-classifier agreement. */
  private[graft] def perDocLlr(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val toks = docs
      .select(col("doc_id"), col("source"),
        col("source").isin(CuratedSources: _*).as("curated"),
        explode(TextOps.tokens(col("text"))).as("tok"))
    val m = model(spark, toks)
    // bin weight = lp_pos − lp_neg: exact difference of two
    // 9-decimal-rounded doubles, identical in both engines
    val weights = m.groupBy(col("bin")).agg(
      (sum(when(col("curated"), col("lp")).otherwise(lit(0.0)))
        - sum(when(!col("curated"), col("lp")).otherwise(lit(0.0)))).as("w"))
    toks
      .select(col("doc_id"), col("source"), binCol.as("bin"))
      .join(broadcast(weights), Seq("bin"))
      .groupBy(col("source"), col("doc_id"))
      .agg(round(sum(col("w").cast("decimal(28,12)")).cast("double")
        / count(lit(1)), 6).as("llr"))
  }

  /** q166: train the seed-corpus NB model, score every document by
    * its average per-token log-likelihood ratio, and publish the
    * per-source keep curve (llr > 0 ⇒ "curated-like"). This is the
    * report a pipeline reads before wiring the trained filter into
    * the q105 funnel. */
  def nbQualityFilter(spark: SparkSession, sfDir: String): DataFrame =
    perDocLlr(spark, sfDir).groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("llr") > 0.0, 1L).otherwise(0L)).as("n_kept"),
      round(sum(when(col("llr") > 0.0, 1L).otherwise(0L)).cast("double")
        / count(lit(1)), 6).as("keep_rate"),
      round(sum(col("llr").cast("decimal(28,6)")).cast("double")
        / count(lit(1)), 6).as("avg_llr"))
      .orderBy(col("source"))

  /** The train+score CTE chain over an arbitrary (doc_id, source,
    * text) relation rendering `rel`, ending in
    * `perdoc(doc_id, source, n_toks, llr)` — single-sourced for the
    * q200 build-manifest oracle, which trains on the DEDUPED corpus. */
  private[ops] def nbCtesFor(rel: String): String = {
    val tokSql = TextOps.tokSql()
    val curatedIn = CuratedSources.map(s => s"'$s'").mkString(", ")
    s"""raw_toks AS (
      |  SELECT doc_id, source, source IN ($curatedIn) AS curated,
      |    unnest($tokSql) AS tok
      |  FROM $rel),
      |toks AS (
      |  SELECT doc_id, source, curated,
      |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % $Bins AS bin
      |  FROM raw_toks),
      |counts AS (
      |  SELECT curated, bin, COUNT(*) AS cnt FROM toks GROUP BY curated, bin),
      |grid AS (
      |  SELECT g.curated, r.range AS bin
      |  FROM range($Bins) r CROSS JOIN (VALUES (TRUE), (FALSE)) g(curated)),
      |full_counts AS (
      |  SELECT g.curated, g.bin, COALESCE(c.cnt, 0) AS cnt
      |  FROM grid g LEFT JOIN counts c
      |    ON g.curated = c.curated AND g.bin = c.bin),
      |totals AS (
      |  SELECT curated, CAST(SUM(cnt) AS DOUBLE) AS total
      |  FROM full_counts GROUP BY curated),
      |model AS (
      |  SELECT f.curated, f.bin,
      |    ROUND(ln((CAST(f.cnt AS DOUBLE) + 1.0)
      |      / (t.total + ${Bins}.0)), 9) AS lp
      |  FROM full_counts f JOIN totals t ON f.curated = t.curated),
      |weights AS (
      |  SELECT bin,
      |    SUM(CASE WHEN curated THEN lp ELSE 0.0 END)
      |      - SUM(CASE WHEN NOT curated THEN lp ELSE 0.0 END) AS w
      |  FROM model GROUP BY bin),
      |perdoc AS (
      |  SELECT t.source, t.doc_id, COUNT(*) AS n_toks,
      |    ROUND(CAST(SUM(CAST(w.w AS DECIMAL(28,12))) AS DOUBLE)
      |      / COUNT(*), 6) AS llr
      |  FROM toks t JOIN weights w ON t.bin = w.bin
      |  GROUP BY t.source, t.doc_id)""".stripMargin
  }

  /** DuckDB oracle: the same training + scoring restated in SQL —
    * single-sourced tokenizer/hash renderings, same rounding points,
    * same exact-decimal sums. */
  val nbQualityFilterSql: String = {
    val tokSql = TextOps.tokSql()
    val curatedIn = CuratedSources.map(s => s"'$s'").mkString(", ")
    s"""WITH raw_toks AS (
      |  SELECT doc_id, source, source IN ($curatedIn) AS curated,
      |    unnest($tokSql) AS tok
      |  FROM documents),
      |toks AS (
      |  SELECT doc_id, source, curated,
      |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % $Bins AS bin
      |  FROM raw_toks),
      |counts AS (
      |  SELECT curated, bin, COUNT(*) AS cnt FROM toks GROUP BY curated, bin),
      |grid AS (
      |  SELECT g.curated, r.range AS bin
      |  FROM range($Bins) r CROSS JOIN (VALUES (TRUE), (FALSE)) g(curated)),
      |full_counts AS (
      |  SELECT g.curated, g.bin, COALESCE(c.cnt, 0) AS cnt
      |  FROM grid g LEFT JOIN counts c
      |    ON g.curated = c.curated AND g.bin = c.bin),
      |totals AS (
      |  SELECT curated, CAST(SUM(cnt) AS DOUBLE) AS total
      |  FROM full_counts GROUP BY curated),
      |model AS (
      |  SELECT f.curated, f.bin,
      |    ROUND(ln((CAST(f.cnt AS DOUBLE) + 1.0)
      |      / (t.total + ${Bins}.0)), 9) AS lp
      |  FROM full_counts f JOIN totals t ON f.curated = t.curated),
      |weights AS (
      |  SELECT bin,
      |    SUM(CASE WHEN curated THEN lp ELSE 0.0 END)
      |      - SUM(CASE WHEN NOT curated THEN lp ELSE 0.0 END) AS w
      |  FROM model GROUP BY bin),
      |perdoc AS (
      |  SELECT t.source, t.doc_id,
      |    ROUND(CAST(SUM(CAST(w.w AS DECIMAL(28,12))) AS DOUBLE)
      |      / COUNT(*), 6) AS llr
      |  FROM toks t JOIN weights w ON t.bin = w.bin
      |  GROUP BY t.source, t.doc_id)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN llr > 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  ROUND(CAST(SUM(CASE WHEN llr > 0.0 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / COUNT(*), 6) AS keep_rate,
      |  ROUND(CAST(SUM(CAST(llr AS DECIMAL(28,6))) AS DOUBLE)
      |    / COUNT(*), 6) AS avg_llr
      |FROM perdoc GROUP BY source ORDER BY source""".stripMargin
  }
}
