package graft.ops

import graft.Tables
import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The training-data BUILD as one declared dataflow — the capstone
  * that proves the pipeline stages COMPOSE: exact dedup → trained
  * quality gate → temperature mixture → shard assignment, ending in
  * the per-(source, shard) manifest a training job actually mounts.
  * Every stage exists (and is proven) as its own query — q22 dedup,
  * q166 NB filter, q93 mixture discipline, q148 sharding — but a
  * user of this engine runs them as ONE build, and composition is
  * where silent contract mismatches live (training the filter on
  * pre-dedup data, sharding dropped docs back in, weighting sources
  * by raw instead of kept supply). The oracle chains the same CTEs,
  * so cross-engine equality certifies the COMPOSED semantics.
  *
  * Stage contracts (the ones composition gets wrong silently):
  *   1. dedup FIRST — the filter trains on the deduplicated corpus
  *      (duplicates would bias the class counts);
  *   2. the NB gate trains on and scores the SURVIVORS (llr > 0
  *      keeps, the q166 rule);
  *   3. mixture weights use α = 0.5 supply flattening over the KEPT
  *      token counts (sqrt is correctly rounded IEEE in both
  *      engines — the q93 choice);
  *   4. shards hash the doc id (content-stable, q148 discipline) —
  *      only KEPT docs are sharded.
  *
  * Scale shape: dedup is one fingerprint shuffle; train+score are
  * the two q166 scans (the model stays a 2×256 broadcast); the
  * manifest is a partial-agg'd group on (source, shard); mixture
  * math runs on one row per source. Nothing new moves at 100 TB —
  * that is the point of composing the already-scale-shaped stages.
  */
object Manifest {

  val Shards = 8

  /** q200: the build manifest — per (source, shard): kept docs,
    * kept tokens, and the source's mixture weight. */
  def buildManifest(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))

    // stage 1: exact dedup (canonical = min doc_id per fingerprint)
    val fps = d.withColumn("fp", TextOps.fingerprint(col("text")))
    val canon = fps.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
    val docs2 = fps.join(canon, Seq("fp", "doc_id"), "left_semi")

    // stage 2: train the NB gate on the survivors, score them, keep
    // llr > 0 (identical math to q166, over docs2)
    // materialized ONCE (r15): the token relation feeds BOTH the model
    // training counts and the per-doc scoring join below, and each
    // consumer otherwise re-runs the scan → fingerprint-dedup →
    // explode chain (two ~2.3 s jobs at sf0.1 doing identical work).
    // The checkpoint holds slim (id, source, flag, token) rows.
    val toks = docs2.select(col("doc_id"), col("source"),
      col("source").isin(Bayes.CuratedSources: _*).as("curated"),
      explode(TextOps.tokens(col("text"))).as("tok"))
      .localCheckpoint()
    val m = Bayes.model(spark, toks)
    val weights = m.groupBy(col("bin")).agg(
      (sum(when(col("curated"), col("lp")).otherwise(lit(0.0)))
        - sum(when(!col("curated"), col("lp")).otherwise(lit(0.0)))).as("w"))
    // perDoc is SLIM (one 4-column row per surviving doc) but its
    // lineage is the full scan→explode→score pipeline, and it feeds
    // TWO consumers (mixture supply and the shard manifest) — without
    // a checkpoint each consumer re-runs the corpus-scale subtree
    // (r10: was the plan's extra documents scan). Materializing the
    // per-doc relation once is exactly what a production build does
    // between its gate and its packing stage.
    val perDoc = toks
      .select(col("doc_id"), col("source"),
        pmod(TextOps.hash60(col("tok")), lit(Bayes.Bins)).as("bin"))
      .join(broadcast(weights), Seq("bin"))
      .groupBy(col("source"), col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        round(sum(col("w").cast("decimal(28,12)")).cast("double")
          / count(lit(1)), 6).as("llr"))
      .localCheckpoint()
    val kept = perDoc.filter(col("llr") > 0.0)

    // stage 3: α=0.5 mixture weights over KEPT token supply
    val supply = kept.groupBy(col("source"))
      .agg(sum(col("n_toks")).as("kept_tokens"))
      .withColumn("w", round(sqrt(col("kept_tokens").cast("double")), 9))
    val totW = supply.agg(sum(col("w").cast("decimal(28,9)")).as("tw"))
    val mix = supply.crossJoin(broadcast(totW))
      .select(col("source"),
        round(col("w") / col("tw").cast("double"), 6).as("p_mix"))

    // stage 4: content-stable shard assignment of kept docs
    val manifest = kept
      .withColumn("shard",
        pmod(TextOps.hash60(concat(lit("shard:"), col("doc_id"))),
          lit(Shards)))
      .groupBy(col("source"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).cast("long").as("n_tokens"))
    manifest.join(mix, Seq("source"))
      .select(col("source"), col("shard"), col("n_docs"), col("n_tokens"),
        col("p_mix"))
      .orderBy(col("source"), col("shard"))
  }

  /** DuckDB oracle: the four stages chained CTE-for-CTE (dedup →
    * [[Bayes.nbCtesFor]] over the survivors → sqrt mixture → shard
    * hash). */
  val buildManifestSql: String = {
    val tokSql = TextOps.tokSql()
    s"""WITH fps AS (
      |  SELECT doc_id, source, text,
      |    ('0x' || substr(md5(array_to_string($tokSql, ' ')), 1, 15))::BIGINT
      |      AS fp
      |  FROM documents),
      |canon AS (SELECT fp, MIN(doc_id) AS doc_id FROM fps GROUP BY fp),
      |docs2 AS (
      |  SELECT f.doc_id, f.source, f.text
      |  FROM fps f JOIN canon c ON f.fp = c.fp AND f.doc_id = c.doc_id),
      |${Bayes.nbCtesFor("docs2")},
      |kept AS (
      |  SELECT source, doc_id, n_toks FROM perdoc WHERE llr > 0.0),
      |supply AS (
      |  SELECT source, SUM(n_toks) AS kept_tokens,
      |    ROUND(sqrt(CAST(SUM(n_toks) AS DOUBLE)), 9) AS w
      |  FROM kept GROUP BY source),
      |totw AS (
      |  SELECT SUM(CAST(w AS DECIMAL(28,9))) AS tw FROM supply),
      |mix AS (
      |  SELECT source, ROUND(w / CAST(tw AS DOUBLE), 6) AS p_mix
      |  FROM supply, totw),
      |manifest AS (
      |  SELECT source,
      |    ('0x' || substr(md5('shard:' || doc_id), 1, 15))::BIGINT
      |      % $Shards AS shard,
      |    COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens
      |  FROM kept GROUP BY 1, 2)
      |SELECT m.source, m.shard, m.n_docs, m.n_tokens, x.p_mix
      |FROM manifest m JOIN mix x ON m.source = x.source
      |ORDER BY m.source, m.shard""".stripMargin
  }
}
