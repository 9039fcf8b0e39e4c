package graft.ops

import graft.Tables
import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reproducible sampling + text normalization — corpus-curation
  * staples. Sampling is HASH-BASED (keep iff hash60(key) mod M < p·M)
  * rather than RNG-based: the sample is a pure function of the key,
  * so it is identical across engines, retries, partitionings, and
  * re-runs — the only sampling that is auditable at 100 TB.
  */
object Sampling {

  /** q51: 10% deterministic document sample + per-lang acceptance
    * counts (stratification check falls out of the groupBy). */
  def hashSample(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .withColumn("keep",
        pmod(TextOps.hash60(concat(lit("sample:"), col("doc_id"))),
          lit(100L)) < 10)
    d.groupBy(col("lang")).agg(
      count(lit(1)).as("n_docs"),
      count(when(col("keep"), 1)).as("n_sampled"))
      .orderBy(col("lang"))
  }

  val hashSampleSql: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |  COUNT(*) FILTER (WHERE
      |    ('0x' || substr(md5('sample:' || doc_id), 1, 15))::BIGINT % 100 < 10)
      |    AS n_sampled
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Number of training shards in the q148 epoch-shuffle plan (real
    * runs use thousands; the mechanics are shard-count-invariant). */
  val ShuffleShards = 8

  /** q148: deterministic per-epoch training order — the reproducible
    * global shuffle every pretraining run needs (restart-safe data
    * order, different permutation per epoch). The order key is a pure
    * hash of (epoch, doc_id), so the permutation is a function of the
    * corpus, not of cluster state; docs are first bucketed into
    * shards by a second independent hash and ordered WITHIN shards —
    * the hierarchy real loaders use (shard files, then in-shard
    * order), and the reason this scales: every window is per-shard,
    * never global. Output pins the full permutation per (epoch,
    * shard): size, head doc, and a position-weighted checksum — one
    * displaced doc anywhere breaks it.
    */
  def epochShuffle(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val epochs = explode(array((1 to 3).map(lit): _*)).as("epoch")
    val keyed = Tables.documents(spark, sfDir).select(col("doc_id"))
      .select(col("doc_id"), epochs)
      .withColumn("ord_key", TextOps.hash60(
        concat(lit("shuf:"), col("epoch"), lit(":"), col("doc_id"))))
      .withColumn("shard", pmod(TextOps.hash60(
        concat(lit("shard:"), col("epoch"), lit(":"), col("doc_id"))),
        lit(ShuffleShards.toLong)))
    keyed
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("epoch"), col("shard"))
          .orderBy(col("ord_key"), col("doc_id"))))
      .groupBy(col("epoch"), col("shard")).agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("pos") === 1, col("doc_id"))).as("head_doc"),
        sum(col("pos") * col("doc_id")).as("order_checksum"))
      .orderBy(col("epoch"), col("shard"))
  }

  val epochShuffleSql: String =
    s"""WITH e(epoch) AS (VALUES (1), (2), (3)),
      |k AS (
      |  SELECT epoch, doc_id,
      |    ('0x' || substr(md5('shuf:' || epoch || ':' || doc_id), 1, 15))::BIGINT AS ord_key,
      |    ('0x' || substr(md5('shard:' || epoch || ':' || doc_id), 1, 15))::BIGINT % $ShuffleShards AS shard
      |  FROM documents CROSS JOIN e),
      |p AS (
      |  SELECT epoch, shard, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY epoch, shard
      |      ORDER BY ord_key, doc_id) AS pos
      |  FROM k)
      |SELECT epoch, shard, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN pos = 1 THEN doc_id END) AS BIGINT) AS head_doc,
      |  CAST(SUM(pos * doc_id) AS BIGINT) AS order_checksum
      |FROM p GROUP BY epoch, shard ORDER BY epoch, shard""".stripMargin

  /** q52: stem-normalized vocabulary — top terms after stemming
    * ([[TextOps.stem]], the shared stemming-lite normalizer), proving
    * the normalizer collapses inflected forms. */
  def stemmedVocab(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val toks = d.select(explode(TextOps.tokens(col("text"))).as("t"))
    val stemmed = toks.withColumn("stem", TextOps.stem(col("t")))
    stemmed.groupBy(col("stem")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("stem"))
      .limit(15)
  }

  val stemmedVocabSql: String = {
    val stemExpr = TextOps.stemSql("t")
    s"""WITH toks AS (
      |  SELECT unnest(list_filter(
      |    string_split_regex(lower(text), '[^a-z0-9_]+'), x -> x != '')) AS t
      |  FROM documents)
      |SELECT $stemExpr AS stem, COUNT(*) AS n
      |FROM toks
      |GROUP BY 1
      |ORDER BY n DESC, stem
      |LIMIT 15""".stripMargin
  }

  /** Reservoir winners per language stratum. */
  val ReservoirK = 3

  /** q92: weighted reservoir sample (Efraimidis–Spirakis A-ES) — k
    * docs per language with inclusion probability proportional to
    * token count, from ONE distributed pass. Each doc gets the scalar
    * key ln(u)/w with u a hash-uniform of the doc id; the k largest
    * keys per stratum ARE the weighted sample. The reduction turns
    * weighted sampling into plain per-row arithmetic + top-k, so it
    * runs through the bounded-heap operator: per-partition heaps of
    * size k, no global sort, no RNG state to coordinate — the only
    * weighted-sampler shape that is single-pass, mergeable across
    * partitions, and re-run-auditable at 100 TB. ln is rounded to 9
    * decimals before the divide so both engines branch on the same
    * double (cross-engine transcendental recipe). */
  def weightedReservoir(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = Tables.documents(spark, sfDir)
      .withColumn("w", greatest(TextOps.tokenCount(col("text")).cast("long"), lit(1L)))
      .withColumn("u",
        (TextOps.hash60(concat(lit("res:"), col("doc_id"))) + lit(1L))
          .cast("double") / lit(1152921504606846976.0)) // 2^60
      .withColumn("res_key", round(log(col("u")), 9) / col("w"))
      .select(col("lang"), col("doc_id"), col("w"), col("res_key"))
    graft.plans.TopKPerKey.perKey(scored, Seq("lang"), "res_key", ReservoirK)
      .orderBy(col("lang"), col("res_key").desc, col("doc_id"))
      .select(col("lang"), col("doc_id"), col("w"), col("res_key"))
  }

  val weightedReservoirSql: String = {
    val tok = graft.functions.TextOps.tokSql()
    s"""WITH scored AS (
      |  SELECT lang, doc_id, w,
      |    ROUND(LN(u), 9) / w AS res_key
      |  FROM (
      |    SELECT lang, doc_id,
      |      GREATEST(len($tok), 1) AS w,
      |      (('0x' || substr(md5('res:' || doc_id), 1, 15))::BIGINT + 1)
      |        / 1152921504606846976.0 AS u
      |    FROM documents))
      |SELECT lang, doc_id, w, res_key FROM (
      |  SELECT lang, doc_id, w, res_key,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |                       ORDER BY res_key DESC, doc_id) AS rn
      |  FROM scored)
      |WHERE rn <= $ReservoirK
      |ORDER BY lang, res_key DESC, doc_id""".stripMargin
  }
}
