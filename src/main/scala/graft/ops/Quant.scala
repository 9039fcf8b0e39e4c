package graft.ops

import graft.Tables
import graft.functions.{TextOps, VectorOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding compression and batch-shaping for training pipelines:
  * symmetric int8 vector quantization (the 4× storage/bandwidth lever
  * every 100 TB embedding store pulls before sharding) and
  * length-bucketed sequence batching (padding-waste accounting — the
  * difference between paying for max-length and paying for
  * bucket-length on every training batch).
  */
object Quant {

  // ---- q103: symmetric int8 quantization ---------------------------

  /** q103: quantize each embedding to int8 with a per-vector scale
    * (max|x|/127), reconstruct, and report per-label fidelity: worst
    * absolute reconstruction error and mean cosine(original,
    * reconstructed). One scan, all HOFs — no shuffle until the final
    * tiny per-label aggregate. Determinism: scale and error round to
    * 9 before aggregation, cosines accumulate in DECIMAL.
    */
  def int8Quant(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        VectorOps.toDouble(col("embedding")).as("v"))
      .withColumn("scale",
        round(aggregate(col("v"), lit(0.0d),
          (acc, x) => greatest(acc, abs(x))) / lit(127.0d), 9))
      // zero vector → scale 0 → quantized all-zero, reconstructs exactly
      .withColumn("q", transform(col("v"), x =>
        when(col("scale") === 0.0, lit(0L))
          .otherwise(round(x / col("scale"), 0).cast("long"))))
      .withColumn("recon", transform(col("q"), q => q * col("scale")))
      .withColumn("max_abs_err",
        round(aggregate(zip_with(col("v"), col("recon"),
          (a, b) => abs(a - b)), lit(0.0d),
          (acc, x) => greatest(acc, x)), 9))
      .withColumn("cos", round(VectorOps.cosine(col("v"), col("recon")), 9))
    e.groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round(max(col("max_abs_err")), 6).as("worst_abs_err"),
        round(sum(col("cos").cast("decimal(28,12)")).cast("double")
          / count(lit(1)), 6).as("avg_cosine"))
      .orderBy(col("label"))
  }

  val int8QuantSql: String =
    """WITH e AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings),
      |scaled AS (
      |  SELECT vec_id, label, v,
      |    ROUND(list_aggregate(list_transform(v, x -> abs(x)), 'max')
      |      / 127.0, 9) AS scale
      |  FROM e),
      |quant AS (
      |  SELECT vec_id, label, v, scale,
      |    list_transform(v, x -> CASE WHEN scale = 0 THEN 0
      |      ELSE CAST(ROUND(x / scale, 0) AS BIGINT) END) AS q
      |  FROM scaled),
      |recon AS (
      |  SELECT vec_id, label, v, scale,
      |    list_transform(q, x -> x * scale) AS r
      |  FROM quant),
      |err AS (
      |  SELECT label,
      |    ROUND(list_aggregate(
      |      list_transform(list_zip(v, r), p -> abs(p[1] - p[2])),
      |      'max'), 9) AS max_abs_err,
      |    ROUND(CASE WHEN sqrt(list_dot_product(v, v))
      |                  * sqrt(list_dot_product(r, r)) = 0 THEN 0.0
      |      ELSE list_dot_product(v, r)
      |        / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(r, r)))
      |      END, 9) AS cos
      |  FROM recon)
      |SELECT label, COUNT(*) AS n,
      |  ROUND(MAX(max_abs_err), 6) AS worst_abs_err,
      |  ROUND(CAST(SUM(CAST(cos AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6)
      |    AS avg_cosine
      |FROM err GROUP BY label
      |ORDER BY label""".stripMargin

  // ---- q104: length-bucketed batch padding waste --------------------

  /** Power-of-two token-length buckets. */
  val BucketEdges: Seq[Int] = Seq(16, 32, 64, 128, 256, 512)

  /** q104: padding-waste accounting for length-bucketed batching —
    * per bucket: docs, real tokens, padded tokens at the bucket
    * ceiling, and the waste ratio vs padding everything to the global
    * max. One scan + one tiny aggregate; the bucket id is a pure
    * per-row expression, so at 100 TB this is a single partial-agg
    * shuffle on ≤7 keys. */
  def lengthBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = BucketEdges
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextOps.tokenCount(col("text")).as("n_tok"))
    // ceiling = first edge ≥ n_tok, else global max length (no cap)
    val ceilExpr = edges.foldRight(col("n_tok")) { (e, acc) =>
      when(col("n_tok") <= e, lit(e)).otherwise(acc)
    }
    val b = docs.withColumn("bucket", ceilExpr)
    val global = b.agg(max(col("n_tok")).as("gmax"),
      count(lit(1)).cast("double").as("n_all"))
    b.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("real_tokens"),
        sum(col("bucket") - col("n_tok")).as("pad_tokens"))
      .crossJoin(broadcast(global))
      .select(col("bucket"), col("n_docs"), col("real_tokens"),
        col("pad_tokens"),
        round(col("pad_tokens").cast("double")
          / (col("bucket") * col("n_docs")).cast("double"), 6)
          .as("waste_frac"),
        round(lit(1.0) - (col("bucket") * col("n_docs")).cast("double")
          / (col("gmax") * col("n_docs")).cast("double"), 6)
          .as("saved_vs_maxpad"))
      .orderBy(col("bucket"))
  }

  val lengthBucketsSql: String = {
    val tok = TextOps.tokSql()
    val ceilCase = BucketEdges.map(e => s"WHEN n_tok <= $e THEN $e")
      .mkString("CASE ", " ", " ELSE n_tok END")
    s"""WITH docs AS (
      |  SELECT doc_id, len($tok) AS n_tok FROM documents),
      |b AS (SELECT doc_id, n_tok, $ceilCase AS bucket FROM docs),
      |g AS (SELECT MAX(n_tok) AS gmax FROM b)
      |SELECT bucket, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS real_tokens,
      |  CAST(SUM(bucket - n_tok) AS BIGINT) AS pad_tokens,
      |  ROUND(CAST(SUM(bucket - n_tok) AS DOUBLE)
      |    / CAST(bucket * COUNT(*) AS DOUBLE), 6) AS waste_frac,
      |  ROUND(1.0 - CAST(bucket * COUNT(*) AS DOUBLE)
      |    / CAST(g.gmax * COUNT(*) AS DOUBLE), 6) AS saved_vs_maxpad
      |FROM b CROSS JOIN g
      |GROUP BY bucket, g.gmax
      |ORDER BY bucket""".stripMargin
  }
}
