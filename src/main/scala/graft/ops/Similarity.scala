package graft.ops

import graft.Tables
import graft.functions.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`Array[Float]` 64-d
  * unit vectors): brute-force cosine top-k as the exact baseline, an
  * IVF-style partition-pruned variant as the scale path, and
  * embedding-cosine near-dup detection.
  *
  * Scale shape: queries are broadcast (small side), the corpus
  * streams — per-partition top-k heaps then a k·P merge
  * (TakeOrderedAndProject per query via window rank over a
  * broadcast-joined scan). IVF reduces the scanned fraction to
  * nprobe/nlist of the corpus, the same pruning ivfflat `lists=100`
  * gives the reference (`models.py:38`).
  */
object Similarity {

  /** Brute-force KNN: 3 query vectors × corpus, top-3 neighbors each
    * (self excluded), exact cosine (= dot on unit vectors). */
  def knnBruteForce(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", VectorOps.dot(col("embedding"), col("q_emb")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("n_id"), round(col("sim"), 6).as("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  val knnBruteForceSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 3),
      |scored AS (
      |  SELECT q.q_id, e.vec_id, list_dot_product(e.v, q.qv) AS sim
      |  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
      |ranked AS (
      |  SELECT q_id, vec_id,  sim,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
      |  FROM scored)
      |SELECT q_id, rank, vec_id AS n_id, ROUND(sim, 6) AS sim
      |FROM ranked WHERE rank <= 3
      |ORDER BY q_id, rank""".stripMargin

  /** Embedding-cosine near-dup: corpus ∪ perturbed copies (last
    * component zeroed, renormalized → cosine ≈ sqrt(1-v64²) ≈ 1);
    * emit pairs with cosine ≥ 0.95. Bucketed by vector fingerprint
    * prefix in a real pipeline; at test SF an a<b self-join on the
    * block key (vec_id mod) keeps candidates bounded. */
  def embeddingNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
    val perturbed = e.filter(pmod(col("vec_id"), lit(20)) === 0)
      .select((col("vec_id") + 10000).as("vec_id"),
        VectorOps.l2Normalize(concat(slice(col("v"), 1, 63),
          array(lit(0.0)))).as("v"))
    val corpus = e.unionByName(perturbed)
      .withColumn("block", pmod(col("vec_id"), lit(10000)))
    corpus.as("a").join(corpus.as("b"),
        col("a.block") === col("b.block")
          && col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim", VectorOps.dot(col("a.v"), col("b.v")))
      .filter(col("sim") >= 0.95)
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        round(col("sim"), 6).as("sim"))
      .orderBy(col("a_id"), col("b_id"))
  }

  val embeddingNearDupSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |pert AS (
      |  SELECT vec_id + 10000 AS vec_id,
      |    list_transform(pv, x -> x / nrm) AS v
      |  FROM (
      |    SELECT vec_id, pv, sqrt(list_dot_product(pv, pv)) AS nrm
      |    FROM (SELECT vec_id, list_append(v[1:63], 0.0::DOUBLE) AS pv
      |          FROM e WHERE vec_id % 20 = 0))),
      |corpus AS (
      |  SELECT vec_id, v, vec_id % 10000 AS block FROM (
      |    SELECT vec_id, v FROM e UNION ALL SELECT vec_id, v FROM pert)),
      |pairs AS (
      |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      |    list_dot_product(a.v, b.v) AS sim
      |  FROM corpus a JOIN corpus b
      |    ON a.block = b.block AND a.vec_id < b.vec_id)
      |SELECT a_id, b_id, ROUND(sim, 6) AS sim
      |FROM pairs WHERE sim >= 0.95
      |ORDER BY a_id, b_id""".stripMargin

  /** IVF-style ANN: per-label centroids (the "inverted lists" — the
    * label column stands in for a k-means assignment), query probes
    * the nprobe=2 nearest centroids, exact search only within those
    * lists. Scanned fraction ≈ nprobe/nlist — the ivfflat trade. */
  def knnIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        VectorOps.toDouble(col("embedding")).as("v"))
    // exact-decimal per-dimension mean → deterministic centroids
    val centroids = e.groupBy(col("label")).agg(
      array((0 until 64).map { i =>
        round(sum(element_at(col("v"), i + 1).cast("decimal(28,12)"))
          .cast("double") / count(lit(1)), 9)
      }: _*).as("cv"))
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("csim", VectorOps.dot(col("qv"), col("cv")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("csim").desc, col("label"))))
      .filter(col("crank") <= 2)
      .select(col("q_id"), col("qv"), col("label"))
    val scored = probed.join(e, Seq("label"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", VectorOps.dot(col("v"), col("qv")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("n_id"), round(col("sim"), 6).as("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  val knnIvfSql: String =
    """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cdims AS (
      |  SELECT label, i,
      |    ROUND(CAST(SUM(CAST(v[i] AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 9) AS c
      |  FROM e CROSS JOIN generate_series(1, 64) AS t(i)
      |  GROUP BY label, i),
      |centroids AS (
      |  SELECT label, list(c ORDER BY i) AS cv FROM cdims GROUP BY label),
      |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 3),
      |probed AS (
      |  SELECT q_id, qv, label FROM (
      |    SELECT q.q_id, q.qv, c.label,
      |      ROW_NUMBER() OVER (PARTITION BY q.q_id
      |        ORDER BY list_dot_product(q.qv, c.cv) DESC, c.label) AS crank
      |    FROM q CROSS JOIN centroids c)
      |  WHERE crank <= 2),
      |scored AS (
      |  SELECT p.q_id, e.vec_id, list_dot_product(e.v, p.qv) AS sim
      |  FROM probed p JOIN e ON e.label = p.label
      |  WHERE e.vec_id <> p.q_id),
      |ranked AS (
      |  SELECT q_id, vec_id, sim,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
      |  FROM scored)
      |SELECT q_id, rank, vec_id AS n_id, ROUND(sim, 6) AS sim
      |FROM ranked WHERE rank <= 3
      |ORDER BY q_id, rank""".stripMargin
}
