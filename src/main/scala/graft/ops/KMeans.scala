package graft.ops

import graft.Tables
import graft.functions.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic mini k-means (Lloyd's, k=10, 2 iterations, first-k
  * init) over the embeddings table, and the learned-IVF ANN built on
  * it — the engine's answer to pgvector's ivfflat training phase
  * (`lists=100`, reference migration `939d487ab146:39`).
  *
  * Determinism contract: assignment ranks on ROUND(dot, 9) with
  * centroid-id tiebreak; centroid updates are exact-decimal per-dim
  * means rounded to 9 — every step is bit-reproducible in the DuckDB
  * oracle, which unrolls the same two iterations as CTEs.
  *
  * Scale: each iteration is one broadcast join (k centroids) + one
  * shuffle on cluster id; k-means over 100 TB of vectors is exactly
  * this loop with checkpointing between iterations.
  */
object KMeans {

  val K = 10
  val Iters = 2

  private def vectors(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))

  /** One assignment step: nearest centroid by rounded dot (unit
    * vectors → max dot = min L2). */
  private def assign(vecs: DataFrame, centroids: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(centroids))
      .withColumn("score", round(VectorOps.dot(col("v"), col("cv")), 9))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("score").desc, col("cid"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("cid"))

  /** One update step: exact-decimal per-dimension mean. */
  private def update(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("cid")).agg(
      array((0 until 64).map { i =>
        round(sum(element_at(col("v"), i + 1).cast("decimal(28,12)"))
          .cast("double") / count(lit(1)), 9)
      }: _*).as("cv"),
      count(lit(1)).as("n"))

  /** Fitted model after [[Iters]] iterations: (cid, cv, n). */
  def fit(spark: SparkSession, sfDir: String): DataFrame = {
    val vecs = vectors(spark, sfDir).cache()
    var centroids = vecs.filter(col("vec_id") < K)
      .select(col("vec_id").cast("int").as("cid"), col("v").as("cv"))
    for (_ <- 1 to Iters)
      centroids = update(assign(vecs, centroids))
        .select(col("cid"), col("cv"), col("n")).localCheckpoint()
    centroids
  }

  /** q41: cluster summary — sizes + first centroid component. */
  def clusterSummary(spark: SparkSession, sfDir: String): DataFrame =
    fit(spark, sfDir)
      .select(col("cid"), col("n"),
        round(element_at(col("cv"), 1), 6).as("c0"))
      .orderBy(col("cid"))

  private val assignSql = (src: String, cents: String) =>
    s"""SELECT vec_id, v, cid FROM (
       |    SELECT e.vec_id, e.v, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ROUND(list_dot_product(e.v, c.cv), 9) DESC, c.cid) AS rn
       |    FROM $src e CROSS JOIN $cents c)
       |  WHERE rn = 1""".stripMargin

  private val updateSql = (assigned: String) =>
    s"""SELECT cid, list(m ORDER BY i) AS cv, MAX(nn) AS n FROM (
       |    SELECT cid, i,
       |      ROUND(CAST(SUM(CAST(v[i] AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 9) AS m,
       |      COUNT(*) AS nn
       |    FROM $assigned CROSS JOIN generate_series(1, 64) AS t(i)
       |    GROUP BY cid, i)
       |  GROUP BY cid""".stripMargin

  /** The two Lloyd iterations unrolled as CTEs. */
  val modelCtes: String =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |c0 AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < $K),
      |a1 AS (${assignSql("e", "c0")}),
      |c1 AS (${updateSql("a1")}),
      |a2 AS (${assignSql("e", "c1")}),
      |c2 AS (${updateSql("a2")})""".stripMargin

  val clusterSummarySql: String =
    s"""WITH $modelCtes
      |SELECT cid, n, ROUND(cv[1], 6) AS c0
      |FROM c2 ORDER BY cid""".stripMargin

  /** q42: learned-IVF ANN — probe the nprobe=2 nearest fitted
    * centroids, exact search only inside those clusters. */
  def knnIvfKmeans(spark: SparkSession, sfDir: String): DataFrame = {
    val vecs = vectors(spark, sfDir).cache()
    val model = fit(spark, sfDir)
    val assigned = assign(vecs, model.select(col("cid"), col("cv")))
    val q = vecs.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val probed = q.crossJoin(broadcast(model.select(col("cid"), col("cv"))))
      .withColumn("cscore", round(VectorOps.dot(col("qv"), col("cv")), 9))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cscore").desc, col("cid"))))
      .filter(col("crank") <= 2)
      .select(col("q_id"), col("qv"), col("cid"))
    probed.join(assigned, Seq("cid"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", round(VectorOps.dot(col("v"), col("qv")), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("n_id"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  val knnIvfKmeansSql: String =
    s"""WITH $modelCtes,
      |model AS (SELECT cid, cv FROM c2),
      |assigned AS (${assignSql("e", "model")}),
      |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 3),
      |probed AS (
      |  SELECT q_id, qv, cid FROM (
      |    SELECT q.q_id, q.qv, m.cid,
      |      ROW_NUMBER() OVER (PARTITION BY q.q_id
      |        ORDER BY ROUND(list_dot_product(q.qv, m.cv), 9) DESC, m.cid) AS crank
      |    FROM q CROSS JOIN model m)
      |  WHERE crank <= 2),
      |scored AS (
      |  SELECT p.q_id, a.vec_id,
      |    ROUND(list_dot_product(a.v, p.qv), 6) AS sim
      |  FROM probed p JOIN assigned a ON a.cid = p.cid
      |  WHERE a.vec_id <> p.q_id),
      |ranked AS (
      |  SELECT q_id, vec_id, sim,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
      |  FROM scored)
      |SELECT q_id, rank, vec_id AS n_id, sim
      |FROM ranked WHERE rank <= 3
      |ORDER BY q_id, rank""".stripMargin
}
