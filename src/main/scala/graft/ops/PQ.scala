package graft.ops

import graft.Tables
import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization ANN (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search"): split the 64-d vectors into M=4
  * subspaces of 16 dims, learn K=4 centroids per subspace (one
  * deterministic Lloyd iteration, first-K init — the same recipe as
  * [[KMeans]]), encode every vector as 4 small codes, and answer
  * queries with an asymmetric-distance (ADC) lookup table: 16
  * query-to-centroid distances replace full 64-d scans.
  *
  * Scale story: the encoded corpus is M bytes per vector instead of
  * 256 (codes shuffle/broadcast freely); query cost is M table
  * lookups + adds per candidate. This is the memory-bound regime
  * ivfflat can't reach — the standard billion-vector layout.
  *
  * Determinism: subspace distances round to 9 decimals with
  * centroid-id tiebreaks, centroid updates are exact-decimal means,
  * ADC sums accumulate in DECIMAL — the oracle unrolls the identical
  * training, encoding, and scoring.
  */
object PQ {

  val M = 4        // subspaces
  val SubDim = 16  // dims per subspace
  val K = 4        // centroids per subspace

  /** Squared L2 via dots: ⟨x,x⟩ − 2⟨x,c⟩ + ⟨c,c⟩, rounded 9. */
  private def d2(x: Column, c: Column): Column =
    round(VectorOps.dot(x, x) - lit(2.0) * VectorOps.dot(x, c)
      + VectorOps.dot(c, c), 9)

  /** (vec_id, m, sv): every vector exploded into its M subvectors. */
  private def subvecs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
      .select(col("vec_id"), explode(array((0 until M).map { m =>
        struct(lit(m).as("m"),
          slice(col("v"), m * SubDim + 1, SubDim).as("sv"))
      }: _*)).as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.sv").as("sv"))

  /** Nearest-centroid assignment within each subspace. */
  private def assign(sub: DataFrame, cents: DataFrame): DataFrame =
    sub.join(broadcast(cents), Seq("m"))
      .withColumn("dist", d2(col("sv"), col("cv")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"), col("m"))
          .orderBy(col("dist"), col("cid"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("m"), col("sv"), col("cid"))

  /** q67: PQ-ANN — train, encode, ADC-score against query vec_id=0,
    * top-10 by approximate distance. */
  def pqAnn(spark: SparkSession, sfDir: String): DataFrame = {
    // eager localCheckpoint, not cache: the returned plan is lazy, so
    // a cache()+unpersist() pair around plan CONSTRUCTION would be
    // dropped before the first action; the checkpoint materializes
    // the exploded subvectors once for their ~5 downstream uses
    val sub: DataFrame = subvecs(spark, sfDir).localCheckpoint()
    val c0 = sub.filter(col("vec_id") < K)
      .select(col("m"), col("vec_id").cast("int").as("cid"),
        col("sv").as("cv"))
    // one Lloyd iteration: assign to init, re-center exactly
    val c1 = assign(sub, c0).groupBy(col("m"), col("cid")).agg(
      array((0 until SubDim).map { i =>
        round(sum(element_at(col("sv"), i + 1).cast("decimal(28,12)"))
          .cast("double") / count(lit(1)), 9)
      }: _*).as("cv"))
    val codes = assign(sub, c1).select(col("vec_id"), col("m"), col("cid"))
    val qsub = sub.filter(col("vec_id") === 0)
      .select(col("m"), col("sv").as("qv"))
    val table = c1.join(broadcast(qsub), Seq("m"))
      .select(col("m"), col("cid"), d2(col("qv"), col("cv")).as("t"))
    codes.filter(col("vec_id") =!= 0)
      .join(broadcast(table), Seq("m", "cid"))
      .groupBy(col("vec_id"))
      .agg(round(sum(col("t").cast("decimal(28,12)")).cast("double"), 9)
        .as("approx_d2"))
      .orderBy(col("approx_d2"), col("vec_id"))
      .limit(10)
      .select(col("vec_id").as("n_id"), col("approx_d2"))
  }

  val pqAnnSql: String = {
    def d2Sql(x: String, c: String) =
      s"ROUND(list_dot_product($x, $x) - 2 * list_dot_product($x, $c) + list_dot_product($c, $c), 9)"
    def assignSql(cents: String) =
      s"""SELECT vec_id, m, sv, cid FROM (
         |    SELECT s.vec_id, s.m, s.sv, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
         |        ORDER BY ${d2Sql("s.sv", "c.cv")}, c.cid) AS rn
         |    FROM sub s JOIN $cents c ON c.m = s.m)
         |  WHERE rn = 1""".stripMargin
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |sub AS (
      |  SELECT vec_id, m, v[(m * $SubDim + 1):(m * $SubDim + $SubDim)] AS sv
      |  FROM e CROSS JOIN generate_series(0, ${M - 1}) AS t(m)),
      |c0 AS (SELECT m, CAST(vec_id AS INT) AS cid, sv AS cv
      |       FROM sub WHERE vec_id < $K),
      |a1 AS (${assignSql("c0")}),
      |c1 AS (
      |  SELECT m, cid, list(mm ORDER BY i) AS cv FROM (
      |    SELECT m, cid, i,
      |      ROUND(CAST(SUM(CAST(sv[i] AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 9) AS mm
      |    FROM a1 CROSS JOIN generate_series(1, $SubDim) AS t(i)
      |    GROUP BY m, cid, i)
      |  GROUP BY m, cid),
      |codes AS (
      |  SELECT vec_id, m, cid FROM (${assignSql("c1")})),
      |qsub AS (SELECT m, sv AS qv FROM sub WHERE vec_id = 0),
      |tbl AS (
      |  SELECT c.m, c.cid, ${d2Sql("q.qv", "c.cv")} AS t
      |  FROM c1 c JOIN qsub q ON q.m = c.m)
      |SELECT vec_id AS n_id,
      |  ROUND(CAST(SUM(CAST(t AS DECIMAL(28,12))) AS DOUBLE), 9) AS approx_d2
      |FROM codes JOIN tbl USING (m, cid)
      |WHERE vec_id <> 0
      |GROUP BY vec_id
      |ORDER BY approx_d2, n_id
      |LIMIT 10""".stripMargin
  }
}
