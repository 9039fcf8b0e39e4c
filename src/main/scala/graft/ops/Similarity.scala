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

  /** Fixed hyperplane-LSH family for cosine near-dup blocking:
    * [[NHyperplanes]] Rademacher (±1) hyperplanes whose signs come
    * from the engine's md5 hash rule (`TextOps.hash60("hp{j}_{i}") %
    * 2`), so both engines materialize the identical planes as
    * literals. Banded [[NBands]] × [[BandBits]]: a pair is a
    * candidate iff all [[BandBits]] sign-bits of SOME band agree —
    * the standard recall/candidate-count dial (pairs at cosine ≥ 0.95
    * escape all 4 bands with probability < 2%; at the planted pairs'
    * typical cosine ≈ 0.99, < 0.1%). */
  val NHyperplanes = 16
  val BandBits = 4
  val NBands: Int = NHyperplanes / BandBits

  /** hyperplanes(j)(i) ∈ {-1.0, +1.0}, j < NHyperplanes, i < 64. */
  lazy val hyperplanes: Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until NHyperplanes).map { j =>
      (0 until 64).map { i =>
        val hex = md.digest(s"hp${j}_$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
        if (h % 2 == 0) 1.0 else -1.0
      }
    }
  }

  /** Embedding-cosine near-dup: corpus ∪ perturbed copies (last
    * component zeroed, renormalized → cosine ≈ sqrt(1-v64²) ≈ 1);
    * emit pairs with cosine ≥ 0.95.
    *
    * Blocking is CONTENT-derived: per-band sign-bit keys of the fixed
    * hyperplane projections — band rows carry (vec_id, band, key)
    * only, candidates come from per-band equi-joins (shuffle on the
    * 4-bit key, vector payload joined back afterwards by id), then
    * exact cosine verification. No id-derived key anywhere: two
    * similar vectors block together regardless of their ids. */
  def embeddingNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
    val perturbed = e.filter(pmod(col("vec_id"), lit(20)) === 0)
      .select((col("vec_id") + 10000).as("vec_id"),
        VectorOps.l2Normalize(concat(slice(col("v"), 1, 63),
          array(lit(0.0)))).as("v"))
    val corpus = e.unionByName(perturbed)
    // (vec_id, band, key): key = 4 sign bits of the band's projections
    val bandKeys = (0 until NBands).map { b =>
      val key = (0 until BandBits).map { k =>
        val j = b * BandBits + k
        (VectorOps.dot(col("v"), typedlit(hyperplanes(j))) >= 0)
          .cast("int") * lit(1 << k)
      }.reduce(_ + _)
      struct(lit(b).as("band"), key.as("key"))
    }
    val bandRows = corpus
      .select(col("vec_id"), explode(array(bandKeys: _*)).as("bk"))
      .select(col("vec_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = bandRows.as("a").join(bandRows.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key")
          && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"))
      .distinct()
    cand
      .join(corpus.select(col("vec_id").as("a_id"), col("v").as("va")), Seq("a_id"))
      .join(corpus.select(col("vec_id").as("b_id"), col("v").as("vb")), Seq("b_id"))
      .withColumn("sim", VectorOps.dot(col("va"), col("vb")))
      .filter(col("sim") >= 0.95)
      .select(col("a_id"), col("b_id"), round(col("sim"), 6).as("sim"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** The identical hyperplanes as SQL literals (generated from
    * [[hyperplanes]], so Spark and the oracle can never drift). */
  private def hyperplaneSqlList(j: Int): String =
    hyperplanes(j).map(x => if (x > 0) "1.0" else "-1.0")
      .mkString("[", ", ", "]::DOUBLE[]")

  val embeddingNearDupSql: String = {
    val bandSelects = (0 until NBands).map { b =>
      val key = (0 until BandBits).map { k =>
        val j = b * BandBits + k
        s"(CASE WHEN list_dot_product(v, ${hyperplaneSqlList(j)}) >= 0 THEN ${1 << k} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, $b AS band, $key AS key FROM corpus"
    }.mkString("\n      |  UNION ALL ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |pert AS (
      |  SELECT vec_id + 10000 AS vec_id,
      |    list_transform(pv, x -> x / nrm) AS v
      |  FROM (
      |    SELECT vec_id, pv, sqrt(list_dot_product(pv, pv)) AS nrm
      |    FROM (SELECT vec_id, list_append(v[1:63], 0.0::DOUBLE) AS pv
      |          FROM e WHERE vec_id % 20 = 0))),
      |corpus AS (
      |  SELECT vec_id, v FROM e UNION ALL SELECT vec_id, v FROM pert),
      |bands AS (
      |  $bandSelects),
      |cand AS (
      |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id),
      |pairs AS (
      |  SELECT c.a_id, c.b_id, list_dot_product(va.v, vb.v) AS sim
      |  FROM cand c
      |  JOIN corpus va ON va.vec_id = c.a_id
      |  JOIN corpus vb ON vb.vec_id = c.b_id)
      |SELECT a_id, b_id, ROUND(sim, 6) AS sim
      |FROM pairs WHERE sim >= 0.95
      |ORDER BY a_id, b_id""".stripMargin
  }

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
