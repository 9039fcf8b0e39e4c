package graft.ops

import graft.Corpus
import graft.functions.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q232: contrastive triplet mining — the training-pair stage of an
  * embedding-model data pipeline (Schroff et al. 2015 FaceNet
  * semi-hard rule; SimCSE/E5-style corpora are mined the same way):
  * for each anchor document, the hardest POSITIVE is its nearest
  * neighbor, and the useful NEGATIVES are the SEMI-HARD band — close
  * enough to carry gradient, far enough to be confidently non-
  * duplicates. Too-easy negatives (sim below the band) teach
  * nothing; too-hard ones (above it) are likely unlabeled positives
  * (the corpus's own near-dup band starts at τ = 0.98, q27/q100).
  *
  * Band [0.40, 0.65): sits inside the corpus's organic cosine mass
  * (measured decile histogram at the gates: ~60% of pairs in
  * [0.4, 0.8)), so every anchor mines a full negative set at every
  * SF while staying clear of both the easy tail and the near-dup
  * shoulder.
  *
  * Scale: the anchor set is the bounded mining batch (a production
  * run streams bounded anchor batches exactly like this), so the
  * anchor table broadcasts and the corpus is scanned ONCE — one
  * skinny (q_id, cand, sim) shuffle into the per-anchor top-k
  * window, no corpus self-join. For anchor sets ∝ corpus, mining
  * routes through the ANN index (q79's IVF under the same shared
  * doc model) instead of the exact scan — same recipe, the index
  * replaces the scan; the declared query pins the exact-scan
  * variant the oracle can replay bit-for-bit.
  */
object TripletMine {

  val Anchors = 8
  val NegK = 5
  val NegLo = 0.40
  val NegHi = 0.65

  def tripletMine(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Corpus.docEmbeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < Anchors)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", round(VectorOps.cosine(col("v"), col("qv")), 6))
      .select(col("q_id"), col("vec_id").as("n_id"), col("sim"))
    val byAnchor = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    val pos = scored
      .withColumn("rnk", row_number().over(byAnchor))
      .filter(col("rnk") === 1)
      .select(col("q_id"), lit("pos").as("role"),
        lit(0L).as("rank"), col("n_id"), col("sim"))
    val neg = scored
      .filter(col("sim") >= NegLo && col("sim") < NegHi)
      .withColumn("rnk", row_number().over(byAnchor))
      .filter(col("rnk") <= NegK)
      .select(col("q_id"), lit("neg").as("role"),
        col("rnk").cast("long").as("rank"), col("n_id"), col("sim"))
    pos.unionByName(neg).orderBy(col("q_id"), col("rank"))
  }

  val tripletMineSql: String =
    s"""WITH ${Corpus.docEmbCte},
      |q AS (SELECT vec_id AS q_id, v AS qv FROM demb WHERE vec_id < $Anchors),
      |scored AS (
      |  SELECT q.q_id, e.vec_id AS n_id,
      |    ROUND(${Similarity.cosSql("e.v", "q.qv")}, 6) AS sim
      |  FROM demb e CROSS JOIN q WHERE e.vec_id <> q.q_id),
      |pos AS (
      |  SELECT q_id, 'pos' AS role, CAST(0 AS BIGINT) AS rank, n_id, sim
      |  FROM (SELECT q_id, n_id, sim,
      |          ROW_NUMBER() OVER (PARTITION BY q_id
      |            ORDER BY sim DESC, n_id) AS rnk
      |        FROM scored)
      |  WHERE rnk = 1),
      |neg AS (
      |  SELECT q_id, 'neg' AS role, CAST(rnk AS BIGINT) AS rank, n_id, sim
      |  FROM (SELECT q_id, n_id, sim,
      |          ROW_NUMBER() OVER (PARTITION BY q_id
      |            ORDER BY sim DESC, n_id) AS rnk
      |        FROM scored WHERE sim >= $NegLo AND sim < $NegHi)
      |  WHERE rnk <= $NegK)
      |SELECT * FROM pos UNION ALL SELECT * FROM neg
      |ORDER BY q_id, rank""".stripMargin
}
