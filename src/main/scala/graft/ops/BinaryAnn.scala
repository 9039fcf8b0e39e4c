package graft.ops

import graft.{Corpus, Tables}
import graft.functions.{Embeddings, VectorOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary (sign) embedding quantization + Hamming-prefiltered ANN —
  * the 32× compression lever the float-vector operators (q26/q67/q79)
  * don't cover. Each 1024-d stored vector (reference geometry,
  * `models.py:32` `Vector(1024)`) collapses to its 1024 sign bits
  * packed into 16 longs; candidate generation ranks by Hamming
  * distance over the packed codes (XOR + popcount, pure codegen'd
  * integer ops), and only the small candidate set is re-scored with
  * the exact float cosine. Sign quantization is the standard binary
  * ANN recipe (Charikar's SimHash bound: P[sign mismatch] = θ/π per
  * dimension, so Hamming over sign bits is a consistent estimator of
  * angle) — the same family as the hyperplane-LSH blocker (q27), but
  * with the IDENTITY basis: the code IS the compressed vector, not a
  * projection, so it doubles as the storage format.
  *
  * Scale shape: the code column is 128 bytes/row vs 8 KB of doubles —
  * the Hamming scan reads 1.6% of the vector bytes, queries broadcast
  * as 16-long arrays, and the top-R rank shuffles only
  * `(vec_id, ham)` pairs. The exact rerank then fetches full vectors
  * for R·|Q| rows by key — a broadcast semi-join against the corpus
  * scan, never a second all-pairs pass. At 100 TB both columns are
  * written at ingest; this derivation recomputes them on the fly so
  * the DuckDB oracle can replay the identical pipeline.
  */
object BinaryAnn {

  /** 1024 sign bits packed into 16 longs. */
  val Words: Int = Embeddings.RefDims / 64

  /** Hamming candidates per query kept for exact rerank. */
  val CandR = 32

  /** Final neighbors per query. */
  val K = 3

  /** Query vectors: the first [[NQ]] corpus ids (as q26). */
  val NQ = 3

  /** Sign-pack a 1024-d vector into [[Words]] longs, MSB-first within
    * each word: bit for dimension `64w + i` (0-based) lands at
    * position `63 - i` of word `w`. Zero counts as positive —
    * mirrored exactly in the oracle's `>= 0`. Native expression
    * ([[graft.expressions.SignPack]]): the HOF form re-evaluates an
    * inlined producer once per word (16× featurize per row — the
    * TextOps-documented lambda-capture trap, measured 0.41→4.6 s on
    * the sf0.1 scan); the native packer reads its child exactly once. */
  def signPack(v: Column): Column = graft.expressions.SignPack.pack(v)

  /** HOF formulation of [[signPack]] — kept as the portable reference
    * implementation (equivalence property-tested in BinaryAnnSpec).
    * Do NOT use over an expensive inlined producer; see above. */
  def signPackHof(v: Column): Column =
    transform(sequence(lit(0), lit(Words - 1)), w =>
      aggregate(slice(v, w * lit(64) + lit(1), lit(64)), lit(0L),
        (acc, x) => shiftleft(acc, 1) + when(x >= 0, lit(1L)).otherwise(lit(0L))))

  /** Hamming distance between two packed codes: Σ popcount(a⊕b). */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** q201: binary-quantized ANN — Hamming top-[[CandR]] prefilter on
    * packed sign codes, exact cosine rerank to top-[[K]]. Ties break
    * on vec_id at BOTH stages so the candidate set (and therefore the
    * answer) is fully deterministic and oracle-replayable. The
    * reported row carries the candidate's Hamming distance next to
    * its exact cosine — the audit column that shows how well the
    * 1-bit code ordered the true neighbors. */
  def hammingRerank(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Corpus.docEmbeddings(spark, sfDir)
    val codes = e.select(col("vec_id"), signPack(col("v")).as("code"))
    val qCodes = codes.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("code").as("qcode"))
    val cand = codes.crossJoin(broadcast(qCodes))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("ham", hamming(col("code"), col("qcode")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("ham"), col("vec_id"))))
      .filter(col("crank") <= CandR)
      .select(col("q_id"), col("vec_id"), col("ham"))
    // candidate-vector fetch: gate the RAW table by the broadcast
    // candidate keys FIRST, then derive vectors for the R·|Q|
    // survivors only — the full-corpus featurize happens exactly once
    // (the code scan above). At 100 TB this is the point-lookup
    // against the stored vector column; here the join-then-derive
    // order keeps the derivation off the corpus-scale path too.
    val stored = Embeddings.embedStored(col("text"))
    val candVecs = Tables.documents(spark, sfDir)
      .join(broadcast(cand), col("doc_id") === col("vec_id"))
      .withColumn("v", stored)
      .select(col("q_id"), col("vec_id"), col("ham"), col("v"))
    val qVecs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < NQ)
      .select(col("doc_id").as("q_id"), stored.as("qv"))
    candVecs
      .join(broadcast(qVecs), Seq("q_id"))
      .withColumn("sim", VectorOps.cosine(col("v"), col("qv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("n_id"), col("ham"),
        round(col("sim"), 6).as("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** DuckDB oracle: the SEMANTIC restatement of the same two-stage
    * pipeline — Hamming counted directly as sign disagreements over
    * the double vectors (bit-packing changes the representation,
    * never the distance), identical tie-breaks, identical cosine. */
  val hammingRerankSql: String = {
    val dims = Embeddings.RefDims
    s"""WITH ${Corpus.docEmbCte},
      |q AS (SELECT vec_id AS q_id, v AS qv FROM demb WHERE vec_id < $NQ),
      |ham AS (
      |  SELECT q.q_id, e.vec_id, e.v, q.qv,
      |    len(list_filter(range(1, ${dims + 1}),
      |      i -> (e.v[i] >= 0) != (q.qv[i] >= 0))) AS ham
      |  FROM demb e CROSS JOIN q WHERE e.vec_id <> q.q_id),
      |cand AS (
      |  SELECT q_id, vec_id, v, qv, ham,
      |    row_number() OVER (PARTITION BY q_id ORDER BY ham, vec_id) AS crank
      |  FROM ham),
      |rer AS (
      |  SELECT q_id, vec_id, ham,
      |    CASE WHEN sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv)) = 0
      |         THEN 0.0 ELSE list_dot_product(v, qv)
      |           / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) END AS sim
      |  FROM cand WHERE crank <= $CandR),
      |ranked AS (
      |  SELECT q_id, vec_id, ham, sim,
      |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
      |  FROM rer)
      |SELECT q_id, rank, vec_id AS n_id, ham, ROUND(sim, 6) AS sim
      |FROM ranked WHERE rank <= $K
      |ORDER BY q_id, rank""".stripMargin
  }
}
