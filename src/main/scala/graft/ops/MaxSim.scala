package graft.ops

import graft.Tables
import graft.functions.{Embeddings, TextOps, VectorOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Late-interaction (MaxSim) retrieval scoring — the token-level
  * refinement the single-vector retrieval operators (q10/q26/q65)
  * can't express: instead of one pooled vector per document, every
  * TOKEN carries its own embedding and a query scores a document as
  *
  *   score(q, d) = Σ_{t ∈ tokens(q)}  max_{s ∈ tokens(d)} ⟨E_t, E_s⟩
  *
  * (Khattab & Zaharia, ColBERT, SIGIR 2020). Token embeddings reuse
  * the engine's deterministic hash featurizer at [[TokDims]], so the
  * whole pipeline stays oracle-replayable.
  *
  * Scale shape: query tokens are a handful of rows — broadcast; the
  * per-(doc, query-token) max is a partial-aggregable groupBy (the
  * max combines map-side before any exchange, so the shuffle carries
  * one row per (doc, q_tok), not one per token pair); and the final
  * per-query top-k is a rank over |docs|·|queries| score rows. The
  * doc-token relation dedups (doc_id, token) BEFORE featurizing —
  * max is multiplicity-invariant, so repeated tokens add shuffle rows
  * but never change the answer; dropping them first is free
  * correctness. At 100 TB token embeddings arrive precomputed from
  * ingest; the on-the-fly featurize here stands in one codegen'd
  * scan expression.
  */
object MaxSim {

  /** Token-embedding width — small enough that the oracle's SQL
    * featurize over the distinct-token vocabulary stays cheap. */
  val TokDims = 16

  /** Documents returned per query. */
  val K = 5

  /** Fixed query strings over the documents vocabulary. */
  val Queries: Seq[(Long, String)] = Seq(
    (0L, "fast table scan"),
    (1L, "vector window merge batch"))

  /** q202: MaxSim late-interaction top-[[K]] over the documents
    * corpus. Ranking uses the ROUNDED score (6 dp): per-token dots
    * are bit-identical across engines (left-fold double, the
    * VectorOps contract) and max is order-free, but the final Σ over
    * query tokens accumulates in engine-dependent order — rounding
    * before the rank is what keeps the comparison deterministic. */
  def maxSimRerank(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docToks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .distinct()
      .withColumn("tv", Embeddings.featurize(col("tok"), TokDims))
    val qToks = Queries.toDF("q_id", "qtext")
      .select(col("q_id"), explode(TextOps.tokens(col("qtext"))).as("qtok"))
      .distinct()
      .withColumn("qv", Embeddings.featurize(col("qtok"), TokDims))
    val best = docToks.crossJoin(broadcast(qToks))
      .withColumn("d", VectorOps.dot(col("tv"), col("qv")))
      .groupBy(col("doc_id"), col("q_id"), col("qtok"))
      .agg(max(col("d")).as("m"))
    best.groupBy(col("q_id"), col("doc_id"))
      .agg(round(sum(col("m")), 6).as("score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("score"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** DuckDB oracle: identical pipeline — distinct doc/query tokens,
    * one featurize over the UNION vocabulary (same hash rule), max
    * per (doc, q_tok), rounded sum, same tie-breaks. */
  val maxSimRerankSql: String = {
    val qVals = Queries // CAST: Spark q_id is LongType, bare VALUES would type as INT
      .map { case (id, t) => s"(CAST($id AS BIGINT), '$t')" }.mkString(", ")
    s"""WITH dt AS (
      |  SELECT DISTINCT doc_id, unnest(${TextOps.tokSql("text")}) AS tok
      |  FROM documents),
      |qraw AS (SELECT * FROM (VALUES $qVals) AS t(q_id, qtext)),
      |qt AS (
      |  SELECT DISTINCT q_id, unnest(${TextOps.tokSql("qtext")}) AS qtok
      |  FROM qraw),
      |utok AS (
      |  SELECT DISTINCT tok
      |  FROM (SELECT tok FROM dt UNION ALL SELECT qtok AS tok FROM qt)),
      |${Embeddings.featurizeCtes("utok", "tok", "tok", dims = TokDims, prefix = "t")},
      |best AS (
      |  SELECT d.doc_id, q.q_id, q.qtok,
      |    max(list_dot_product(td.v, tq.v)) AS m
      |  FROM dt d
      |  JOIN tfeat td ON td.tok = d.tok
      |  CROSS JOIN qt q
      |  JOIN tfeat tq ON tq.tok = q.qtok
      |  GROUP BY d.doc_id, q.q_id, q.qtok),
      |scores AS (
      |  SELECT q_id, doc_id, ROUND(SUM(m), 6) AS score
      |  FROM best GROUP BY q_id, doc_id),
      |ranked AS (
      |  SELECT q_id, doc_id, score,
      |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rank
      |  FROM scores)
      |SELECT q_id, rank, doc_id, score
      |FROM ranked WHERE rank <= $K
      |ORDER BY q_id, rank""".stripMargin
  }
}
