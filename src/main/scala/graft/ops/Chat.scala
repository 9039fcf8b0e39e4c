package graft.ops

import graft.Tables
import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RAG chat stream decode (the tail of P13/E3): the reference streams
  * an Ollama chat response as NDJSON chunks and reassembles the
  * answer line by line — `json.loads` per line, append
  * `message.content` when non-empty, stop at `done`
  * (`backend/src/search.py:146-170`; the `/api/chat` SSE relay,
  * `main.py:217-236`, pairs the streamed answer with the RAG context
  * of q12).
  *
  * Spark shape: a deterministic chunk table (chat_id, seq, NDJSON
  * line) stands in for the network stream — one line per token of
  * the first five documents plus a terminal `done` line — then the
  * decode under test is pure columns: `from_json` per line, the
  * non-empty-content filter, the done-cutoff (chunks at or past the
  * first `done` seq are dropped, the loop's `break`), an ordered
  * string reassembly per chat, and the q12 context cross-joined onto
  * every answer row (1-row broadcast). One scan, no UDFs.
  */
object Chat {

  val NChats = 5

  private val chunkSchema = StructType(Seq(
    StructField("model", StringType),
    StructField("message", StructType(Seq(
      StructField("role", StringType),
      StructField("content", StringType)))),
    StructField("done", BooleanType)))

  /** The synthetic NDJSON stream: for each chat, one chunk per token
    * ("tok ") in order, then a terminal empty-content done chunk —
    * the exact line shape Ollama streams. */
  private[graft] def chunks(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < NChats)
      .select(col("doc_id").as("chat_id"), TextOps.tokens(col("text")).as("toks"))
    val tokLines = docs
      .select(col("chat_id"), posexplode(col("toks")))
      .toDF("chat_id", "seq", "tok")
      .select(col("chat_id"), col("seq"),
        concat(
          lit("""{"model":"graft","message":{"role":"assistant","content":""""),
          col("tok"),
          lit(""" "},"done":false}""")).as("line"))
    val doneLine = docs.select(col("chat_id"), size(col("toks")).as("seq"),
      lit("""{"model":"graft","message":{"role":"assistant","content":""},"done":true}""")
        .as("line"))
    tokLines.unionByName(doneLine)
  }

  /** q74: decode the chunk stream → ordered answer per chat, joined
    * with the RAG context. */
  def chatStream(spark: SparkSession, sfDir: String): DataFrame = {
    val decoded = chunks(spark, sfDir)
      .withColumn("c", from_json(col("line"), chunkSchema))
      .select(col("chat_id"), col("seq"),
        col("c.message.content").as("content"), col("c.done").as("done"))
    val doneAt = decoded.filter(col("done") === true)
      .groupBy(col("chat_id")).agg(min(col("seq")).as("dseq"))
    val kept = decoded.join(broadcast(doneAt), Seq("chat_id"), "left")
      .filter(coalesce(col("content"), lit("")) =!= "" &&
        (col("dseq").isNull || col("seq") < col("dseq")))
    val answers = kept.groupBy(col("chat_id"))
      .agg(count(lit(1)).as("n_chunks"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("seq"), col("content")))),
            x => x.getField("content")),
          "").as("answer"))
    answers
      .crossJoin(broadcast(Search.ragContext(spark, sfDir)))
      .select(col("chat_id"), col("n_chunks"), col("answer"), col("context"))
      .orderBy(col("chat_id"))
  }

  val chatStreamSql: String = {
    val tokSql = TextOps.tokSql()
    s"""WITH ${graft.Corpus.webPagesEmbCte},
      |${Search.queryVectorSql},
      |top5 AS (
      |  SELECT id, distance, 'URL: ' || url || chr(10) || 'Content: ' || content AS chunk
      |  FROM (
      |    SELECT w.id, w.url, w.content,
      |      ROUND(-list_dot_product(w.embedding, q.q_emb), 6) AS distance
      |    FROM wp_emb w CROSS JOIN qv q)
      |  ORDER BY distance, id
      |  LIMIT 5),
      |ctx AS (
      |  SELECT string_agg(chunk, chr(10) || chr(10) ORDER BY distance, id) AS context
      |  FROM top5),
      |docs AS (
      |  SELECT doc_id AS chat_id, $tokSql AS toks
      |  FROM documents WHERE doc_id < $NChats),
      |chunks AS (
      |  SELECT chat_id, u['seq'] AS seq,
      |    '{"model":"graft","message":{"role":"assistant","content":"'
      |      || u['tok'] || ' "},"done":false}' AS line
      |  FROM (
      |    SELECT chat_id,
      |      unnest(list_transform(toks, (x, i) -> {'seq': i - 1, 'tok': x})) AS u
      |    FROM docs)
      |  UNION ALL
      |  SELECT chat_id, len(toks) AS seq,
      |    '{"model":"graft","message":{"role":"assistant","content":""},"done":true}' AS line
      |  FROM docs),
      |decoded AS (
      |  SELECT chat_id, seq,
      |    json_extract_string(line, '$$.message.content') AS content,
      |    CAST(json_extract(line, '$$.done') AS BOOLEAN) AS done
      |  FROM chunks),
      |done_at AS (SELECT chat_id, MIN(seq) AS dseq FROM decoded WHERE done GROUP BY chat_id),
      |kept AS (
      |  SELECT d.chat_id, d.seq, d.content
      |  FROM decoded d LEFT JOIN done_at da USING (chat_id)
      |  WHERE COALESCE(d.content, '') <> '' AND (da.dseq IS NULL OR d.seq < da.dseq)),
      |answers AS (
      |  SELECT chat_id, COUNT(*) AS n_chunks,
      |    string_agg(content, '' ORDER BY seq) AS answer
      |  FROM kept GROUP BY chat_id)
      |SELECT a.chat_id, a.n_chunks, a.answer, c.context
      |FROM answers a CROSS JOIN ctx c
      |ORDER BY chat_id""".stripMargin
  }
}
