package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic derivation of the reference's two tables —
  * `web_pages` (the crawled corpus, reference `models.py:22-41`) and
  * `jobs` (the crawl ledger, `models.py:43-55`) — from the driver's
  * shared parquet testdata, so every serving query is
  * oracle-checkable: the identical derivation is emitted as a SQL CTE
  * prefix ([[webPagesCte]] / [[jobsCte]]) for DuckDB.
  *
  * Faithfulness notes (SURVEY quirks): title is NULL for id%7==0 rows
  * so the null-strict FTS concat (Q5) is exercised; meta_tags stores
  * tag NAMES only (Q3); file_type/embedding_type follow the
  * reference's html/pdf/image + text/vision domains
  * (`dynamic_spider.py:75`, `file_handler.py:37-62`).
  */
object Corpus {

  val NDomains = 20

  /** Typed row for the corpus — the `Dataset[T]` boundary the
    * reference models with Pydantic (`models.py:57-75`). */
  case class WebPage(
      id: Long,
      url: String,
      domain: String,
      title: Option[String],
      meta_description: String,
      meta_tags: Seq[String],
      content: String,
      file_type: String,
      embedding_type: String,
      last_crawled: java.sql.Timestamp)

  /** Typed view of [[webPages]] — compile-time field checks for
    * API-boundary code; the DataFrame plan underneath is unchanged. */
  def typedWebPages(spark: SparkSession,
      sfDir: String): org.apache.spark.sql.Dataset[WebPage] = {
    import spark.implicits._
    webPages(spark, sfDir).as[WebPage]
  }

  /** web_pages ← part. Purely scalar derivation → identical rows in
    * Spark and DuckDB; scales with the part table. */
  def webPages(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.part(spark, sfDir)
    val id = col("p_partkey")
    p.select(
      id.as("id"),
      concat(lit("https://d"), pmod(id, lit(NDomains)), lit(".test/p/"), id)
        .as("url"),
      concat(lit("d"), pmod(id, lit(NDomains)), lit(".test")).as("domain"),
      when(pmod(id, lit(7)) === 0, lit(null).cast("string"))
        .otherwise(col("p_name")).as("title"),
      col("p_type").as("meta_description"),
      when(pmod(id, lit(3)) === 0, array(lit("description")))
        .otherwise(array(lit("description"), lit("keywords")))
        .as("meta_tags"),
      concat_ws(" ", col("p_name"), col("p_type"), lit("brand"),
        col("p_brand")).as("content"),
      when(pmod(id, lit(10)) < 8, lit("html"))
        .when(pmod(id, lit(10)) === 8, lit("pdf"))
        .otherwise(lit("image")).as("file_type"),
      when(pmod(id, lit(10)) === 9, lit("vision"))
        .otherwise(lit("text")).as("embedding_type"),
      expr("timestamp'2025-01-01 00:00:00' + make_interval(0,0,0,0,0,0, p_partkey % 86400)")
        .as("last_crawled"))
  }

  /** The same derivation as ANSI SQL for the DuckDB oracle. */
  val webPagesCte: String =
    """web_pages AS (
      |  SELECT p_partkey AS id,
      |    'https://d' || (p_partkey % 20) || '.test/p/' || p_partkey AS url,
      |    'd' || (p_partkey % 20) || '.test' AS domain,
      |    CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE p_name END AS title,
      |    p_type AS meta_description,
      |    CASE WHEN p_partkey % 3 = 0 THEN ['description']
      |         ELSE ['description', 'keywords'] END AS meta_tags,
      |    p_name || ' ' || p_type || ' brand ' || p_brand AS content,
      |    CASE WHEN p_partkey % 10 < 8 THEN 'html'
      |         WHEN p_partkey % 10 = 8 THEN 'pdf' ELSE 'image' END AS file_type,
      |    CASE WHEN p_partkey % 10 = 9 THEN 'vision' ELSE 'text' END AS embedding_type,
      |    TIMESTAMP '2025-01-01 00:00:00'
      |      + (p_partkey % 86400) * INTERVAL 1 SECOND AS last_crawled
      |  FROM part)""".stripMargin

  /** jobs ← orders. Status machine domain: pending | queued | running
    * | completed | failed (SURVEY §2.I Q3). */
  def jobs(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val k = col("o_orderkey")
    o.select(
      concat(lit("job-"), k).as("id"),
      when(col("o_orderstatus") === "F",
          when(pmod(k, lit(11)) === 0, lit("failed")).otherwise(lit("completed")))
        .when(col("o_orderstatus") === "O", lit("running"))
        .otherwise(
          when(pmod(k, lit(2)) === 0, lit("pending")).otherwise(lit("queued")))
        .as("status"),
      concat(lit("d"), pmod(col("o_custkey"), lit(NDomains)), lit(".test"))
        .as("param_domain"),
      (pmod(k, lit(3)) + 1).cast("int").as("param_depth"),
      col("o_orderdate").as("created_at"),
      (col("o_orderdate") + expr("INTERVAL 300 SECONDS"))
        .as("updated_at"))
  }

  val jobsCte: String =
    """jobs AS (
      |  SELECT 'job-' || o_orderkey AS id,
      |    CASE WHEN o_orderstatus = 'F' THEN
      |           CASE WHEN o_orderkey % 11 = 0 THEN 'failed' ELSE 'completed' END
      |         WHEN o_orderstatus = 'O' THEN 'running'
      |         ELSE CASE WHEN o_orderkey % 2 = 0 THEN 'pending' ELSE 'queued' END
      |    END AS status,
      |    'd' || (o_custkey % 20) || '.test' AS param_domain,
      |    CAST(o_orderkey % 3 + 1 AS INT) AS param_depth,
      |    o_orderdate AS created_at,
      |    o_orderdate + 300 * INTERVAL 1 SECOND AS updated_at
      |  FROM orders)""".stripMargin

  /** Corpus embeddings at REFERENCE dimensionality (`models.py:32`
    * `Vector(1024)`): every page's stored vector is the deterministic
    * featurization of its content at [[graft.functions.Embeddings.ModelDims]],
    * normalized-then-truncated to 1024 (quirk Q1 — stored vectors are
    * intentionally not unit norm). One codegen'd scan, no join — at
    * 100 TB the embedding column arrives precomputed from ingest; this
    * derivation computes the identical value on the fly so the oracle
    * can replay it. */
  def webPagesWithEmbeddings(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.{Embeddings, VectorOps}
    webPages(spark, sfDir).withColumn("embedding",
      VectorOps.truncateKnown(
        Embeddings.featurize(col("content"), Embeddings.ModelDims),
        Embeddings.RefDims))
  }

  /** CTE for [[webPagesWithEmbeddings]] — the identical featurize →
    * truncate chain over the content column, materialized once. */
  val webPagesEmbCte: String = {
    import graft.functions.Embeddings
    webPagesCte + ",\n" +
      Embeddings.featurizeCtes("web_pages", "id", "content",
        dims = Embeddings.ModelDims, prefix = "wp") + ",\n" +
      s"""wp_emb AS MATERIALIZED (
        |  SELECT w.*, f.v[1:${Embeddings.RefDims}] AS embedding
        |  FROM web_pages w JOIN wpfeat f USING (id))""".stripMargin
  }

  /** Document-corpus embeddings at reference dimensionality — the
    * shared 1024-d input for brute-force KNN, embedding near-dup, and
    * PQ-ANN (q26/q27/q67). `(vec_id, v)`, v not unit norm (quirk Q1). */
  def docEmbeddings(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.{Embeddings, VectorOps}
    Tables.documents(spark, sfDir).select(
      col("doc_id").as("vec_id"),
      VectorOps.truncateKnown(
        Embeddings.featurize(col("text"), Embeddings.ModelDims),
        Embeddings.RefDims).as("v"))
  }

  /** CTE chain for [[docEmbeddings]] → `demb(vec_id, v)`.
    * MATERIALIZED: the 1280-dim featurize chain is the expensive part
    * and every consumer references demb several times. */
  val docEmbCte: String = {
    import graft.functions.Embeddings
    Embeddings.featurizeCtes("documents", "doc_id", "text",
      dims = Embeddings.ModelDims, prefix = "d") + ",\n" +
      s"""demb AS MATERIALIZED (
        |  SELECT doc_id AS vec_id, v[1:${Embeddings.RefDims}] AS v
        |  FROM dfeat)""".stripMargin
  }
}
