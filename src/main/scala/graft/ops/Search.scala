package graft.ops

import graft.{Corpus, Tables}
import graft.functions.{TextOps, VectorOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's serving layer re-expressed Spark-first:
  * semantic KNN search (E2: `search.py:77-99` + `db.py:72-88`),
  * dashboard analytics (`search.py:20-44`), web-pages listing with
  * FTS + pagination (`search.py:47-74`), snippet extraction
  * (`search.py:102-112`), RAG context assembly (`search.py:127-138`).
  *
  * Scale notes: the KNN query is a 1×N broadcast theta-join — the
  * corpus side streams through a single projection + filter +
  * TakeOrderedAndProject, no shuffle of the corpus, no global sort;
  * at 100 TB this is the plan you want (embarrassingly parallel scan,
  * k-sized heap per partition, k·P-row driver merge).
  */
object Search {

  /** Semantic search (E2): score corpus against the query vector with
    * the reference's negative-inner-product distance (quirk Q2),
    * range-filter at 0.05, top-5 ascending. Query vector = shared
    * embedding row vec_id=0 (the deterministic stand-in for "embed
    * the query string", which in the reference is an Ollama call).
    */
  def semanticSearch(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = Corpus.webPagesWithEmbeddings(spark, sfDir)
    val q = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    corpus.crossJoin(broadcast(q))
      .withColumn("distance", VectorOps.negDot(col("embedding"), col("q_emb")))
      .filter(col("distance") <= 0.05)
      .orderBy(col("distance"), col("id"))
      .limit(5)
      .select(col("id"), col("url"), round(col("distance"), 6).as("distance"))
  }

  val semanticSearchSql: String =
    s"""WITH ${Corpus.webPagesEmbCte}
      |SELECT id, url, ROUND(distance, 6) AS distance FROM (
      |  SELECT w.id, w.url,
      |    -list_dot_product(CAST(w.embedding AS DOUBLE[]),
      |      CAST((SELECT embedding FROM embeddings WHERE vec_id = 0) AS DOUBLE[])) AS distance
      |  FROM wp_emb w)
      |WHERE distance <= 0.05
      |ORDER BY distance, id
      |LIMIT 5""".stripMargin

  /** Dashboard analytics (A1-A3): the reference runs four separate
    * queries over one connection; here it's one pass per table and a
    * 1×1 cross join — two tiny aggregates, no wide shuffle. */
  def dashboard(spark: SparkSession, sfDir: String): DataFrame = {
    val wp = Corpus.webPages(spark, sfDir)
    val jobs = Corpus.jobs(spark, sfDir)
    val wpAgg = wp.agg(
      count(lit(1)).as("total_urls"),
      countDistinct(col("domain")).as("total_domains"))
    val jobAgg = jobs.agg(
      count(when(col("status") === "running", 1)).as("running_crawlers"),
      count(when(col("status") === "completed", 1)).as("jobs_completed"))
    wpAgg.crossJoin(jobAgg)
  }

  val dashboardSql: String =
    s"""WITH ${Corpus.webPagesCte}, ${Corpus.jobsCte}
      |SELECT
      |  (SELECT COUNT(*) FROM web_pages) AS total_urls,
      |  (SELECT COUNT(DISTINCT domain) FROM web_pages) AS total_domains,
      |  (SELECT COUNT(*) FROM jobs WHERE status = 'running') AS running_crawlers,
      |  (SELECT COUNT(*) FROM jobs WHERE status = 'completed') AS jobs_completed""".stripMargin

  /** Web-pages listing (E3): FTS predicate over the null-strict
    * `title || domain || url` concat (quirk Q5 — NULL title hides the
    * row), total count as a window, dynamic sort last_crawled desc
    * with id tiebreak, offset 10 / limit 10 via row_number. */
  def listing(spark: SparkSession, sfDir: String): DataFrame = {
    val wp = Corpus.webPages(spark, sfDir)
    val hay = concat(col("title"), lit(" "), col("domain"), lit(" "),
      col("url"))
    val filtered = wp.filter(
      TextOps.ftsMatch(hay, lit("widget")) === true)
    val w = Window.orderBy(col("last_crawled").desc, col("id"))
    filtered
      .withColumn("total", count(lit(1)).over(
        Window.partitionBy()))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 10 && col("rn") <= 20)
      .select(col("total"), col("rn").cast("long").as("rn"), col("id"), col("url"), col("domain"),
        col("title"), unix_timestamp(col("last_crawled")).as("crawled_s"))
      .orderBy(col("rn"))
  }

  val listingSql: String =
    s"""WITH ${Corpus.webPagesCte},
      |filtered AS (
      |  SELECT * FROM web_pages
      |  WHERE len(list_intersect(
      |    list_filter(string_split_regex(lower(title || ' ' || domain || ' ' || url), '[^a-z0-9_]+'), x -> x != ''),
      |    ['widget'])) > 0)
      |SELECT total, rn, id, url, domain, title, crawled_s FROM (
      |  SELECT (SELECT COUNT(*) FROM filtered) AS total,
      |    ROW_NUMBER() OVER (ORDER BY last_crawled DESC, id) AS rn,
      |    id, url, domain, title, CAST(epoch(last_crawled) AS BIGINT) AS crawled_s
      |  FROM filtered)
      |WHERE rn > 10 AND rn <= 20
      |ORDER BY rn""".stripMargin

  /** Snippet search (P11 + F2) over the documents table: filter docs
    * containing any query token, emit the ±100-char window around the
    * first hit, top-10 by doc_id. */
  def snippetSearch(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val query = lit("merge window")
    docs.filter(TextOps.ftsMatch(col("text"), query) === true)
      .select(col("doc_id"),
        TextOps.snippet(col("text"), query).as("snippet"))
      .orderBy(col("doc_id"))
      .limit(10)
  }

  val snippetSearchSql: String =
    """WITH toks AS (SELECT ['merge', 'window'] AS qt)
      |SELECT doc_id,
      |  CASE WHEN pos > 0 THEN '... ' || substr(text, GREATEST(pos - 100, 1), 200) || ' ...'
      |       ELSE substr(text, 1, 200) || '...' END AS snippet
      |FROM (
      |  SELECT doc_id, text,
      |    CASE WHEN instr(lower(text), 'merge') > 0 THEN instr(lower(text), 'merge')
      |         ELSE COALESCE(instr(lower(text), 'window'), 0) END AS pos
      |  FROM documents, toks
      |  WHERE len(list_intersect(
      |    list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'), x -> x != ''),
      |    qt)) > 0)
      |ORDER BY doc_id
      |LIMIT 10""".stripMargin

  /** RAG context assembly (P12): top-5 semantic hits formatted
    * "URL: {url}\nContent: {content}" and joined with blank lines —
    * one ordered string aggregation. */
  def ragContext(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = Corpus.webPagesWithEmbeddings(spark, sfDir)
    val q = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val top = corpus.crossJoin(broadcast(q))
      .withColumn("distance",
        round(VectorOps.negDot(col("embedding"), col("q_emb")), 6))
      .orderBy(col("distance"), col("id"))
      .limit(5)
      .select(col("id"), col("distance"),
        concat(lit("URL: "), col("url"), lit("\nContent: "), col("content"))
          .as("chunk"))
    top.agg(
      array_join(
        transform(
          array_sort(collect_list(struct(col("distance"), col("id"),
            col("chunk")))),
          x => x.getField("chunk")),
        "\n\n").as("context"))
  }

  val ragContextSql: String =
    s"""WITH ${Corpus.webPagesEmbCte},
      |top5 AS (
      |  SELECT id, distance, 'URL: ' || url || chr(10) || 'Content: ' || content AS chunk
      |  FROM (
      |    SELECT w.id, w.url, w.content,
      |      ROUND(-list_dot_product(CAST(w.embedding AS DOUBLE[]),
      |        CAST((SELECT embedding FROM embeddings WHERE vec_id = 0) AS DOUBLE[])), 6) AS distance
      |    FROM wp_emb w)
      |  ORDER BY distance, id
      |  LIMIT 5)
      |SELECT string_agg(chunk, chr(10) || chr(10) ORDER BY distance, id) AS context
      |FROM top5""".stripMargin
}
