package graft.ops

import graft.Corpus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert sink (S5): the reference's `INSERT ... ON CONFLICT (url)
  * DO UPDATE` (`db.py:29-69`) over an immutable columnar store —
  * merge = union + keep the newest row per url via a window.
  *
  * Scale: the window partitions by the merge key, so the shuffle is
  * hash(url) — the same shuffle a shuffled-hash merge would need, and
  * AQE coalesces the post-shuffle partitions. Idempotent by
  * construction (same batch applied twice → same table), which is
  * what makes the streaming ingest effectively exactly-once
  * (SURVEY §2.I Q2).
  */
object Upsert {

  /** Merge a derived update batch (every id%5==0 page re-crawled one
    * day later with new content, plus 10 brand-new urls) into
    * web_pages; emit verification aggregates over the merged state. */
  def upsertMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val wp = Corpus.webPages(spark, sfDir)
    val cols = wp.columns.map(col)

    val updates = wp.filter(pmod(col("id"), lit(5)) === 0)
      .withColumn("content", concat(lit("updated "), col("content")))
      .withColumn("last_crawled",
        col("last_crawled") + expr("INTERVAL 1 DAY"))
    val inserts = wp.orderBy(col("id").desc).limit(10)
      .withColumn("id", col("id") + 1000000)
      .withColumn("url", concat(lit("https://new.test/p/"), col("id")))
      .withColumn("content", lit("fresh page"))

    val merged = wp.unionByName(updates).unionByName(inserts)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("url"))
          .orderBy(col("last_crawled").desc, col("id").desc)))
      .filter(col("rn") === 1).drop("rn")

    merged.agg(
      count(lit(1)).as("n_rows"),
      count(when(col("content").startsWith("updated "), 1)).as("n_updated"),
      count(when(col("content") === "fresh page", 1)).as("n_inserted"),
      sum(col("id")).as("id_sum"),
      unix_timestamp(max(col("last_crawled"))).as("max_crawled_s"))
  }

  val upsertMergeSql: String =
    s"""WITH ${Corpus.webPagesCte},
      |updates AS (
      |  SELECT id, url, domain, title, meta_description, meta_tags,
      |    'updated ' || content AS content, file_type, embedding_type,
      |    last_crawled + INTERVAL 1 DAY AS last_crawled
      |  FROM web_pages WHERE id % 5 = 0),
      |inserts AS (
      |  SELECT id + 1000000 AS id, 'https://new.test/p/' || (id + 1000000) AS url,
      |    domain, title, meta_description, meta_tags,
      |    'fresh page' AS content, file_type, embedding_type, last_crawled
      |  FROM web_pages ORDER BY id DESC LIMIT 10),
      |unioned AS (
      |  SELECT id, url, content, last_crawled FROM web_pages
      |  UNION ALL SELECT id, url, content, last_crawled FROM updates
      |  UNION ALL SELECT id, url, content, last_crawled FROM inserts),
      |merged AS (
      |  SELECT * FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY url
      |      ORDER BY last_crawled DESC, id DESC) AS rn
      |    FROM unioned)
      |  WHERE rn = 1)
      |SELECT COUNT(*) AS n_rows,
      |  COUNT(*) FILTER (WHERE content LIKE 'updated %') AS n_updated,
      |  COUNT(*) FILTER (WHERE content = 'fresh page') AS n_inserted,
      |  CAST(SUM(id) AS BIGINT) AS id_sum,
      |  CAST(epoch(MAX(last_crawled)) AS BIGINT) AS max_crawled_s
      |FROM merged""".stripMargin
}
