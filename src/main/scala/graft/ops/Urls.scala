package graft.ops

import graft.Corpus
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URL canonicalization — the normalization pass every crawl dedup
  * runs before the `ON CONFLICT (url)` upsert (reference `db.py:42-57`
  * keys the corpus by raw url; real pipelines canonicalize first so
  * `HTTPS://HOST:443/x#frag` and `https://host/x?utm_source=...`
  * collapse to one row).
  *
  * Rules (all pure regexp/array builtins, codegen'd, one scan):
  * lowercase scheme+host, strip default ports (:80/:443), drop the
  * fragment, drop tracking params (utm_*, ref=) while PRESERVING the
  * order of surviving params, strip trailing slashes. The test query
  * derives four deterministic messy variants per page and proves the
  * collapse; variants carrying a real query param stay distinct.
  */
object Urls {

  /** Canonicalize a URL column. */
  def canonicalize(u: Column): Column = {
    val scheme = lower(regexp_extract(u, "^([A-Za-z]+)://", 1))
    val host = regexp_replace(
      lower(regexp_extract(u, "^[A-Za-z]+://([^/?#]*)", 1)),
      ":(443|80)$", "")
    val rest = regexp_extract(u, "^[A-Za-z]+://[^/?#]*(.*)$", 1)
    val noFrag = regexp_replace(rest, "#.*$", "")
    val path = regexp_replace(regexp_extract(noFrag, "^([^?]*)", 1), "/+$", "")
    val qs = regexp_extract(noFrag, "\\?(.*)$", 1)
    val params = filter(split(qs, "&"), p =>
      p =!= "" && !p.startsWith("utm_") && !p.startsWith("ref="))
    val canonQ = array_join(params, "&")
    concat(scheme, lit("://"), host, path,
      when(canonQ =!= "", concat(lit("?"), canonQ)).otherwise(lit("")))
  }

  /** q85: four messy variants per page (tracking params, fragment,
    * uppercase host + default port, trailing slash) → canonicalize →
    * group. Pages collapse 3-to-1 (the kept `id=` param variant stays
    * its own canonical row) — the dedup key a 100 TB crawl actually
    * upserts on. */
  def urlCanonical(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Corpus.webPages(spark, sfDir)
      .filter(col("id") < 50)
      .select(col("id"), col("url"), col("domain"))
    val variants = base.select(col("id"), explode(array(
      concat(col("url"), lit("?id="), pmod(col("id"), lit(3)),
        lit("&utm_source=feed&ref=home")),
      concat(col("url"), lit("#section-2")),
      concat(lit("HTTPS://"), upper(col("domain")), lit(":443/p/"), col("id")),
      concat(col("url"), lit("/")))).as("raw"))
    variants
      .withColumn("canon", canonicalize(col("raw")))
      .groupBy(col("canon"))
      .agg(count(lit(1)).as("n_variants"), min(col("id")).as("min_id"))
      .orderBy(col("canon"))
  }

  val urlCanonicalSql: String =
    """WITH base AS (
      |  SELECT p_partkey AS id,
      |    'https://d' || (p_partkey % 20) || '.test/p/' || p_partkey AS url,
      |    'd' || (p_partkey % 20) || '.test' AS domain
      |  FROM part WHERE p_partkey < 50),
      |variants AS (
      |  SELECT id, unnest([
      |    url || '?id=' || (id % 3) || '&utm_source=feed&ref=home',
      |    url || '#section-2',
      |    'HTTPS://' || upper(domain) || ':443/p/' || id,
      |    url || '/']) AS raw
      |  FROM base),
      |c AS (
      |  SELECT id,
      |    lower(regexp_extract(raw, '^([A-Za-z]+)://', 1)) || '://'
      |    || regexp_replace(lower(regexp_extract(raw, '^[A-Za-z]+://([^/?#]*)', 1)), ':(443|80)$', '')
      |    || regexp_replace(regexp_extract(regexp_replace(regexp_extract(raw, '^[A-Za-z]+://[^/?#]*(.*)$', 1), '#.*$', ''), '^([^?]*)', 1), '/+$', '')
      |    || CASE WHEN array_to_string(list_filter(string_split(
      |           regexp_extract(regexp_replace(regexp_extract(raw, '^[A-Za-z]+://[^/?#]*(.*)$', 1), '#.*$', ''), '\?(.*)$', 1), '&'),
      |           p -> p != '' AND substr(p, 1, 4) != 'utm_' AND substr(p, 1, 4) != 'ref='), '&') != ''
      |         THEN '?' || array_to_string(list_filter(string_split(
      |           regexp_extract(regexp_replace(regexp_extract(raw, '^[A-Za-z]+://[^/?#]*(.*)$', 1), '#.*$', ''), '\?(.*)$', 1), '&'),
      |           p -> p != '' AND substr(p, 1, 4) != 'utm_' AND substr(p, 1, 4) != 'ref='), '&')
      |         ELSE '' END AS canon
      |  FROM variants)
      |SELECT canon, COUNT(*) AS n_variants, MIN(id) AS min_id
      |FROM c GROUP BY canon ORDER BY canon""".stripMargin
}
