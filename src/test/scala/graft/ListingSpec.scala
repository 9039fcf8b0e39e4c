package graft

import graft.ops.Search

/** O2 dynamic sort + pagination (quirk Q6): the reference interpolates
  * the caller's sort column raw (`search.py:68`) and defaults to a
  * column that doesn't exist on web_pages (`main.py:96`); ours
  * validates against the schema and defaults to `last_crawled`. */
class ListingSpec extends SparkSpec {

  test("valid sort columns pass validation unchanged") {
    assert(Search.resolveSortColumn("id") === "id")
    assert(Search.resolveSortColumn("domain") === "domain")
    assert(Search.resolveSortColumn("last_crawled") === "last_crawled")
  }

  test("unknown / hostile / null sort columns fall back to last_crawled") {
    assert(Search.resolveSortColumn("created_at") === "last_crawled") // the reference's broken default
    assert(Search.resolveSortColumn("no_such_col") === "last_crawled")
    assert(Search.resolveSortColumn("id; DROP TABLE web_pages") === "last_crawled")
    assert(Search.resolveSortColumn(null) === "last_crawled")
  }

  test("listing pages are disjoint, ordered, and carry the same total") {
    val p1 = Search.listingPage(spark, sfDir, "widget", offset = 0, limit = 10).collect()
    val p2 = Search.listingPage(spark, sfDir, "widget", offset = 10, limit = 10).collect()
    val ids1 = p1.map(_.getAs[Long]("id")).toSet
    val ids2 = p2.map(_.getAs[Long]("id")).toSet
    assert(ids1.intersect(ids2).isEmpty, "pages overlap")
    assert(p1.map(_.getAs[Long]("total")).toSet === p2.map(_.getAs[Long]("total")).toSet)
    // default sort is last_crawled desc with id tiebreak: page 1's
    // minimum crawled_s must be >= page 2's maximum (desc ordering)
    if (p1.nonEmpty && p2.nonEmpty) {
      assert(p1.map(_.getAs[Long]("crawled_s")).min >=
        p2.map(_.getAs[Long]("crawled_s")).max)
    }
  }

  test("stemmed listing retrieves inflected forms plain FTS misses") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextOps
    val wp = graft.Corpus.webPages(spark, sfDir)
    val hay = concat(col("title"), lit(" "), col("domain"), lit(" "),
      col("url"))
    val q = lit("widgets gearing")
    val plain = wp.filter(TextOps.ftsMatch(hay, q) === true).count()
    val stemmed = wp.filter(TextOps.ftsMatchStemmed(hay, q) === true).count()
    // neither literal token exists in any title; both stem to words
    // ("widget", "gear") that do
    assert(stemmed > plain, s"stemmed=$stemmed plain=$plain")
    // the stemmed set contains every plain match (stemming only widens)
    val plainIds = wp.filter(TextOps.ftsMatch(hay, q) === true)
      .select("id").collect().map(_.getLong(0)).toSet
    val stemmedIds = wp.filter(TextOps.ftsMatchStemmed(hay, q) === true)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(plainIds.subsetOf(stemmedIds))
    // haystack-side stemming (no inflected forms exist in the corpus
    // vocabulary, so pin it on a synthetic frame): a root query finds
    // inflected document text
    import spark.implicits._
    val synth = Seq("sorted widgets arrived", "plain gear here", "nothing")
      .toDF("t")
    val hits = synth
      .filter(TextOps.ftsMatchStemmed(col("t"), lit("sort gearing")) === true)
      .count()
    assert(hits === 2,
      "haystack 'sorted' must stem to 'sort'; query 'gearing' to 'gear'")
    // and the q135 page itself is well-formed
    val page = Search.listingStemmed(spark, sfDir).collect()
    assert(page.nonEmpty && page.length <= 10)
    assert(page.map(_.getAs[Long]("total")).toSet.size === 1)
  }

  test("ascending sort by id paginates in key order") {
    val p = Search.listingPage(spark, sfDir, "widget", sortBy = "id",
      asc = true, offset = 0, limit = 5).collect()
    val ids = p.map(_.getAs[Long]("id")).toSeq
    assert(ids === ids.sorted)
  }
}
