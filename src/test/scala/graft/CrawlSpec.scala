package graft

import graft.ops.Crawl

/** Spider restriction semantics (S1): allowed_domains pruning +
  * robots disallow, applied at link expansion like the reference's
  * LinkExtractor/ROBOTSTXT_OBEY. */
class CrawlSpec extends SparkSpec {

  test("restricted BFS visits a strict subset of the open BFS") {
    val open = Crawl.frontierBfs(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val restricted = Crawl.frontierBfsRestricted(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(restricted(0) === 1L) // the seed always crawls
    (1 to Crawl.MaxDepth).foreach { d =>
      assert(restricted.getOrElse(d, 0L) < open(d),
        s"depth $d not pruned: ${restricted.get(d)} vs ${open(d)}")
    }
  }

  test("no off-domain or robots-disallowed page is ever fetched") {
    import org.apache.spark.sql.functions._
    val visited = Crawl.restrictedVisited(spark, sfDir)
    // every fetched page beyond the seed satisfies the spider policy
    val violations = visited.filter(col("depth") > 0)
      .filter(!Crawl.allowedTarget(col("node"))).count()
    assert(violations === 0L)
    // and the restriction isn't vacuous: the open BFS DOES fetch
    // pages this policy forbids
    val open = Crawl.frontierBfs(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val restricted = visited.groupBy(col("depth")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert((1 to Crawl.MaxDepth).exists(d =>
      restricted.getOrElse(d, 0L) < open(d)))
  }
}
