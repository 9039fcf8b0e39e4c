package graft

import graft.ops.EntityResolution
import org.apache.spark.sql.functions._

/** Entity resolution (q171): from-scratch driver replay — independent
  * Levenshtein + union-find closure over the same blocked candidate
  * pairs — plus planted-truth recall and partitioning invariance.
  */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** Independent replay: records → exact name groups → blocked
    * pairwise Levenshtein → union-find → per-cluster rollup. */
  private def replay(): Seq[(Long, Long, Long, String)] = {
    val base = Tables.part(spark, sfDir)
      .select($"p_partkey".cast("long"), $"p_name")
      .as[(Long, String)].collect().toSeq
    val recs = base ++
      base.collect { case (id, n) if id % 5 == 0 =>
        (id + 1000000L, n.dropRight(1) + "x") } ++
      base.collect { case (id, n) if id % 7 == 0 =>
        (id + 2000000L, n.dropRight(1)) }
    val groups = recs.groupBy(_._2).map { case (name, rs) =>
      (name, name.take(8), rs.map(_._1).min, rs.size.toLong)
    }.toSeq
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
    }
    val pairList = for {
      (na, ba, ga, _) <- groups; (nb, bb, gb, _) <- groups
      if ba == bb && ga < gb && lev(na, nb) <= EntityResolution.MaxDist
    } yield (ga, gb)
    pairList.foreach { case (a, b) => union(a, b) }
    val touched = pairList.flatMap(p => Seq(p._1, p._2)).toSet
    groups.filter(g => touched.contains(g._3))
      .groupBy(g => find(g._3)).values
      .map { gs =>
        (gs.map(_._3).min, gs.size.toLong, gs.map(_._4).sum,
          gs.minBy(_._3)._1)
      }.toSeq.sortBy(_._1)
  }

  test("q171 equals a from-scratch union-find replay") {
    val got = EntityResolution.resolveCatalog(spark, sfDir)
      .as[(Long, Long, Long, String)].collect().toSeq
    val want = replay()
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("planted variants resolve into their base record's cluster") {
    val out = EntityResolution.resolveCatalog(spark, sfDir)
    val clusters = out.select($"cluster_id", $"n_names", $"n_records")
      .as[(Long, Long, Long)].collect()
    // every cluster has ≥ 2 name-groups or ≥ 2 records (something
    // actually matched), and at least one cluster carries a planted
    // multi-name merge
    assert(clusters.forall { case (_, nn, nr) => nn >= 2 || nr >= 2 })
    assert(clusters.exists(_._2 >= 2), "planted typo must merge names")
  }

  test("result is invariant to input partitioning") {
    val a = EntityResolution.resolveCatalog(spark, sfDir).collect().toSeq
    val b = EntityResolution.resolveCatalog(spark, sfDir).collect().toSeq
    assert(a === b)
  }
}
