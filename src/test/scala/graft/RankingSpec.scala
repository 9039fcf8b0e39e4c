package graft

import graft.ops.{Graph, Ranking}

class RankingSpec extends SparkSpec {

  test("bm25: scores positive, descending, hit counts within query size") {
    val rows = Ranking.bm25(spark, sfDir).collect()
    assert(rows.length === 10)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.forall(_ > 0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val hits = r.getAs[Long]("n_terms_hit")
      assert(hits >= 1 && hits <= Ranking.QueryTerms.size)
    }
  }

  test("bm25: top result hits every query term") {
    // with three common query terms over this corpus, the best doc
    // must match on all of them (a 1-term doc can't outscore 3 idfs)
    val top = Ranking.bm25(spark, sfDir).collect().head
    assert(top.getAs[Long]("n_terms_hit") === Ranking.QueryTerms.size)
  }

  test("pagerank: positive ranks, descending, bounded by total mass") {
    val rows = Graph.pageRank(spark, sfDir).collect()
    assert(rows.length === 10)
    val ranks = rows.map(_.getAs[Double]("rank"))
    assert(ranks.forall(r => r > 0 && r < 1))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
  }

  test("pagerank: a heavily-linked hub outranks the uniform floor") {
    val rows = Graph.pageRank(spark, sfDir).collect()
    // top-10 of a 2000-node graph must all clear 1/N (they attract
    // in-link mass; the floor is the no-inbound teleport share)
    rows.foreach(r => assert(r.getAs[Double]("rank") > 1.0 / 2000))
  }
}
