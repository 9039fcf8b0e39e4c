package graft

import graft.ops.{Graph, Ranking}

class RankingSpec extends SparkSpec {
  import spark.implicits._

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

  test("pq ann: approximate distances ascend and select closer-than-average vectors") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorOps
    val rows = ops.PQ.pqAnn(spark, sfDir).collect()
    assert(rows.length === 10)
    val ds = rows.map(_.getAs[Double]("approx_d2"))
    assert(ds.forall(_ >= 0))
    assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
    // quality: the PQ-selected neighbors must be genuinely closer to
    // the query than a random vector, measured with EXACT distances
    val e = Tables.embeddings(spark, sfDir)
      .select($"vec_id", VectorOps.toDouble($"embedding").as("v"))
    val q = e.filter($"vec_id" === 0).select($"v".as("qv"))
    val exact = e.filter($"vec_id" =!= 0).crossJoin(broadcast(q))
      .select($"vec_id",
        (VectorOps.dot($"v", $"v") - lit(2.0) * VectorOps.dot($"v", $"qv")
          + VectorOps.dot($"qv", $"qv")).as("d2"))
    val avgAll = exact.agg(avg($"d2")).as[Double].head()
    val picked = rows.map(_.getAs[Long]("n_id")).toSeq
    val avgPicked = exact.filter($"vec_id".isin(picked: _*))
      .agg(avg($"d2")).as[Double].head()
    assert(avgPicked < avgAll,
      s"PQ picked no-better-than-random neighbors: $avgPicked vs $avgAll")
  }

  test("unigram logprob: rare-token documents score as more surprising") {
    val docs = Seq(
      (1L, "the the the and and of of to to a a"), // all common tokens
      (2L, "the and of to a"),                     // common, shorter
      (3L, "zyxqf wvutk jqmbn plgdh xcvbz"))       // singletons only
      .toDF("doc_id", "text")
    val rows = Ranking.unigramLogprobOf(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("avg_logprob")).toMap
    assert(rows(3L) < rows(1L) && rows(3L) < rows(2L),
      s"gibberish doc not most surprising: $rows")
    assert(rows.values.forall(_ < 0))
  }

  test("pagerank: a heavily-linked hub outranks the uniform floor") {
    val rows = Graph.pageRank(spark, sfDir).collect()
    // top-10 of a 2000-node graph must all clear 1/N (they attract
    // in-link mass; the floor is the no-inbound teleport share)
    rows.foreach(r => assert(r.getAs[Double]("rank") > 1.0 / 2000))
  }

  test("kneser-ney: every context's probability mass sums to one") {
    import graft.functions.TextOps
    import org.apache.spark.sql.functions._
    val D = 0.75
    val occ = Tables.documents(spark, sfDir)
      .select($"doc_id", TextOps.tokens($"text").as("toks"))
      .withColumn("n", size($"toks")).filter($"n" >= 2)
      .select(explode(zip_with(
        slice($"toks", lit(1), $"n" - 1), slice($"toks", lit(2), $"n" - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select($"bg.w1", $"bg.w2")
    val bi = occ.groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
      .as[(String, String, Long)].collect()
    val vocabW2 = bi.map(_._2).distinct
    val c1 = bi.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val n1pFwd = bi.groupBy(_._1).view.mapValues(_.size).toMap
    val n1pBwd = bi.groupBy(_._2).view.mapValues(_.size).toMap
    val nbb = bi.length.toDouble
    val seen = bi.map(r => (r._1, r._2) -> r._3).toMap
    // all contexts at sf0.001's ~30-word vocab: full sweep is cheap
    c1.keys.foreach { w1 =>
      val mass = vocabW2.map { w2 =>
        val c2 = seen.getOrElse((w1, w2), 0L).toDouble
        (math.max(c2 - D, 0.0)
          + D * n1pFwd(w1) * (n1pBwd(w2) / nbb)) / c1(w1)
      }.sum
      // continuation mass beyond vocabW2 is zero: N1+ covers exactly
      // the observed continuations
      assert(math.abs(mass - 1.0) < 1e-9, s"context '$w1' mass $mass")
    }
  }

  test("kneser-ney: q180 output is ascending with doc_id tie-break") {
    val rows = graft.ops.Ranking.knesserNey(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty && rows.size <= 15)
    assert(rows.sortBy(r => (r._3, r._1)) === rows)
    assert(rows.forall(_._3 < 0.0), "log-probabilities must be negative")
  }
}
