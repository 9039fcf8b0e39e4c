package graft

import graft.ops.{Graph, Index, Mixture, Sampling}
import graft.functions.TextOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantic guarantees of the round-5 curation/scale additions:
  * water-filling allocation invariants (q93), weighted-reservoir
  * equivalence to the window formulation (q92), triangle counts vs a
  * brute-force ordered 3-join (q94), and phrase matches vs a
  * sliding-window HOF recount (q95).
  */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  test("token budget: allocation exhausts the budget exactly, never exceeds supply") {
    val rows = Mixture.tokenBudget(spark, sfDir).collect()
    val totN = rows.map(_.getAs[Long]("n_tokens")).sum
    val budget = totN * Mixture.BudgetFrac
    val allocSum = rows.map(_.getAs[Double]("alloc_tokens")).sum
    assert(math.abs(allocSum - budget) < 1e-3,
      s"alloc $allocSum vs budget $budget")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens").toDouble
      val a = r.getAs[Double]("alloc_tokens")
      assert(a <= n + 1e-9, s"${r.getAs[String]("source")} over-allocated")
      assert(a > 0, s"${r.getAs[String]("source")} starved")
      // capped ⟺ the whole supply was taken
      assert(r.getAs[Boolean]("capped") === (math.abs(a - n) < 1e-6))
    }
  }

  test("token budget: temperature flattening favors small domains") {
    val rows = Mixture.tokenBudget(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("n_tokens"))
    val utils = rows.map(_.getAs[Double]("util"))
    // utilization must be non-increasing in supply (α < 1 flattening)
    utils.sliding(2).foreach { case Array(small, large) =>
      assert(small >= large - 1e-9, s"util not monotone: $small < $large")
    }
  }

  test("weighted reservoir matches the window-based formulation") {
    val viaHeap = Sampling.weightedReservoir(spark, sfDir)
      .select($"lang", $"doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val scored = Tables.documents(spark, sfDir)
      .withColumn("w", greatest(TextOps.tokenCount($"text").cast("long"), lit(1L)))
      .withColumn("u",
        (TextOps.hash60(concat(lit("res:"), $"doc_id")) + lit(1L))
          .cast("double") / lit(1152921504606846976.0))
      .withColumn("res_key", round(log($"u"), 9) / $"w")
    val viaWindow = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy($"lang").orderBy($"res_key".desc, $"doc_id")))
      .where($"rn" <= Sampling.ReservoirK)
      .select($"lang", $"doc_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaHeap === viaWindow)
  }

  test("reservoir keys prefer heavier docs at equal hash draw") {
    // ln(u) < 0, so dividing by a larger weight moves the key toward 0
    // (larger): the A-ES monotonicity that makes it WEIGHTED sampling
    val u = 0.37
    val k1 = math.round(math.log(u) * 1e9) / 1e9 / 10.0
    val k2 = math.round(math.log(u) * 1e9) / 1e9 / 1000.0
    assert(k2 > k1)
  }

  test("triangle count matches brute-force ordered 3-join") {
    val und = Tables.lineitem(spark, sfDir)
      .select(pmod($"l_orderkey", lit(Graph.TriNodes)).as("a"),
        pmod($"l_partkey", lit(Graph.TriNodes)).as("b"))
      .where($"a" =!= $"b")
      .select(least($"a", $"b").as("u"), greatest($"a", $"b").as("v"))
      .distinct().cache()
    val e1 = und.select($"u".as("x"), $"v".as("y"))
    val e2 = und.select($"u".as("y"), $"v".as("z"))
    val e3 = und.select($"u".as("x2"), $"v".as("z2"))
    val brute = e1.join(e2, "y")
      .join(e3, $"x" === $"x2" && $"z" === $"z2")
      .count()
    val got = Graph.triangles(spark, sfDir).collect().head
    assert(got.getAs[Long]("n_triangles") === brute)
    // transitivity consistent with its own parts
    val t = 3.0 * got.getAs[Long]("n_triangles") /
      got.getAs[Long]("n_wedges").toDouble
    assert(math.abs(got.getAs[Double]("transitivity") - t) < 1e-9)
    und.unpersist()
  }

  test("phrase matches equal a sliding-window recount over token arrays") {
    val Seq(t0, t1) = Index.Phrase
    val recount = Tables.documents(spark, sfDir)
      .withColumn("toks", TextOps.tokens($"text"))
      .withColumn("n_matches",
        size(filter(sequence(lit(0), size($"toks") - lit(2)),
          i => $"toks".getItem(i) === t0 && $"toks".getItem(i + 1) === t1)))
      .where($"n_matches" > 0)
      .select($"doc_id", $"n_matches".cast("long").as("n_matches"))
    val viaIndex = Index.phraseSearch(spark, sfDir)
      .select($"doc_id", $"n_matches")
    // q95 returns top-10; every returned row must agree with the recount
    val rec = recount.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val idx = viaIndex.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(idx.nonEmpty)
    idx.foreach { case (d, n) => assert(rec.get(d).contains(n), s"doc $d") }
    // and the top-10 really is the top by count
    val floor = idx.map(_._2).min
    assert(rec.values.count(_ > floor) <= idx.size)
  }

  test("epoch plan: targets sum exactly to 2x corpus, physical copies match") {
    val rows = Mixture.epochPlan(spark, sfDir).collect()
    val totDocs = rows.map(_.getAs[Long]("n_docs")).sum
    // Hamilton apportionment: integer targets, EXACT total (no drift)
    assert(rows.map(_.getAs[Long]("target")).sum ===
      Mixture.EpochFactor * totDocs)
    rows.foreach { r =>
      // the exploded relation emitted exactly the planned copies
      assert(r.getAs[Long]("n_out") === r.getAs[Long]("target"),
        s"${r.getAs[String]("source")}: plan not executed")
    }
    // sqrt temperature: duplication factor target/n_docs must be
    // non-increasing in supply (small sources oversampled harder)
    val bySupply = rows.sortBy(_.getAs[Long]("n_docs"))
      .map(r => (r.getAs[Long]("n_docs"),
        r.getAs[Long]("target").toDouble / r.getAs[Long]("n_docs")))
    // a ±1 Hamilton seat moves a factor by <1/n, so the bound carries
    // that slack; the continuous quotas themselves are monotone
    bySupply.sliding(2).foreach { case Array((nS, small), (nL, large)) =>
      assert(small >= large - (1.0 / nS + 1.0 / nL),
        s"oversampling not monotone: $small ($nS docs) < $large ($nL docs)")
    }
  }
}
