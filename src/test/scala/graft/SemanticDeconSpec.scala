package graft

import graft.ops.{Decontaminate, Planted, SemanticDecon, Similarity}
import org.apache.spark.sql.functions._

/** q228 semantic decontamination: every leaked eval twin must be
  * caught and attributed to its origin, the training/eval carve must
  * be clean (no eval doc on the train side), and the bipartite band
  * join must stay partitioned — both sides are corpus-proportional,
  * so a broadcast anywhere in it is the q224 checkpoint trap. */
class SemanticDeconSpec extends SparkSpec {

  private lazy val rows =
    SemanticDecon.semanticDecon(spark, sfDir).collect()
  private lazy val off = Planted.familyOffset(spark, sfDir, 1, "spec")

  test("every leaked twin is caught and attributed to its origin") {
    import spark.implicits._
    val evalIds = Tables.documents(spark, sfDir)
      .select($"doc_id").as[Long].collect()
      .filter(_ % Decontaminate.EvalEvery == 0).toSet
    val planted = rows.filter(_.getAs[Boolean]("is_planted_leak"))
    assert(planted.length === evalIds.size,
      "a leaked twin escaped the similarity threshold")
    planted.foreach { r =>
      val id = r.getAs[Long]("train_id")
      assert(r.getAs[Long]("best_eval_id") === id - off,
        s"twin $id not attributed to its origin")
      assert(r.getAs[Double]("best_sim") >= Similarity.SimThreshold)
    }
  }

  test("the carve is clean: no eval doc ever flags as training") {
    rows.foreach { r =>
      val id = r.getAs[Long]("train_id")
      assert(id >= off || id % Decontaminate.EvalEvery != 0,
        s"eval doc $id leaked onto the train side of the join")
    }
  }

  test("organic flags (if any) are real near-dups, not noise") {
    // an organic train doc may legitimately flag if the corpus holds
    // a true near-duplicate of an eval doc; whatever flags must carry
    // a cosine at or above the declared threshold
    rows.filterNot(_.getAs[Boolean]("is_planted_leak")).foreach { r =>
      assert(r.getAs[Double]("best_sim") >= Similarity.SimThreshold)
      assert(r.getAs[Long]("n_eval_matches") >= 1L)
    }
  }

  test("guard: declared SF keeps the declared geometry — oracle intact") {
    import graft.Corpus
    val e = Corpus.docEmbeddings(spark, sfDir).localCheckpoint()
    val isEval = pmod(col("vec_id"),
      lit(Decontaminate.EvalEvery.toLong)) === 0
    val train = e.filter(!isEval)
      .unionByName(Similarity.perturbLast(e.filter(isEval), off))
    val g = SemanticDecon.chooseGeometry(train, e.filter(isEval))
    assert(g.planes === Similarity.NHyperplanes)
    assert(g.bits === Similarity.BandBits)
    assert(g.widenedFrom.isEmpty)
    assert(g.candPairs <= Similarity.MaxCandPairsPerVector * g.n)
  }

  test("guard: irreducible train×eval duplicate mass refuses loudly") {
    // every vector identical on both sides: all bands collapse to one
    // shared bucket, candidates = n_train × n_eval × bands at EVERY
    // rung — widening thins chance collisions, never true duplicates
    val v = Seq.fill(Similarity.Dims)(1.0 / math.sqrt(Similarity.Dims))
    val train = spark.range(0, 400).toDF("vec_id")
      .withColumn("v", typedLit(v))
    val eval = spark.range(1000, 1100).toDF("vec_id")
      .withColumn("v", typedLit(v))
    val e = intercept[IllegalStateException] {
      SemanticDecon.chooseGeometry(train, eval)
    }
    assert(e.getMessage.contains("irreducible"))
    assert(e.getMessage.contains("q22/q53"))
  }

  test("guard: bipartite census equals a driver-side replay") {
    import graft.Corpus
    import graft.expressions.HyperplaneBands
    val e = Corpus.docEmbeddings(spark, sfDir).localCheckpoint()
    val isEval = pmod(col("vec_id"),
      lit(Decontaminate.EvalEvery.toLong)) === 0
    val sigsOf = (df: org.apache.spark.sql.DataFrame) => df
      .select(HyperplaneBands.bands(col("v"),
        Similarity.NHyperplanes, Similarity.BandBits).as("bs"))
      .collect().map(_.getSeq[Long](0))
    val trainBuckets = sigsOf(e.filter(!isEval)).flatMap(_.zipWithIndex)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val evalBuckets = sigsOf(e.filter(isEval)).flatMap(_.zipWithIndex)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = trainBuckets.map { case (b, ca) =>
      ca * evalBuckets.getOrElse(b, 0L) }.sum
    val measured = SemanticDecon.censusCandPairsBipartite(
      e.filter(!isEval), e.filter(isEval),
      Similarity.NHyperplanes, Similarity.BandBits)
    assert(measured === expected)
  }

  test("plan: the band join is partitioned — never broadcast") {
    val p = SemanticDecon.semanticDecon(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"),
      s"band join lost its shuffled-hash shape:\n$p")
    assert(!p.contains("BroadcastExchange"),
      s"a corpus-proportional side got broadcast (q224 trap):\n$p")
  }
}
