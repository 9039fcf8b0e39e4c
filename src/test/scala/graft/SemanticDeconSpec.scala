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

  test("plan: the band join is partitioned — never broadcast") {
    val p = SemanticDecon.semanticDecon(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"),
      s"band join lost its shuffled-hash shape:\n$p")
    assert(!p.contains("BroadcastExchange"),
      s"a corpus-proportional side got broadcast (q224 trap):\n$p")
  }
}
