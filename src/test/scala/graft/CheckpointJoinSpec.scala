package graft

import graft.ops.CheckpointJoin
import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** q224 — the checkpoint-broadcast guard as a plan contract
  * (PERF.md r11 audit made self-enforcing). */
class CheckpointJoinSpec extends SparkSpec {
  import spark.implicits._

  test("q224 runs its embedded plan assertions and returns the rollup") {
    val out = CheckpointJoin.checkpointJoinGuard(spark, sfDir).collect()
    // buckets are doc_id % 8 over the full corpus — all 8 present
    assert(out.map(_.getAs[Long]("bucket")).toSeq == (0L to 7L))
    assert(out.forall(_.getAs[Long]("n_tokens") > 0))
    assert(out.forall(_.getAs[Double]("avg_df") >= 1.0))
  }

  test("the rollup matches a from-scratch replay (join strategy is physical only)") {
    val toks = Tables.documents(spark, sfDir)
      .select($"doc_id", explode(TextOps.tokens($"text")).as("tok"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val df = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val byBucket = toks.groupBy { case (id, _) => ((id % 8) + 8) % 8 }
    val expected = byBucket.map { case (b, ts) =>
      val n = ts.size.toLong
      // mirror the engine's arithmetic: decimal sum → double → double
      // division → round-half-up at 6
      val s = ts.map(t => BigDecimal(df(t._2))).sum.toDouble
      (b, n, BigDecimal(s / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val got = CheckpointJoin.checkpointJoinGuard(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("avg_df"))).toSeq
    assert(got == expected)
  }

  test("the disease pin fires: an unhinted checkpoint join still plans a broadcast") {
    // the same shape q224 asserts on, reproduced here so a future
    // engine-estimation change is caught by the suite even if the
    // declared query is edited
    val toks = Tables.documents(spark, sfDir)
      .select($"doc_id", explode(TextOps.tokens($"text")).as("tok"))
      .localCheckpoint()
    val dfreq = toks.groupBy($"tok").agg(count(lit(1)).as("df"))
    val plan = toks.join(dfreq, Seq("tok"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"LogicalRDD stats no longer bait a static broadcast:\n$plan")
  }
}
