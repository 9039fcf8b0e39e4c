package graft

import graft.streaming.StatefulCounts
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Checkpoint recovery of custom streaming state — the exactly-once
  * claim behind every stateful deployment: a `mapGroupsWithState`
  * query stopped mid-backlog and RESTARTED from its checkpoint must
  * (a) resume per-key state rather than recount from zero, and
  * (b) not reprocess the files the first run already committed.
  *
  * The q160 declared query exercises the state-carry path across
  * micro-batches inside ONE query run; this spec kills the query
  * between halves of the backlog and brings up a brand-new query
  * object on the same checkpoint — the restart path a real cluster
  * takes after an executor/driver loss or a planned redeploy.
  */
class StatefulRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("state survives a restart from checkpoint; no reprocessing") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_recovery").toFile.getAbsolutePath
    val stage = s"$base/stage"
    val log = s"$base/changelog"
    val ckpt = s"$base/ckpt"

    val ev = Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", $"ts")
      .withColumn("h", pmod(xxhash64($"user_id", $"ts"), lit(2)))
      .cache()
    val half1 = ev.filter($"h" === 0).drop("h", "ts")
    val half2 = ev.filter($"h" === 1).drop("h", "ts")
    val half2Rows = half2.count()
    // the split must force real state-carry: some user in both halves
    val carried = half1.select("user_id").distinct()
      .join(half2.select("user_id").distinct(), "user_id").count()
    assert(carried > 0, "split produced no cross-restart users")

    def runOnce(): Long = {
      val src = spark.readStream
        .schema("user_id BIGINT, event_type STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage).as[StatefulCounts.UserEvent]
      val q = StatefulCounts.runningCounts(src).toDF().writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, id: Long) =>
          df.withColumn("batch_id", lit(id))
            .write.mode("append").parquet(log)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      q.recentProgress.map(_.numInputRows).sum
    }

    half1.repartition(2).write.parquet(stage)
    val rows1 = runOnce()
    // second half lands AFTER the first query is gone; the new query
    // must pick up exactly these files from the checkpointed offsets
    half2.repartition(2).write.mode("append").parquet(stage)
    val rows2 = runOnce()
    assert(rows2 === half2Rows,
      s"restart reprocessed committed input: saw $rows2, new data $half2Rows")
    assert(rows1 + rows2 === ev.count())

    import org.apache.spark.sql.expressions.Window
    val newest = Window.partitionBy($"user_id").orderBy($"batch_id".desc)
    val got = spark.read.parquet(log)
      .withColumn("rn", row_number().over(newest))
      .filter($"rn" === 1)
      .select($"user_id", $"events", $"errors")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val expected = Tables.events(spark, sfDir)
      .groupBy($"user_id").agg(
        count(lit(1)).as("events"),
        sum(when($"event_type" === "error", 1L).otherwise(0L)).as("errors"))
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === expected,
      "restarted state did not resume — totals diverge from batch")
    ev.unpersist()
  }
}
