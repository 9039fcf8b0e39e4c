package graft

import graft.streaming.StreamJoin
import org.apache.spark.sql.functions._

/** Left-outer stream-stream join contract (q210): the streamed
  * result equals the batch LEFT interval join (both populations),
  * the null-flush path genuinely runs, and the advance rows stay out
  * of the report. */
class StreamOuterJoinSpec extends SparkSpec {

  private lazy val streamed =
    StreamJoin.streamedOuterAttribution(spark, sfDir).collect()

  test("streamed outer join equals the batch LEFT interval join") {
    val ev = Tables.events(spark, sfDir)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("ad_id"), col("ts").as("imp_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_ad_id"), col("ts").as("click_ts"))
    val want = v.join(c,
      col("ad_id") === col("c_ad_id") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr("interval 60 minutes"),
      "left_outer")
      .groupBy(col("ad_id")).agg(
        count(col("click_ts")).as("n_matched"),
        count(when(col("click_ts").isNull, 1)).as("n_unmatched"),
        coalesce(sum(unix_micros(col("click_ts"))
          - unix_micros(col("imp_ts"))), lit(0L)).as("gap_us_sum"))
      .orderBy(col("ad_id")).collect()
    assert(streamed.toSeq === want.toSeq)
  }

  test("both populations are genuinely exercised and advance rows are gone") {
    assert(streamed.nonEmpty)
    assert(streamed.forall(_.getLong(0) >= 0), "advance ids filtered")
    assert(streamed.map(_.getLong(1)).sum > 0, "some impressions match")
    assert(streamed.map(_.getLong(2)).sum > 0,
      "some impressions must flush null-padded — the path under test")
    // per ad: unmatched rows cannot exceed that ad's impressions
    val views = Tables.events(spark, sfDir)
      .filter(col("event_type") === "view")
      .groupBy(col("user_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (r <- streamed)
      assert(r.getLong(2) <= views(r.getLong(0)))
  }
}
