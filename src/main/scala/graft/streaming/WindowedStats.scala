package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with a watermark — the Structured
  * Streaming shape for continuous crawl/event stats (the reference
  * itself is processing-time only, SURVEY §2.I Q4; this is the
  * scale-path generalization: late data bounded by the watermark,
  * state GC'd per window).
  */
object WindowedStats {

  /** 5-minute tumbling counts per event type, 10-minute watermark.
    * In append mode a window emits exactly once, when the watermark
    * passes its end — deterministic downstream consumption. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))
}
