package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: impressions joined to the clicks that
  * follow them within an attribution window — the canonical
  * two-unbounded-sides join. Both sides carry watermarks so the join
  * state is bounded: Spark keeps only rows inside the watermark +
  * interval bound, then drops them — the property that lets this run
  * forever at production rates.
  */
object StreamJoin {

  /** impressions(ad_id, imp_ts) ⋈ clicks(ad_id, click_ts) with
    * click within [imp_ts, imp_ts + windowMinutes]. */
  def attribution(impressions: DataFrame, clicks: DataFrame,
      windowMinutes: Int = 10): DataFrame = {
    val imp = impressions.withWatermark("imp_ts", "30 minutes")
    val clk = clicks.withWatermark("click_ts", "30 minutes")
    imp.join(clk,
      expr(s"""ad_id = c_ad_id AND
              |click_ts >= imp_ts AND
              |click_ts <= imp_ts + interval $windowMinutes minutes""".stripMargin))
  }
}
