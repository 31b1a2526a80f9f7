package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** x13_stream_join: watermarked stream-stream interval join (SURVEY.md
  * §2.3 x13) — the streaming counterpart of the batch range/as-of joins
  * (q44, q33): two unbounded inputs joined on a key AND a time bound.
  *
  * Both sides carry a watermark and the join condition bounds event-time
  * distance, so the state store holds only rows still joinable under the
  * watermark — bounded state on unbounded streams, the property that makes
  * the operator runnable at all. Without the time bound, Spark (correctly)
  * refuses the plan: state would grow forever. Left-outer emits the
  * null-extended row only once the watermark proves no match can arrive —
  * same finalize-on-watermark contract as x03's windows.
  */
object Joins {

  /** Attribution-style interval join: every click by the same user within
    * `within` AFTER an impression. Inner by default; `leftOuter = true`
    * keeps unmatched impressions (emitted null-extended once expired).
    *
    * @param impressions (user_id, imp_id, imp_ts)
    * @param clicks      (click_user, click_id, click_ts)
    */
  def clickAttribution(
      impressions: DataFrame,
      clicks: DataFrame,
      within: String = "15 minutes",
      lateness: String = "10 minutes",
      leftOuter: Boolean = false): DataFrame =
    impressions.withWatermark("imp_ts", lateness)
      .join(
        clicks.withWatermark("click_ts", lateness),
        expr(s"""user_id = click_user
                 AND click_ts >= imp_ts
                 AND click_ts <= imp_ts + interval $within"""),
        if (leftOuter) "leftOuter" else "inner")
      .select(col("user_id"), col("imp_id"), col("imp_ts"),
        col("click_id"), col("click_ts"))
}
