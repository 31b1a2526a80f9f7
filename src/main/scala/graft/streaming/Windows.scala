package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** x03_stream_tumbling: Structured Streaming tumbling window + watermark
  * (SURVEY.md §2.3 x03).
  *
  * The streaming form of q19: the reference's hourly batch cadence
  * (`dags/order_currency_conversion_dag.py:14`) becomes a tumbling event-time
  * window, and its daily rate-cache cutoff (R18) generalizes to the
  * watermark — the declared bound on how late data may arrive before it is
  * dropped. Append output mode emits each window exactly once, when the
  * watermark passes the window end.
  *
  * At scale this is a streaming hash aggregate: state is one row per
  * (window, event_type) kept in the state store, pruned by the watermark —
  * bounded state, no unbounded replay.
  */
object Windows {

  /** Watermarked tumbling-window aggregate over a (ts, event_type, value)
    * stream. Works identically on a batch DataFrame (watermark is a no-op
    * there), which is how the batch/stream parity test pins semantics.
    */
  def tumbling(
      events: DataFrame,
      windowLen: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** x17_stream_hopping: watermarked HOPPING windows — the streaming form
    * of q81, each event counted into size/slide overlapping windows, every
    * window emitted exactly once when the watermark passes its end.
    * State is one row per OPEN (window, event_type) — at any instant
    * size/slide windows overlap the present, so state is (size/slide)×
    * the tumbling form's, still bounded and watermark-pruned. Works
    * identically on a batch frame (parity-pinned against q81's shape).
    */
  def hopping(
      events: DataFrame,
      windowLen: String = "1 hour",
      slide: String = "15 minutes",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Native session windows (the streaming form of q20's lag+cumsum
    * sessionization): a session closes `gap` after its last event, and the
    * watermark finalizes it. State per open session, pruned on close.
    */
  def sessionized(
      events: DataFrame,
      gap: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("total_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("event_type"), col("n_events"), col("total_value"))
}
