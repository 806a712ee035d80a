package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation (SURVEY.md §2.7): the reference has
  * no event-time windows (its only watermark is the monotone
  * since_id); tumbling windows with lateness-bounded state are the
  * idiomatic Structured Streaming extension, demonstrated over the
  * `events` stream shape (ts, event_type, value).
  *
  * Works on both a streaming and a batch DataFrame (same code path —
  * that is the point of the declarative API): in streaming mode the
  * watermark bounds state and drops events later than `lateness`.
  */
object EventWindows {

  def tumblingCounts(
      events: DataFrame,
      windowLength: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Gap-based sessionization as a STREAM — the streaming face of the
    * batch q_sessionize recipe (same 30-minute-gap semantics, there
    * spelled as a lag()+running-sum window): Spark's native
    * `session_window` merges events into per-user sessions whose end
    * extends `gap` past the last event, keeps only open sessions as
    * state (bounded by the watermark), and in append mode emits a
    * session once the watermark passes its end — no
    * mapGroupsWithState hand-rolling needed for the standard gap
    * rule. Returns (session_start, session_end, user_id, n_events).
    */
  def sessionCounts(
      events: DataFrame,
      gap: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))
}
