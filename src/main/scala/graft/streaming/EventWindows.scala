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
}
