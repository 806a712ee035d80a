package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Streaming as-of: each query row is annotated with the last
  * state-row timestamp at or before it, state carries across
  * micro-batches, within-batch events process in event-time order,
  * and equal timestamps are inclusive (state row wins first).
  */
class StreamAsofSpec extends SparkSpec {
  import spark.implicits._

  test("purchases annotate with the latest prior view across batches") {
    implicit val sqlCtx = spark.sqlContext
    // (user_id, event_id, ts_us, is_query)
    val mem = MemoryStream[(Long, Long, Long, Boolean)]
    val q = StreamAsof.annotate(
        mem.toDF().toDF("user_id", "event_id", "ts_us", "is_query"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("asof_out")
      .start()

    try {
      // batch 1: view then purchase (u1); purchase with no view (u2);
      // equal-ts view+purchase (u3, inclusive bound)
      mem.addData(
        (1L, 0L, 100L, false), (1L, 10L, 200L, true),
        (2L, 20L, 150L, true),
        (3L, 0L, 1000L, false), (3L, 30L, 1000L, true))
      q.processAllAvailable()
      // batch 2: out-of-order WITHIN the batch — the purchase at 350
      // precedes the view at 400 in event time, so it must NOT see it
      mem.addData((1L, 0L, 400L, false), (1L, 40L, 350L, true))
      q.processAllAvailable()
      // batch 3: state carried — the purchase at 500 sees view 400
      mem.addData((1L, 50L, 500L, true))
      q.processAllAvailable()

      val rows = spark.table("asof_out").orderBy("eventId").collect()
        .map(r => (r.getAs[Long]("eventId"),
          Option(r.getAs[Any]("viewTsUs")).map(_.asInstanceOf[Long])))
      assert(rows.toSeq === Seq(
        10L -> Some(100L),
        20L -> None,
        30L -> Some(1000L),
        40L -> Some(100L),
        50L -> Some(400L)))
    } finally q.stop()
  }

  test("a late stale view never regresses the carried state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Boolean)]
    val q = StreamAsof.annotate(
        mem.toDF().toDF("user_id", "event_id", "ts_us", "is_query"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("asof_out2")
      .start()
    try {
      mem.addData((1L, 0L, 400L, false))
      q.processAllAvailable()
      // a LATE view older than the carried one arrives — state must
      // stay at 400, not regress to 300
      mem.addData((1L, 0L, 300L, false))
      q.processAllAvailable()
      mem.addData((1L, 60L, 500L, true))
      q.processAllAvailable()
      val rows = spark.table("asof_out2").collect()
        .map(r => (r.getAs[Long]("eventId"), r.getAs[Long]("viewTsUs")))
      assert(rows.toSeq === Seq(60L -> 400L))
    } finally q.stop()
  }
}
