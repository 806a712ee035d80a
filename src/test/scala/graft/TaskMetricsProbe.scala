package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Aggregate task-level IO/shuffle metrics across everything a thunk
  * runs — the spec-side probe for "did this plan actually read (or
  * shuffle) less", used where a plan-text assertion would only prove
  * what Spark ASKED for, not what the scan paid.
  */
object TaskMetricsProbe {

  final case class Totals(
      inputBytes: Long, shuffleWriteBytes: Long, shuffleReadBytes: Long)

  /** Run `f` and return the summed task metrics of every task that
    * completed during it. The listener bus is asynchronous, so after
    * `f` returns we wait for the event stream to go quiescent (no new
    * task-end for 200 ms, 5 s cap) before reading the totals.
    */
  def measure(spark: SparkSession)(f: => Unit): Totals = {
    val input = new AtomicLong
    val shufW = new AtomicLong
    val shufR = new AtomicLong
    val events = new AtomicLong
    val l = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          input.addAndGet(m.inputMetrics.bytesRead)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          events.incrementAndGet()
        }
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      f
      var last = -1L
      var stable = 0
      var waited = 0
      while (stable < 4 && waited < 5000) {
        Thread.sleep(50); waited += 50
        val cur = events.get()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
      Totals(input.get(), shufW.get(), shufR.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
