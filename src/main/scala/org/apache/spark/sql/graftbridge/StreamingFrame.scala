package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, Row}

/** The one `private[sql]` doorway a DataSource-V1 streaming `Source`
  * needs: `Source.getBatch` must return a frame whose logical plan is
  * STREAMING (`MicroBatchExecution` asserts `batch.isStreaming`), and
  * the only constructor for such a frame from driver-built batch data
  * is `SparkSession.internalCreateDataFrame(rdd, schema,
  * isStreaming = true)` — exactly how Spark's own `FileStreamSource`
  * marks the per-batch file scan it hands back. This object lives
  * under `org.apache.spark.sql` solely to satisfy that access
  * qualifier (the standard packaging for out-of-tree V1 sources);
  * it contains no Spark code and nothing else in the repo touches
  * Spark internals.
  *
  * The conversion is lazy where it matters: `queryExecution.toRdd`
  * plans the batch on the driver but computes nothing — the scan runs
  * when the micro-batch executes, against the explicit file list the
  * plan captured (epoch-pinned, so replay re-reads the same bytes).
  */
object StreamingFrame {

  /** Re-wrap a driver-built batch frame as a streaming frame with the
    * same schema and physical plan.
    */
  def asStreaming(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }
}
