package graft.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, Filter, PrunedFilteredScan, RelationProvider}
import org.apache.spark.sql.types.StructType

import graft.store.TableStore

/** The row-level change feed as a BATCH reader format — CDC windows
  * for API surfaces that cannot call the Scala store (PySpark, SQL
  * `CREATE TEMP VIEW ... USING`):
  *
  * {{{
  * spark.read.format("graft-changes")
  *   .option("root", storeRoot).option("table", "documents")
  *   .option("pk", "doc_id")
  *   .option("fromEpoch", "7")           // exclusive
  *   .option("toEpoch", "12")            // optional; default = current
  *   .load()                             // rows tagged _change_type
  * }}}
  *
  * Window endpoints name epochs directly (`fromEpoch`/`toEpoch`),
  * release tags (`fromTag`/`toTag`), or wall-clock instants
  * (`fromTimestamp`/`toTimestamp` — epoch millis or ISO-8601,
  * resolved against the commit log's persisted stamps via
  * [[TableStore.epochAtTimestamp]]). `mode=appends` serves the
  * file-level incremental scan ([[TableStore.readAddedSince]],
  * rewrite-skipping, no tag column) instead of the exact feed. Both
  * endpoints must be retained — the vacuum contract every CDC
  * consumer carries. The relation is the store's own frame behind a
  * V1 relation with column pruning and filter pushdown delegated to
  * the underlying frame; cost is the window's changed files (and with
  * a projection, only the selected columns' pages), never O(table).
  */
class ChangesRelationProvider extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-changes"

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    def required(key: String): String = parameters.getOrElse(key,
      throw new IllegalArgumentException(
        s"graft-changes needs option(\"$key\", ...)"))
    val store = new TableStore(sqlContext.sparkSession, required("root"))
    val table = required("table")
    val mode = parameters.getOrElse("mode", "changes")
    def tagEpoch(tag: String): Long = store.tags().getOrElse(tag,
      throw new IllegalArgumentException(s"unknown tag '$tag'"))
    // fromTimestamp/toTimestamp resolve through the commit log's
    // persisted wall-clock stamps (epoch millis, or any ISO-8601
    // instant) — "what changed since yesterday 03:00" is one option
    def tsEpoch(v: String): Long = store.epochAtTimestamp(
      if (v.forall(_.isDigit)) v.toLong
      else java.time.Instant.parse(v).toEpochMilli)
    // fromTag/toTag name release-pinned epochs — "what changed between
    // release A and release B" is two options
    val from = parameters.get("fromTag").map(tagEpoch)
      .orElse(parameters.get("fromTimestamp").map(tsEpoch))
      .orElse(parameters.get("fromEpoch").map(_.toLong))
      .getOrElse(throw new IllegalArgumentException(
        "graft-changes needs option(\"fromEpoch\"|\"fromTag\"|" +
          "\"fromTimestamp\", ...)"))
    val to = parameters.get("toTag").map(tagEpoch)
      .orElse(parameters.get("toTimestamp").map(tsEpoch))
      .orElse(parameters.get("toEpoch").map(_.toLong))
      .orElse(store.currentEpochIfAny)
      .getOrElse(throw new IllegalStateException(
        "no commits — govern tables first"))
    val frame = mode match {
      case "appends" => store.readAddedSince(table, from, to)
      case "changes" =>
        val pk = required("pk").split(",").map(_.trim).toSeq
        store.readChangesSince(table, from, to, pk)
      case other => throw new IllegalArgumentException(
        s"mode must be changes|appends, got '$other'")
    }
    new ChangesRelation(sqlContext, frame)
  }
}

/** The window frame behind `PrunedFilteredScan`: Spark's required
  * columns and pushable filters are applied to the UNDERLYING frame,
  * so both reach the parquet scan of the window's changed files — a
  * `select("pk")` over a wide CDC window reads one column's pages,
  * not every column of every changed file (the V1 `TableScan` form
  * deserialized the full width). Same residual discipline as the
  * catalog's scan: every filter is also reported unhandled, so Spark
  * re-applies it above and correctness never depends on the
  * Filter→Column translation.
  */
private[sql] class ChangesRelation(
    context: SQLContext, frame: DataFrame)
  extends BaseRelation with PrunedFilteredScan {
  override def sqlContext: SQLContext = context
  override def schema: StructType = frame.schema
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters // all residual: re-applied by Spark above the scan

  /** The pruned-and-filtered frame [[buildScan]] executes — split out
    * so the spec can assert the underlying parquet scan's ReadSchema
    * (the proof pruning reached the pages, not just the relation).
    */
  private[sql] def project(
      requiredColumns: Array[String], filters: Array[Filter]): DataFrame = {
    val filtered = filters.flatMap(GraftScanBuilder.toColumn)
      .foldLeft(frame)(_.filter(_))
    // an empty projection (COUNT(*)) is a genuine zero-column scan —
    // parquet answers it from row counts alone
    filtered.select(requiredColumns.map(col).toIndexedSeq: _*)
  }

  override def buildScan(
      requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] =
    project(requiredColumns, filters).rdd
}
