package graft.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider, TableScan}
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
  * `mode=appends` serves the file-level incremental scan
  * ([[TableStore.readAddedSince]], rewrite-skipping, no tag column)
  * instead of the exact feed. Both endpoints must be retained — the
  * vacuum contract every CDC consumer carries. The relation is the
  * store's own frame behind a V1 `TableScan`; cost is the window's
  * changed files, never O(table).
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
    // fromTag/toTag name release-pinned epochs — "what changed between
    // release A and release B" is two options
    val from = parameters.get("fromTag").map(tagEpoch)
      .orElse(parameters.get("fromEpoch").map(_.toLong))
      .getOrElse(throw new IllegalArgumentException(
        "graft-changes needs option(\"fromEpoch\"|\"fromTag\", ...)"))
    val to = parameters.get("toTag").map(tagEpoch)
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

private[sql] class ChangesRelation(
    context: SQLContext, frame: DataFrame)
  extends BaseRelation with TableScan {
  override def sqlContext: SQLContext = context
  override def schema: StructType = frame.schema
  override def buildScan(): RDD[Row] = frame.rdd
}
