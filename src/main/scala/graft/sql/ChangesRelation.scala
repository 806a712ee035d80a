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
  *
  * '''Multi-table windows''' — `tables=a,b` + per-member `pk.<t>`
  * keys (instead of `table`/`pk`): ONE read serving every member's
  * changes over the SAME global epoch window, rows tagged with a
  * `_table` discriminator — the batch twin of the streaming source's
  * multi mode and [[graft.store.EpochFollower.consumeChangesMulti]].
  * `mode=appends` composes with `tables=` too (no `pk.<t>` needed, no
  * `_change_type` column): the cheap file-level adds scan per member
  * over the one global window — a multi-table mirror that only needs
  * at-least-once appends skips the exact-feed price while keeping the
  * never-torn pairing (a joint transact's files land in one read).
  * Because the window is one epoch pair, two tables upserted in one
  * `transact` always appear in the same result — a release diff
  * joining them can never be torn. The schema is `_table` + the
  * union of the member schemas (members null-fill each other's
  * columns; same-name columns must be union-compatible); a member
  * with no logical change in the window contributes no rows and
  * costs no data I/O (commit-op metadata proves it unchanged).
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
    def table: String = required("table") // single-table branches only
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
    val frame = (mode, parameters.get("tables")) match {
      case (m, Some(ts)) if m == "changes" || m == "appends" =>
        require(!parameters.contains("table"),
          "pass option(\"table\", ...) or option(\"tables\", ...), not both")
        val names = ts.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        require(names.nonEmpty, "tables must name at least one table")
        import org.apache.spark.sql.functions.lit
        import org.apache.spark.sql.types.{StringType, StructField}
        // every member must be a KNOWN table — governed at an
        // endpoint, holding data, or declaring a schema (the same
        // disjunction the streaming provider enforces at creation). A
        // misspelled member would otherwise be indistinguishable from
        // a governed-but-empty one and serve zero rows forever; the
        // engine's norm is loud-on-ambiguity. In APPENDS mode the bar
        // is higher: the file-add walk is commit-log based, so a FLAT
        // (data-holding but never-governed) member would pass the
        // known-table test yet serve zero rows forever — refuse it
        // too (govern the table, or read it directly).
        val knownAtEndpoints = store.tablesAt(from) ++ store.tablesAt(to)
        names.foreach { t =>
          require(knownAtEndpoints.contains(t) ||
            store.readIfExists(t).isDefined ||
            store.declaredSchemaOf(t).isDefined,
            s"unknown member '$t' in multi-table graft-changes — not " +
              s"governed at epoch $from or $to, holds no data, and " +
              "declares no schema (misspelled table name?)")
          if (mode == "appends")
            require(knownAtEndpoints.contains(t) ||
              store.governed.contains(t) ||
              store.declaredSchemaOf(t).isDefined,
              s"member '$t' is a flat (ungoverned) table — appends " +
                "windows walk the commit log, so it would serve zero " +
                "rows forever; govern it (ensureGoverned) or read it " +
                "directly")
        }
        // the served shape is STABLE regardless of which members
        // changed in the window: _table + the union of the members'
        // CURRENT schemas (first-seen order, same-name columns must
        // agree on type) + _change_type (changes mode only — an
        // appends scan is untyped adds); members null-fill each
        // other's columns
        val fields =
          scala.collection.mutable.LinkedHashMap[String, StructField]()
        names.foreach { t =>
          // a governed-but-empty member (CREATE/CTAS before any
          // insert) contributes its DECLARED shape, so the union
          // schema is stable from the member's creation — not from
          // its first insert. Data-derived schemas carry PHYSICAL
          // names — map them to the member's surface names (ALTER
          // RENAME COLUMN) and project out the member's DROPPED
          // tombstones, like every current read does; declared
          // schemas are already surface-shaped and narrow.
          val gone = store.droppedColumnsOf(t).toSet
          store.readIfExists(t).map(_.schema)
            .map(store.surfaceSchemaOf(t, _))
            .orElse(store.declaredSchemaOf(t))
            .foreach(_.fields
              .filterNot(f => f.name == store.BucketCol || gone(f.name))
              .foreach { f =>
                fields.get(f.name) match {
                  case Some(g) => require(g.dataType == f.dataType,
                    s"column '${f.name}' is ${g.dataType} in one member and " +
                      s"${f.dataType} in '$t' — multi-table windows need " +
                      "union-compatible member schemas")
                  case None => fields(f.name) = f.copy(nullable = true)
                }
              })
        }
        val target = StructType(
          StructField("_table", StringType, nullable = false) +:
            (fields.values.toSeq ++
              (if (mode == "changes")
                Seq(StructField("_change_type", StringType, nullable = false))
              else Nil)))
        // one global window for every member: a one-transact commit is
        // never torn across the result. Provably-unchanged members
        // (commit-op metadata: no logical op in the window) contribute
        // nothing and cost no data I/O — in appends mode the
        // rewrite-aware file walk itself yields zero added files.
        // one batched pointer probe: members with no files ANYWHERE in
        // the window (governed empty) contribute nothing in appends
        // mode — readAddedSince has no schema to serve for them, and
        // the union target shape is already fixed above. The probe is
        // window-wide, not endpoints-only: a member emptied within the
        // window still owes its added files (at-least-once appends).
        val nonEmpty =
          if (mode == "appends") store.withFilesInWindow(names, from, to)
          else Set.empty[String]
        val parts = names.flatMap { t =>
          if (mode == "appends") {
            if (!nonEmpty(t)) None
            else Some(store.toSurface(t, store.readAddedSince(t, from, to))
              .withColumn("_table", lit(t)))
          } else {
            val pk = parameters.get(s"pk.$t")
              .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
              .getOrElse(throw new IllegalArgumentException(
                s"multi-table graft-changes needs option(\"pk.$t\", ...) — " +
                  "each member's logical key"))
            val logical = store.commitOps(t, from, to) match {
              case Some(ops) => ops.exists { case (e, op) =>
                e > from && e <= to && !TableStore.RewriteOps(op) }
              case None => true // unprovable (vacuumed): must deliver
            }
            if (!logical) None
            else Some(store.toSurface(t, store.readChangesSince(t, from, to, pk))
              .withColumn("_table", lit(t)))
          }
        }
        val aligned = parts.map { df =>
          val have = df.schema.map(f => f.name -> f.dataType).toMap
          df.select(target.map(f => have.get(f.name) match {
            case Some(dt) if dt == f.dataType => col(f.name)
            case Some(_) => col(f.name).cast(f.dataType).as(f.name)
            case None => lit(null).cast(f.dataType).as(f.name)
          }): _*)
        }
        if (aligned.isEmpty)
          sqlContext.sparkSession.createDataFrame(
            new java.util.ArrayList[Row](), target)
        else aligned.reduce(_.unionByName(_))
      // single-table modes serve the surface shape too: DROPPED
      // tombstones project out (physical names), then ALTER RENAME
      // COLUMN maps the files' physical names — the same order every
      // current read applies
      case ("appends", None) =>
        store.toSurface(table, store.readAddedSince(table, from, to)
          .drop(store.droppedColumnsOf(table): _*))
      case ("changes", None) =>
        val pk = required("pk").split(",").map(_.trim).toSeq
        store.toSurface(table, store.readChangesSince(table, from, to, pk)
          .drop(store.droppedColumnsOf(table): _*))
      case (other, _) => throw new IllegalArgumentException(
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
