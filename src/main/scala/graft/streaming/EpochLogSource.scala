package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graftbridge.StreamingFrame
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.store.{EpochFollower, TableStore}

/** The epoch log as a FIRST-CLASS Structured Streaming source:
  *
  * {{{
  * spark.readStream.format("graft-cdc")
  *   .option("root", storeRoot).option("table", "documents")
  *   .option("pk", "doc_id")
  *   .load()                      // rows tagged _change_type
  *   .writeStream.option("checkpointLocation", ckpt)
  *   .foreachBatch(applyToMirror _).start()
  * }}}
  *
  * Where [[EpochStream]] is the embedded poll-loop bridge (own thread,
  * cursor-as-checkpoint), this source plugs the SAME commit-log
  * machinery into Spark's own micro-batch engine: offsets ARE epochs
  * (`LongOffset(epoch)`), Spark's offset WAL is the checkpoint, and
  * every `readStream` facility — triggers, foreachBatch, memory sinks,
  * the existing `Stream*` transforms downstream — composes for free.
  *
  * Semantics, all inherited from the store's CDC layer:
  *  - `getOffset` is pure commit metadata (no data I/O). In `changes`
  *    mode it advances ONE logical segment at a time, cutting at
  *    rewrite commits exactly like [[EpochFollower.consumeChanges]],
  *    so a micro-batch window never mixes a compaction with logical
  *    changes — CDC stays O(logical diff); a rewrite-only segment
  *    surfaces as one empty batch ([[TableStore.readChangesSince]]'s
  *    zero-I/O fast path). `maxEpochsPerBatch` caps backlog drain
  *    (the `maxFilesPerTrigger` pattern).
  *  - `getBatch(start, end)` replays EXACTLY on restart: the window is
  *    an explicit epoch pair from Spark's WAL and the store's history
  *    is immutable while retained — same rows, same tags.
  *  - Delivery is exactly-once TO THE SINK Spark gives: at-least-once
  *    on crash-replay, with the mirror-idempotent apply (upsert
  *    inserts, remove deletes by pk) the engine's sinks already use.
  *  - The frame schema is FIXED at query start (streaming requires
  *    it): delivered windows are aligned to it — columns added by a
  *    later schema evolution are picked up on query restart, the
  *    standard Spark contract (dropped columns null-fill).
  *
  * Options: `root`, `table` (required); `pk` (comma-separated,
  * required in `changes` mode); `mode` = `changes` (default, rows
  * tagged `_change_type ∈ {insert, delete}`) | `appends` (file-level
  * at-least-once adds, no tag column, rewrite-skipping via
  * [[TableStore.readAddedSince]]); `startingEpoch` = `earliest`
  * (default: first batch is the full table as inserts) | `latest`
  * (only commits after query start); `maxEpochsPerBatch`;
  * `consumer` — optional: registers/advances an [[EpochFollower]]
  * cursor as batches COMMIT, so the streaming query pins vacuum
  * retention like every other consumer (without it, vacuuming the
  * un-replayed window can invalidate crash-replay — same sizing rule
  * as the poll-loop bridge).
  *
  * Scale: offset computation is a commit-metadata walk; each batch
  * scans only the window's changed files. One store instance per
  * source, used serially by the stream execution thread (the
  * single-threaded store contract).
  */
class EpochLogSource(
    sqlContext: SQLContext, root: String, table: String, pk: Seq[String],
    mode: String, startingEpoch: String, maxEpochsPerBatch: Option[Long],
    consumer: Option[String], fixedSchema: StructType) extends Source {

  private val store = new TableStore(sqlContext.sparkSession, root)

  /** `latest` skips history (base = the epoch at source creation), a
    * NUMBER resumes/reprocesses from that exact epoch (retained-epoch
    * contract applies), `earliest` leaves None — the first batch is a
    * full snapshot.
    */
  private val latestBase: Option[Long] = startingEpoch match {
    case "latest" => Some(currentEpoch().getOrElse(0L))
    case "earliest" => None
    case n => Some(n.toLong)
  }

  /** Highest epoch this source has returned or been handed — the
    * monotone floor for offset computation. A registered consumer
    * cursor seeds it across restarts (Spark re-hands WAL offsets via
    * getBatch on crash recovery; the cursor covers the clean-restart
    * path where it does not).
    */
  private var maxSeen: Option[Long] =
    consumer.flatMap(c => EpochFollower.cursor(store, table, c))
      .orElse(latestBase)

  // register the cursor (vacuum pin) up front AT THE CREATION EPOCH:
  // Spark's offset WAL can reference a batch whose commit-log write
  // was lost (stop/crash between the sink write and the commit — the
  // at-least-once window), and its replay needs the batch's END epoch
  // retained. commit() has not fired yet at that point, so the
  // REGISTRATION value is the only pin — it must cover everything the
  // source could have offered, i.e. the epoch current when the source
  // was built. A pin at 0 (the old value) pinned nothing.
  consumer.foreach { c =>
    if (EpochFollower.cursor(store, table, c).isEmpty)
      registerCursor(c, maxSeen.orElse(currentEpoch()).getOrElse(0L))
  }

  override def schema: StructType = fixedSchema

  override def getOffset: Option[OffsetV1] = currentEpoch().flatMap { cur =>
    maxSeen match {
      case None =>
        // initial full-snapshot delivery (earliest): wait until the
        // table holds files, then offer the whole current epoch
        if (store.readIfExists(table).isEmpty) None
        else Some(LongOffset(cur))
      case Some(base) if cur <= base => Some(LongOffset(base))
      case Some(base) =>
        val target0 =
          if (mode == "appends") cur // rewrite-aware walk needs no cuts
          else store.commitOps(table, base, cur) match {
            case Some(ops) =>
              // one logical segment per micro-batch: cut the pending
              // window at this table's rewrite commits
              val cuts = ops.collect {
                case (e, op) if TableStore.RewriteOps(op) => Seq(e - 1, e)
              }.flatten
              (cuts.filter(e => e > base && e < cur) :+ cur).min
            case None => cur // vacuumed history: single endpoint window
          }
        val target = maxEpochsPerBatch
          .fold(target0)(m => math.min(target0, base + m))
        Some(LongOffset(math.max(target, base)))
    }
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val endE = epochOf(end)
    val baseE = start.map(epochOf).orElse(latestBase)
    maxSeen = Some(math.max(endE, maxSeen.getOrElse(Long.MinValue)))
    val frame = baseE match {
      case Some(b) if b >= endE => emptyFrame()
      case Some(b) =>
        if (mode == "appends") store.readAddedSince(table, b, endE)
        else store.readChangesSince(table, b, endE, pk)
      case None => // earliest: the registration snapshot, all inserts
        if (store.readIfExists(table).isEmpty) emptyFrame()
        else store.readEpoch(table, endE)
          .withColumn(store.ChangeTypeCol, lit("insert"))
    }
    StreamingFrame.asStreaming(align(frame))
  }

  override def commit(end: OffsetV1): Unit = consumer.foreach { c =>
    // Spark has committed the batch to its WAL — release the replay
    // pin up to its end (the cursor is a floor, never a window source)
    registerCursor(c, epochOf(end))
  }

  override def stop(): Unit = ()

  /** Serve exactly the query-start schema regardless of what the
    * window's files carry: evolution-added columns are dropped until
    * restart, evolution-dropped columns null-fill — the fixed-schema
    * contract every Spark streaming source keeps.
    */
  private def align(df: DataFrame): DataFrame = {
    val have = df.schema.map(f => f.name -> f.dataType).toMap
    df.select(fixedSchema.map { f =>
      have.get(f.name) match {
        case Some(dt) if dt == f.dataType => col(f.name)
        case Some(_) => col(f.name).cast(f.dataType).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }: _*)
  }

  private def emptyFrame(): DataFrame =
    sqlContext.sparkSession.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), fixedSchema)

  private def currentEpoch(): Option[Long] = store.currentEpochIfAny

  private def registerCursor(c: String, epoch: Long): Unit = {
    import store.spark.implicits._
    store.upsert(EpochFollower.CursorTable,
      Seq((table, c, epoch)).toDF("table", "consumer", "epoch"),
      Seq("table", "consumer"))
  }

  private def epochOf(o: OffsetV1): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other => other.json.trim.toLong
  }
}

/** `format("graft-cdc")` registration. The source schema is resolved
  * at query definition: the user-provided `.schema(...)` wins; else
  * the table's current schema (plus `_change_type` in changes mode),
  * which requires the table to already hold data.
  */
class EpochLogSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdc"

  override def sourceSchema(
      sqlContext: SQLContext, schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), resolveSchema(sqlContext, schema, parameters))

  override def createSource(
      sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val mode = parameters.getOrElse("mode", "changes")
    require(mode == "changes" || mode == "appends",
      s"mode must be changes|appends, got '$mode'")
    val pk = parameters.get("pk").map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq.empty)
    require(mode == "appends" || pk.nonEmpty,
      "changes mode needs option(\"pk\", ...) — the table's logical key")
    val starting = parameters.getOrElse("startingEpoch", "earliest")
    require(starting == "earliest" || starting == "latest" ||
      starting.forall(_.isDigit),
      s"startingEpoch must be earliest|latest|<epoch>, got '$starting'")
    new EpochLogSource(
      sqlContext, required(parameters, "root"), required(parameters, "table"),
      pk, mode, starting,
      parameters.get("maxEpochsPerBatch").map(_.toLong),
      parameters.get("consumer"),
      resolveSchema(sqlContext, schema, parameters))
  }

  private def required(parameters: Map[String, String], key: String): String =
    parameters.getOrElse(key,
      throw new IllegalArgumentException(s"graft-cdc needs option(\"$key\", ...)"))

  private def resolveSchema(
      sqlContext: SQLContext, user: Option[StructType],
      parameters: Map[String, String]): StructType = {
    val mode = parameters.getOrElse("mode", "changes")
    val base = user.getOrElse {
      val store = new TableStore(
        sqlContext.sparkSession, required(parameters, "root"))
      store.readIfExists(required(parameters, "table")).getOrElse(
        throw new IllegalArgumentException(
          s"table '${parameters("table")}' holds no data yet — pass " +
            ".schema(...) to start a stream over an empty table")).schema
    }
    if (mode == "appends" || base.fieldNames.contains("_change_type")) base
    else base.add("_change_type", "string", nullable = false)
  }
}
