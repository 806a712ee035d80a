package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental CONSUMER cursors over the epoch log — the operational
  * form of [[TableStore.readAddedSince]]: each named consumer records
  * the last epoch it processed in the store's `_graft_cursors`
  * bookkeeping table (underscore-prefixed: invisible to tableNames /
  * Doctor table walks, like every other store-internal artifact), and
  * [[consumeNew]] feeds it exactly the files added since — the
  * consumer-group pattern (Kafka's committed offsets, Delta's
  * streaming-source checkpoint) scaled down to one parquet table.
  *
  * Delivery contract: AT-LEAST-ONCE. The cursor advances only after
  * the handler returns — a crash mid-handler re-delivers the same
  * diff on the next call, and a file rewritten by an UPSERT (bucketed
  * merge) re-delivers its rows even without a crash (readAddedSince's
  * documented contract). Rewrite-ONLY commits (compaction, z-order)
  * are skipped entirely while their history is retained: the consumer
  * crosses them without the handler firing — no O(table) redelivery.
  * Downstream pk-dedup (the skip-existing anti-join) restores
  * exactly-once; [[consumeChanges]] is the row-exact CDC form (with
  * deletes). The spec drives both compositions.
  *
  * Registered cursors are VACUUM ROOTS, like tags: vacuumEpochs
  * retains every epoch a cursor still needs as its diff base, so a
  * lagging consumer can always catch up — and a dead consumer is
  * unregistered with [[drop]], releasing its pin (the same lifecycle
  * as dropTag). Doctor's `suggest` flags consumers whose lag keeps
  * many epochs pinned. Scale: the cursor table holds one row per
  * (table, consumer); every consume is one metadata diff + a scan of
  * only the new files.
  *
  * Concurrency: cursor advances are whole-table swap upserts, so two
  * consumer PROCESSES advancing concurrently can lose one advance
  * (last-writer-wins on the shared cursor table). That is safe by
  * the delivery contract — a lost advance only re-delivers the same
  * diff next call, never skips — the same at-least-once outcome as a
  * crash before the advance. A deployment with many concurrent
  * consumers serializes advances through its own scheduler, exactly
  * as the single-writer store contract already requires of writers.
  */
object EpochFollower {

  /** Store-internal cursor table (one per store root). */
  val CursorTable = "_graft_cursors"

  /** The consumer's last-processed epoch, if registered. */
  def cursor(
      store: TableStore, table: String, consumer: String): Option[Long] =
    cursors(store).get((table, consumer))

  /** All registered cursors: (table, consumer) → epoch. Retries a
    * handful of times on a read failure: the cursor table is a plain
    * swap-maintained table, so a read racing a concurrent consumer's
    * advance (another process/thread) can transiently fail mid-swap —
    * vacuumEpochs reads pins through here, and treating a transient
    * failure as "no cursors" would silently drop a lagging consumer's
    * vacuum roots. (A mid-swap MISSING dir still reads as empty — the
    * microsecond window the vacuum retention period is the documented
    * guard for.)
    */
  def cursors(store: TableStore): Map[(String, String), Long] = {
    var attempt = 0
    while (true) {
      try return store.readIfExists(CursorTable).map(
        _.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
          .toMap).getOrElse(Map.empty)
      catch {
        case e: Exception =>
          if (attempt >= 3) throw e
          attempt += 1
          Thread.sleep(50L * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def advance(
      store: TableStore, table: String, consumer: String, epoch: Long): Unit =
    advanceAll(store, Seq(table), consumer, epoch)

  /** ONE swap upsert advancing every member table's cursor row — the
    * cursor table is whole-table swap-maintained, so the advance is
    * atomic across tables: a multi-table consumer can never observe
    * (or leave behind) member cursors at different epochs.
    */
  private def advanceAll(
      store: TableStore, tables: Seq[String], consumer: String,
      epoch: Long): Unit = {
    import store.spark.implicits._
    store.upsert(CursorTable,
      tables.map(t => (t, consumer, epoch)).toDF("table", "consumer", "epoch"),
      Seq("table", "consumer"))
  }

  /** Unregister a consumer — releases its vacuum pin (the dropTag
    * lifecycle; run when a consumer is retired, or its lag pins
    * epochs forever).
    */
  def drop(store: TableStore, table: String, consumer: String): Unit =
    store.readIfExists(CursorTable).foreach { c =>
      store.overwrite(CursorTable,
        c.filter(!(col("table") === table && col("consumer") === consumer)))
    }

  /** Feed the handler everything this consumer has not yet seen —
    * the FULL table on first call (registration), the added-files
    * diff thereafter — and advance the cursor AFTER the handler
    * returns. Returns Some((handlerResult, newEpoch)) when anything
    * was consumed, None when the consumer is already current. The
    * handler's frame is epoch-pinned (explicit file list), so a
    * concurrent commit mid-handler neither tears it nor is missed —
    * it is the next call's diff.
    */
  def consumeNew[T](store: TableStore, table: String, consumer: String)(
      f: DataFrame => T): Option[(T, Long)] = {
    val to = store.snapshot().epoch
    cursor(store, table, consumer) match {
      case Some(from) if from >= to => None
      case Some(from) if store.addedRelsSince(table, from, to).isEmpty =>
        // nothing to deliver — epochs advanced but this table's logical
        // content did not (rewrite-only commits: compaction, z-order;
        // or commits touching other tables). Advance the cursor WITHOUT
        // invoking the handler: a consumer crossing a compaction sees
        // an empty feed, not an O(table) redelivery.
        advance(store, table, consumer, to)
        None
      case Some(from) =>
        val r = f(store.readAddedSince(table, from, to))
        advance(store, table, consumer, to)
        Some((r, to))
      case None =>
        // registration waits for data: a governed-but-empty table has
        // no files to serve (readEpoch correctly refuses empty
        // snapshots), so the consumer stays unregistered until the
        // first rows land — then its first delivery is the full table
        if (store.readIfExists(table).isEmpty) None
        else {
          val r = f(store.readEpoch(table, to))
          advance(store, table, consumer, to)
          Some((r, to))
        }
    }
  }

  /** The ROW-LEVEL form of [[consumeNew]]: feeds the handler a
    * [[TableStore.readChangesSince]] frame (rows tagged
    * `_change_type ∈ {insert, delete}`) instead of the added-files
    * scan, so a derived mirror applies inserts as upserts and deletes
    * as pk removals and NEVER serves ghosts after a dedup pass or
    * retention delete. First call registers and delivers the full
    * table as inserts. Same cursor, same at-least-once advance, same
    * vacuum pinning; rewrite-only windows advance the cursor without
    * invoking the handler (the handler never sees an empty compaction
    * echo).
    *
    * A pending window MIXING rewrite commits with logical changes is
    * CUT at the rewrite boundaries automatically (while the commit
    * history is retained): each run of logical commits is delivered as
    * its own exact batch, each rewrite-only segment advances the
    * cursor with zero data I/O — so a poll that slept across
    * `upsert → compact → upsert` reconciles the two upserts' diffs
    * and never touches the compaction's rewritten files. This keeps
    * CDC O(logical diff) unconditionally, where the single-window form
    * would degrade to reconciling the rewritten table
    * (readChangesSince's documented caveat). The handler fires once
    * per logical segment; the cursor advances after EACH segment, so a
    * crash mid-poll resumes at the segment boundary (same
    * at-least-once contract). Returns the LAST segment's handler
    * result. With vacuumed intermediate history the split is not
    * computable and the call falls back to the single endpoint window.
    */
  def consumeChanges[T](
      store: TableStore, table: String, consumer: String, pk: Seq[String])(
      f: DataFrame => T): Option[(T, Long)] = {
    val to = store.snapshot().epoch
    cursor(store, table, consumer) match {
      case Some(from) if from >= to => None
      case Some(from) =>
        store.commitOps(table, from, to) match {
          case Some(ops) if ops.forall {
              case (_, op) => TableStore.RewriteOps(op) } =>
            // provably-unchanged window (rewrite-only commits, or
            // commits touching other tables): advance without invoking
            // the handler — zero data I/O, pure commit-op metadata
            advance(store, table, consumer, to)
            None
          case Some(ops) =>
            // cut the window at rewrite commits: bounds isolate each
            // rewrite epoch (its segment short-circuits in
            // readChangesSince's metadata fast path) so the logical
            // segments' endpoint diffs never span a rewrite
            val cuts = ops.collect {
              case (e, op) if TableStore.RewriteOps(op) => Seq(e - 1, e)
            }.flatten
            val bounds = (from +: cuts.filter(e => e > from && e < to))
              .:+(to).distinct.sorted
            var last: Option[T] = None
            bounds.sliding(2).foreach {
              case Seq(a, b) =>
                val segLogical = ops.exists { case (e, op) =>
                  e > a && e <= b && !TableStore.RewriteOps(op) }
                if (segLogical)
                  last = Some(f(store.readChangesSince(table, a, b, pk)))
                advance(store, table, consumer, b)
              case _ => ()
            }
            last.map(r => (r, to))
          case None =>
            // vacuumed / partially-ungoverned history: the split is
            // not computable — single endpoint window (readChangesSince
            // degrades as documented, never lies)
            val r = f(store.readChangesSince(table, from, to, pk))
            advance(store, table, consumer, to)
            Some((r, to))
        }
      case None =>
        if (store.readIfExists(table).isEmpty) None
        else {
          val r = f(store.readEpoch(table, to)
            .withColumn(store.ChangeTypeCol, lit("insert")))
          advance(store, table, consumer, to)
          Some((r, to))
        }
    }
  }

  /** TRANSACTIONALLY-CONSISTENT multi-table CDC: one consumer, one
    * logical cursor over N tables, every batch a map of each table's
    * row-level changes computed over the SAME epoch window. The epoch
    * log is global, so two tables upserted in ONE `transact` land at
    * one epoch and are delivered in the SAME batch — a mirror joining
    * them can never serve a torn join, which per-table consumers
    * permit (each advancing its own cursor at its own pace). The
    * member cursors live as ordinary (table, consumer) rows advanced
    * by ONE atomic swap upsert, so a crash "between tables" is
    * impossible by construction, every member keeps its vacuum pin,
    * and Doctor's lag advisories see each table.
    *
    * `pks` maps each member table to its logical key. First call
    * registers and delivers each non-empty member in full (tables
    * still empty are registered too — their first rows arrive as a
    * later diff); all-empty stays unregistered. Windows mixing
    * rewrites with logical changes are cut at the UNION of the
    * members' rewrite boundaries (same O(logical diff) guarantee as
    * [[consumeChanges]], same per-segment cursor advance); a member
    * with no logical change in a segment is absent from that batch's
    * map. Returns the LAST batch's handler result. If member cursors
    * ever diverge (the same consumer name also used per-table — don't)
    * the window starts at the MINIMUM: at-least-once redelivery for
    * the ahead members, never a skip.
    */
  def consumeChangesMulti[T](
      store: TableStore, pks: Seq[(String, Seq[String])], consumer: String)(
      f: Map[String, DataFrame] => T): Option[(T, Long)] = {
    require(pks.nonEmpty, "consumeChangesMulti needs at least one table")
    val tables = pks.map(_._1)
    val to = store.snapshot().epoch
    val cur = cursors(store)
    val registered = tables.flatMap(t => cur.get((t, consumer)))
    if (registered.isEmpty) {
      // registration: full delivery of every member that has data, one
      // atomic cursor write for ALL members (including still-empty
      // ones, so their first rows arrive as an ordinary diff)
      val full = pks.flatMap { case (t, _) =>
        if (store.readIfExists(t).isEmpty) None
        else Some(t -> store.readEpoch(t, to)
          .withColumn(store.ChangeTypeCol, lit("insert")))
      }.toMap
      if (full.isEmpty) None
      else {
        val r = f(full)
        advanceAll(store, tables, consumer, to)
        Some((r, to))
      }
    } else {
      require(registered.size == tables.size,
        s"consumer '$consumer' is registered on only " +
          s"${registered.size} of ${tables.size} member tables — " +
          "member sets must not change after registration")
      val from = registered.min
      if (from >= to) return None
      val opsPer: Map[String, Option[Seq[(Long, String)]]] =
        tables.map(t => t -> store.commitOps(t, from, to)).toMap
      def logicalIn(t: String, a: Long, b: Long): Boolean =
        opsPer(t) match {
          case Some(ops) => ops.exists { case (e, op) =>
            e > a && e <= b && !TableStore.RewriteOps(op) }
          case None => true // unprovable: must deliver
        }
      if (tables.forall(t => opsPer(t).exists(_.forall {
          case (_, op) => TableStore.RewriteOps(op) }))) {
        advanceAll(store, tables, consumer, to)
        None
      } else if (opsPer.values.exists(_.isEmpty)) {
        // some member's window is not walkable (vacuumed history):
        // one consistent endpoint window for everyone
        val frames = pks.flatMap { case (t, pk) =>
          if (logicalIn(t, from, to))
            Some(t -> store.readChangesSince(t, from, to, pk))
          else None
        }.toMap
        val r = f(frames)
        advanceAll(store, tables, consumer, to)
        Some((r, to))
      } else {
        // cut at the UNION of the members' rewrite boundaries
        val cuts = opsPer.values.flatMap(_.get).collect {
          case (e, op) if TableStore.RewriteOps(op) => Seq(e - 1, e)
        }.flatten.toSeq
        val bounds = (from +: cuts.filter(e => e > from && e < to))
          .:+(to).distinct.sorted
        var last: Option[T] = None
        bounds.sliding(2).foreach {
          case Seq(a, b) =>
            val seg = pks.flatMap { case (t, pk) =>
              if (logicalIn(t, a, b))
                Some(t -> store.readChangesSince(t, a, b, pk))
              else None
            }.toMap
            if (seg.nonEmpty) last = Some(f(seg))
            advanceAll(store, tables, consumer, b)
          case _ => ()
        }
        last.map(r => (r, to))
      }
    }
  }
}
