package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming AS-OF join — the unbounded form of
  * queries/RelationalOps.asofJoin (each purchase annotated with the
  * user's most recent view at or before it): keyed state via
  * `flatMapGroupsWithState` holding ONE timestamp per user (the last
  * view seen), exactly the state the batch union-window carries
  * forward implicitly. Stream-stream interval joins buffer whole
  * ranges of both streams; the as-of special case needs only the
  * carry-forward scalar, so state stays one value per key forever —
  * the same "bounded, skew-free" contract as [[StreamCdc]].
  *
  * Ordering contract: events are as-of'd in event-time order WITHIN
  * each micro-batch (the per-group sort below); ACROSS batches the
  * state is last-write-wins, so a view arriving in a later batch than
  * a purchase it precedes in event time does not retroactively
  * re-annotate that purchase (the emitted row is immutable — standard
  * append-mode streaming semantics; the batch query is the
  * reconciliation path, the same relationship StreamCdc has to
  * StateOps.cdcChanges).
  */
object StreamAsof {

  case class Ev(userId: Long, eventId: Long, tsUs: Long, isQuery: Boolean)
  case class Annotated(
      eventId: Long, userId: Long, tsUs: Long, viewTsUs: Option[Long])
  case class LastView(tsUs: Long)

  /** `events` columns: (user_id long, event_id long, ts_us long,
    * is_query boolean — false rows update state, true rows emit an
    * annotated record). Equal timestamps order state rows first,
    * matching the batch form's inclusive `>=` bound.
    */
  def annotate(events: DataFrame): Dataset[Annotated] = {
    implicit val ev = Encoders.product[Ev]
    implicit val an = Encoders.product[Annotated]
    implicit val lv = Encoders.product[LastView]
    implicit val key = Encoders.scalaLong
    events
      .select(col("user_id").cast("long").as("userId"),
        col("event_id").cast("long").as("eventId"),
        col("ts_us").cast("long").as("tsUs"),
        col("is_query").cast("boolean").as("isQuery"))
      .as[Ev]
      .groupByKey(_.userId)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, evs: Iterator[Ev], state: GroupState[LastView]) => {
          var last: Option[Long] = state.getOption.map(_.tsUs)
          val out = scala.collection.mutable.ArrayBuffer[Annotated]()
          // event-time order; views before queries at equal ts (the
          // batch form's is_q tiebreak)
          evs.toSeq.sortBy(e => (e.tsUs, e.isQuery)).foreach { e =>
            if (e.isQuery) out += Annotated(e.eventId, user, e.tsUs, last)
            else if (!last.exists(_ > e.tsUs)) last = Some(e.tsUs)
          }
          last.foreach(t => state.update(LastView(t)))
          out.iterator
        })
  }
}
