package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A2 in streaming form (SURVEY.md §2.4): the reference's
  * save_user_counts appends a count_history row only when a user's
  * follower/friend/listed count CHANGED vs the last stored value
  * (`/root/reference/utils.py:676-701`). Batch-side that's a lag()
  * window (StateOps.cdcChanges); on an unbounded stream it's keyed
  * state: `flatMapGroupsWithState` keeping the last seen count per
  * (type, user) and emitting only transitions.
  *
  * State is one long per key — bounded, skew-free, and exactly the
  * shape the reference's `order by datetime desc limit 1` read
  * implements against SQLite.
  */
object StreamCdc {

  case class CountEvent(typeId: Int, user: Long, datetime: String, count: Long)
  case class LastCount(count: Long)

  /** `counts` columns: (typeId int, user long, datetime string,
    * count long). Returns only rows whose count differs from the
    * previous row of the same (typeId, user) in stream order.
    */
  def changesOnly(counts: DataFrame): Dataset[CountEvent] = {
    implicit val ce = Encoders.product[CountEvent]
    implicit val lc = Encoders.product[LastCount]
    implicit val key = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
    counts
      .select(col("typeId").cast("int"), col("user").cast("long"),
        col("datetime").cast("string"), col("count").cast("long"))
      .as[CountEvent]
      .groupByKey(e => (e.typeId, e.user))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, Long), events: Iterator[CountEvent], state: GroupState[LastCount]) => {
          var last: Option[Long] = state.getOption.map(_.count)
          val out = scala.collection.mutable.ArrayBuffer[CountEvent]()
          events.toSeq.sortBy(_.datetime).foreach { e =>
            if (!last.contains(e.count)) {
              out += e
              last = Some(e.count)
            }
          }
          last.foreach(c => state.update(LastCount(c)))
          out.iterator
        })
  }
}
