package graft.ingest

import org.apache.spark.sql.DataFrame

import graft.store.TableStore

/** The one place save_tweets' normalized tables land in the store —
  * shared by the batch CLI, the archive/timeline ingests, and the K8
  * streaming sink.
  *
  * The reference applies all of save_tweets' table writes inside ONE
  * SQLite transaction per call (`/root/reference/cli.py:664-668`
  * `with db.conn:`; the writes span tweets/users/places/sources/
  * media/media_tweets plus the count-history CDC, `utils.py:411-446`),
  * so a concurrent reader never sees a tweet row whose user or source
  * dimension row hasn't landed. This helper restores that guarantee:
  * the whole fan-out runs in [[TableStore.transact]], which stages
  * every governed table's write and flips one commit pointer at the
  * end — all-or-nothing for readers, exactly the reference's
  * per-batch atomicity. On a store with no governed tables the
  * transact is a pass-through and behavior is byte-identical to the
  * historical per-table swaps (existing specs unchanged); opt in with
  * `store.ensureGoverned(TweetSink.Tables)`.
  */
object TweetSink {

  /** Every table a save_tweets application can touch — the governance
    * set for an atomic ingest (count_history rides along because the
    * reference's save_user_counts runs inside the same transaction).
    */
  val Tables: Seq[String] = Seq(
    "tweets", "users", "sources", "places", "media", "media_tweets",
    "favorited_by", "count_history")

  /** Apply a [[Normalize.saveTweets]] result map in FK-safe order
    * (dimensions → CDC → facts → links), atomically when the store
    * governs the tables. `now` feeds the A2 count-history CDC; pass
    * None to skip it (the archive path, which carries no live counts).
    */
  def apply(
      store: TableStore,
      tables: Map[String, DataFrame],
      now: Option[String]): Unit =
    store.transact {
      Seq("users", "sources", "places", "media").foreach { t =>
        tables.get(t).foreach(df => store.upsert(t, df, Seq("id")))
      }
      now.foreach(ts => tables.get("users").foreach(users =>
        graft.state.Watermarks.saveUserCounts(store, users, ts)))
      tables.get("tweets").foreach(df => store.upsert("tweets", df, Seq("id")))
      tables.get("media_tweets").foreach(df =>
        store.upsert("media_tweets", df, Seq("media_id", "tweets_id")))
      tables.get("favorited_by").foreach(df =>
        store.upsert("favorited_by", df, Seq("user", "tweet")))
    }
}
