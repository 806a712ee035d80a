package graft.sources

/** The reference's per-endpoint pacing model, encoded as data so the
  * pagination combinators are drop-in faithful (BASELINE.md "Pacing /
  * batch-size constants" table). Each constant cites the reference
  * line it reproduces; these bound the HTTP source, not the engine.
  */
object Endpoints {

  /** Pacing knobs for one API endpoint: page/batch size, sleep
    * between calls, and an optional total-result hard cap imposed by
    * the API itself.
    */
  final case class Pacing(
      pageSize: Int,
      sleepMillis: Long,
      hardCap: Option[Int] = None)

  /** statuses/user_timeline: 200/page, 1 s (utils.py:176,243). */
  val UserTimeline: Pacing = Pacing(200, 1000L)

  /** statuses/home_timeline: 1 s sleep (cli.py:316). The 800 cap is
    * the SERVER's documented limit — cli.py:395's expected_length=800
    * only sizes a progress bar; the reference client never stops
    * early. Enforcing it client-side here is a deliberate safety
    * tightening (a misbehaving endpoint can't run the ingest
    * unbounded), not a reproduction of a reference fetch-stop.
    */
  val HomeTimeline: Pacing = Pacing(200, 1000L, hardCap = Some(800))

  /** statuses/mentions_timeline: 200/page, 10 s (cli.py:383). */
  val MentionsTimeline: Pacing = Pacing(200, 10000L)

  /** favorites/list: 75 req/15 min → 12 s (utils.py:253-254). */
  val Favorites: Pacing = Pacing(200, 12000L)

  /** search/tweets: count=100, 6 s, ≤ ~320 results served
    * (cli.py:797,826; README.md:267).
    */
  val Search: Pacing = Pacing(100, 6000L, hardCap = Some(320))

  /** followers/list hydrated: 200/page, 15 req/15 min → 61 s
    * (utils.py:78-99; cli.py "sleep" default 61).
    */
  val FollowersHydrated: Pacing = Pacing(200, 61000L)

  /** followers/ids, friends/ids: 5000 ids/page, 61 s (cli.py:586-591). */
  val FollowerIds: Pacing = Pacing(5000, 61000L)

  /** lists/members: 5000/page, 900 req/15 min → 1 s (utils.py:552-568). */
  val ListMembers: Pacing = Pacing(5000, 1000L)

  /** users/lookup: 70 ids/call — 100 hits API error 18 — 1 s
    * (utils.py:472-492).
    */
  val UsersLookup: Pacing = Pacing(70, 1000L)

  /** statuses/lookup: 100 ids/call, 1 s (utils.py:495-511). */
  val StatusesLookup: Pacing = Pacing(100, 1000L)

  /** Rate-limit retry policy: error 88 → 15 s sleep, ≤ 5 tries
    * (utils.py:17, 189-200).
    */
  val RetryMax: Int = 5
  val RetrySleepMillis: Long = 15000L

  /** Streaming long-poll reconnect pause (utils.py:633). */
  val StreamReconnectMillis: Long = 1000L
}
