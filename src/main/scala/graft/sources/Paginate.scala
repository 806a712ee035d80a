package graft.sources

/** The reference's REST scan patterns (SURVEY.md §2.1) as pure
  * iteration combinators over an injectable fetch function — the HTTP
  * boundary stays outside the engine (and outside this zero-egress
  * container); everything downstream of a page is Spark.
  *
  *  - S1 `fetch_timeline` (`/root/reference/utils.py:137-225`):
  *    descending max_id pagination, optional since_id floor, stop_after
  *    truncation, rate-limit retry (error 88, ≤5 tries, 15 s).
  *  - S4/S5 cursor pagination (`utils.py:78-99, 571-586`).
  *  - S6/S7 batched multi-get chunking (70 users / 100 statuses,
  *    `utils.py:472-511`).
  *
  * A "page" is the raw JSON document list the API returned; the id
  * extractor lets the pager maintain max_id/min_id without parsing the
  * full doc on the driver.
  */
object Paginate {

  /** Rate-limit retry policy (utils.py:17, 189-200): `fetch` may throw
    * RateLimited; retry up to 5 times, sleeping via the injectable
    * clock (tests pass a no-op).
    */
  final case class RateLimited(message: String) extends RuntimeException(message)

  def withRetry[A](sleep: Long => Unit, maxRetries: Int = Endpoints.RetryMax)(fetch: => A): A = {
    var attempts = 0
    while (true) {
      try return fetch
      catch {
        case RateLimited(_) =>
          attempts += 1
          require(attempts < maxRetries, s"More than $maxRetries rate limit errors")
          sleep(Endpoints.RetrySleepMillis)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** S1: repeat fetch with max_id = min_seen - 1 until an empty page;
    * since_id (when resuming) is passed down so the server floors the
    * scan. Yields pages lazily so the caller can sink + checkpoint the
    * watermark per page (interrupted runs resume, utils.py:214-222).
    */
  def timeline(
      fetch: Map[String, String] => Seq[String],
      extractId: String => Long,
      args: Map[String, String] = Map.empty,
      count: Int = 200,
      sinceId: Option[Long] = None,
      stopAfter: Option[Int] = None,
      sleep: Long => Unit = _ => (),
      sleepMillis: Long = 1000L): Iterator[Seq[String]] = {
    val pageCount = count // `count` is shadowed by Iterator.count below
    new Iterator[Seq[String]] {
      private var minSeenId: Option[Long] = None
      private var done = false
      private var nextPage: Option[Seq[String]] = None

      private def baseArgs: Map[String, String] = {
        val a = args +
          ("count" -> stopAfter.getOrElse(pageCount).toString) +
          ("tweet_mode" -> "extended")
        val withSince = sinceId.fold(a)(s => a + ("since_id" -> s.toString))
        minSeenId.fold(withSince)(m => withSince + ("max_id" -> (m - 1).toString))
      }

      private def advance(): Unit = {
        if (done || nextPage.isDefined) return
        val page = withRetry(sleep)(fetch(baseArgs))
        if (page.isEmpty) { done = true }
        else {
          val ids = page.map(extractId)
          minSeenId = Some(ids.min)
          nextPage = Some(page)
          if (stopAfter.isDefined) done = true
          else sleep(sleepMillis)
        }
      }

      override def hasNext: Boolean = { advance(); nextPage.isDefined }
      override def next(): Seq[String] = {
        advance()
        val p = nextPage.getOrElse(throw new NoSuchElementException)
        nextPage = None
        p
      }
    }
  }

  /** S4/S5: cursor pagination — fetch returns (page, next_cursor);
    * cursor 0 terminates (utils.py:83-89, 576-584).
    */
  def cursor(
      fetch: (Long, Map[String, String]) => (Seq[String], Long),
      args: Map[String, String] = Map.empty,
      sleep: Long => Unit = _ => (),
      sleepMillis: Long = 61000L): Iterator[Seq[String]] =
    new Iterator[Seq[String]] {
      private var cur: Long = -1L
      private var done = false
      private var pending: Option[Seq[String]] = None

      private def advance(): Unit = {
        if (done || pending.isDefined) return
        val (page, nextCur) = fetch(cur, args)
        pending = Some(page)
        cur = nextCur
        if (nextCur == 0L) done = true else sleep(sleepMillis)
      }
      override def hasNext: Boolean = {
        if (pending.isEmpty && done) false
        else { advance(); pending.isDefined }
      }
      override def next(): Seq[String] = {
        advance()
        val p = pending.getOrElse(throw new NoSuchElementException)
        pending = None
        p
      }
    }

  /** S6/S7: chunk identifiers for batched multi-get endpoints
    * (70 users/lookup, 100 statuses/lookup).
    */
  def batched[T](ids: Iterable[T], batchSize: Int): Iterator[Seq[T]] =
    ids.grouped(batchSize).map(_.toSeq)

  /** A3: tick a [[Progress]] by each chunk's size as it streams
    * through — `update(len(users_chunk))` in the reference's
    * follower-import loop (cli.py:143-149).
    */
  def withProgress[T](
      pages: Iterator[Seq[T]], progress: Progress): Iterator[Seq[T]] =
    pages.map { page => progress.update(page.size.toLong); page }

  /** Stop requesting pages once `cap` total items have been served —
    * the home-timeline shape, where the API caps the scan at 800
    * (cli.py:395): the page that crosses the cap is kept (the server
    * would have trimmed it), no further page is fetched.
    */
  def capTotal(pages: Iterator[Seq[String]], cap: Int): Iterator[Seq[String]] =
    new Iterator[Seq[String]] {
      private var seen = 0
      override def hasNext: Boolean = seen < cap && pages.hasNext
      override def next(): Seq[String] = {
        if (!hasNext) throw new NoSuchElementException
        val p = pages.next()
        seen += p.size
        p
      }
    }
}
