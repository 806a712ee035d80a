package graft.sources

/** A3 — ingest progress estimation (cli.py:151-157): before paging a
  * user's followers/friends, the reference sizes a progress bar from
  * the profile's `{noun}_count` and advances it by each fetched
  * chunk. The counts are the API's ESTIMATES — the real list can be
  * shorter (suspended accounts) or longer (growth mid-scan) — so the
  * bar clamps at 100% and never fails on overrun; `silent` mode
  * (cli.py:158-160) suppresses output entirely.
  *
  * The label reproduces click's `"Importing {:,} followers for
  * @name"` including the thousands separators.
  */
final class Progress(
    label: String, expected: Long, out: String => Unit, silent: Boolean = false) {

  private var done = 0L

  def update(n: Long): Unit = {
    done = math.min(expected, done + math.max(0L, n))
    if (!silent) out(render)
  }

  def percent: Int =
    if (expected <= 0L) 100 else ((done * 100L) / expected).toInt

  def render: String = s"$label  ${percent}%  [$done/$expected]"
}

object Progress {

  /** `"Importing {:,} followers for @name"` (cli.py:154-156). */
  def importLabel(count: Long, noun: String, screenName: String): String =
    s"Importing ${grouped(count)} $noun for @$screenName"

  /** Python's `{:,}` thousands grouping. Sign handled by string
    * split, not math.abs — abs(Long.MinValue) is still negative.
    */
  def grouped(n: Long): String = {
    val raw = n.toString
    val (sign, digits) =
      if (raw.startsWith("-")) ("-", raw.tail) else ("", raw)
    sign + digits.reverse.grouped(3).mkString(",").reverse
  }

  /** Expected-total lookup from a stored profile row — the engine
    * analog of `profile["followers_count"]` (cli.py:151-152): reads
    * the single user row from the users table.
    */
  def expectedFor(
      store: graft.store.TableStore, userId: Long, noun: String): Option[Long] = {
    import org.apache.spark.sql.functions.col
    val colName = s"${noun}_count"
    store.readIfExists("users").flatMap { users =>
      if (!users.columns.contains(colName)) None
      else users.filter(col("id") === userId)
        .select(col(colName).cast("long"))
        .collect().headOption.filterNot(_.isNullAt(0)).map(_.getLong(0))
    }
  }
}
