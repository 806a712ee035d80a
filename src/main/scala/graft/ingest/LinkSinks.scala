package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.{HashId, TableStore}

/** Provenance link sinks and the search-run ledger (SURVEY.md §2.5
  * K5/K6, §2.4 A5).
  */
object LinkSinks {

  /** A5 (`cli.py:817-819`): sha1 fingerprint of the canonical JSON of
    * the search args — doubles as the since_ids key and the
    * search_runs.hash. Identical formula to hash_id (sorted keys,
    * compact separators).
    */
  def searchArgsFingerprint(args: Seq[(String, String)]): String =
    HashId.sha1Hex(HashId.canonicalJson(args.toMap))

  /** K6 (`cli.py:836-874`): allocate the next search_runs row (rowid
    * analog = max(id)+1) recording name, args-minus-q/count JSON,
    * started timestamp and the args hash; returns the run id. Args are
    * ORDERED (the reference's dict preserves construction order) and
    * the stored `args` TEXT uses Python's default json.dumps
    * separators, like every other SQLite-compat rendering; the hash
    * stays sorted+compact (the two serializations differ in the
    * reference too).
    */
  def recordSearchRun(
      spark: SparkSession,
      store: TableStore,
      searchArgs: Seq[(String, String)],
      started: String): Long = {
    import spark.implicits._
    val nextId: Long = store.readIfExists("search_runs")
      .flatMap(df => Option(df.agg(max(col("id"))).collect()(0).get(0)))
      .map(_.asInstanceOf[Long] + 1L).getOrElse(1L)
    val argsJson = searchArgs
      .filter { case (k, _) => k != "q" && k != "count" }
      .map { case (k, v) => s"${HashId.pyJsonString(k)}: ${HashId.pyJsonString(v)}" }
      .mkString("{", ", ", "}")
    val q = searchArgs.collectFirst { case ("q", v) => v }.getOrElse("")
    val row = Seq((nextId, q, argsJson, started,
      searchArgsFingerprint(searchArgs)))
      .toDF("id", "name", "args", "started", "hash")
    store.upsert("search_runs", row, Seq("id"))
    nextId
  }

  /** K6's link half (`cli.py:841-852`): (search_run, tweet) provenance
    * rows, replace-upserted.
    */
  def linkSearchRun(store: TableStore, runId: Long, tweets: DataFrame): Unit =
    store.upsert("search_runs_tweets",
      tweets.select(lit(runId).as("search_run"), col("id").as("tweet")),
      Seq("search_run", "tweet"))

  /** K9 (`utils.py:534-568` fetch_and_save_list + `utils.py:102-116`
    * fetch_lists): upsert the list dimension row (owner user FK
    * extracted, created_at parsed to ISO) and the (list, user)
    * membership links; member user docs go through save_users.
    */
  def saveList(
      spark: SparkSession,
      store: TableStore,
      listRow: DataFrame,
      members: DataFrame): Unit = {
    import graft.ingest.{Normalize, Transforms}
    // owner is a nested user doc: save it, keep the FK
    val withOwner =
      if (listRow.schema.fieldNames.contains("user")) {
        val owner = listRow.select(col("user.*"))
        store.upsert("users", Normalize.saveUsers(owner)("users"), Seq("id"))
        listRow.withColumn("user", col("user.id"))
      } else listRow
    val transformed = withOwner
      .withColumn("created_at",
        Transforms.isoFormat(Transforms.parseTwitterTime(col("created_at"))))
      .drop("id_str")
    store.upsert("lists", transformed, Seq("id"))

    val savedMembers = Normalize.saveUsers(members)("users")
    store.upsert("users", savedMembers, Seq("id"))
    val listId = transformed.select("id").collect()(0).getLong(0)
    store.upsert("list_members",
      savedMembers.select(lit(listId).as("list"), col("id").as("user")),
      Seq("list", "user"))
  }
}
