package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Registry of the driver-generated parquet testdata tables
  * (TESTDATA.md). Mirrors the reference's lazy table catalog
  * (`/root/reference/utils.py:313-408` ensure_tables) — but where the
  * reference issues DDL against one SQLite file, here tables are
  * parquet directories surfaced as DataFrames / temp views, and the
  * "ATTACH alias" input mechanism (`/root/reference/utils.py:514-531`)
  * becomes `createOrReplaceTempView` on the session catalog.
  */
object Catalog {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Timestamp columns the driver's datagen has written, across
    * rounds, as either parquet TIMESTAMP(NANOS) (no native Spark type —
    * read via `nanosAsLong` and converted long-nanos → TimestampType)
    * or plain `timestamp[us]` WITHOUT isAdjustedToUTC (surfaces as
    * TIMESTAMP_NTZ). Both forms normalize to TimestampType here so
    * every operator sees real, `unix_micros`-able timestamps whichever
    * physical annotation a given testdata generation carries. The
    * NTZ→TZ cast is exact: the session timezone is pinned UTC by every
    * entrypoint, so wall-clock micros and instant micros coincide.
    */
  private val nanoTsColumns = Set("ts", "o_orderdate", "l_shipdate")

  /** Memoized per (session, dir, table): the testdata is immutable and
    * re-creating the DataFrame re-lists files and re-reads parquet
    * footers — measurable fixed cost when 40+ queries each touch a few
    * tables. Reusing the logical plan lets Spark reuse the FileIndex
    * and schema.
    *
    * Keyed by session REFERENCE identity (IdentityHashMap resolves by
    * eq, so unlike a raw identityHashCode key there is no collision
    * path), with stopped sessions' caches evicted before every
    * lookup. A weak-keyed map would be a no-op here: the cached
    * DataFrames strongly reference their SparkSession, reaching the
    * key through the value — the documented WeakHashMap anti-pattern.
    */
  private val memo = new java.util.IdentityHashMap[
    SparkSession, scala.collection.concurrent.TrieMap[(String, String), DataFrame]]()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val perSession = memo.synchronized {
      memo.entrySet().removeIf(e => e.getKey.sparkContext.isStopped)
      var m = memo.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
        memo.put(spark, m)
      }
      m
    }
    perSession.getOrElseUpdate((sfDir, name), {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema.fields.foldLeft(df) { (acc, f) =>
        if (nanoTsColumns.contains(f.name) && f.dataType == LongType)
          // `div` = exact integer division: a double `/` would lose
          // precision on ~1.7e18 nano values (past 2^53).
          acc.withColumn(f.name, timestamp_micros(expr(s"`${f.name}` div 1000L")))
        else if (f.dataType == TimestampNTZType)
          // timestamp[us] sans UTC flag → NTZ, on which Spark 4 rejects
          // unix_micros/cast-to-long at analysis time. Exact under the
          // pinned-UTC session (same micros payload, reinterpreted).
          acc.withColumn(f.name, col(f.name).cast(TimestampType))
        else acc
      }
    })
  }

  /** ATTACH-equivalent: expose every testdata table as a temp view so
    * arbitrary `spark.sql` (the reference's `--sql` surface) works.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach { t =>
      table(spark, sfDir, t).createOrReplaceTempView(t)
    }
}
