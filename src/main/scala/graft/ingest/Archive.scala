package graft.ingest

import java.util.zip.ZipFile

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.{HashId, TableStore}

/** Twitter-archive ETL (SURVEY.md §2 S13-S14, T5-T10, K4;
  * `/root/reference/archive.py`): `window.YTD.<name>.part0 = [...]`
  * JS files → inferred-schema DataFrames → per-file transformers →
  * drop-and-recreate `archive_*` tables.
  *
  * Shapes: most files are a list of single-key envelopes
  * (`{"follower": {...}}`) → Each(path); ad-* files pluck a nested
  * path; lists-* / ni-devices / personalization / tweet need custom
  * logic. Tables with no declared pk get a sha1 `hash_id` column `pk`
  * (`archive.py:248`), byte-compatible with sqlite-utils.
  *
  * Scale: the zip scan is a driver-side source exactly like the
  * reference (archive files are per-account and small); the JSON
  * parse + transform + write all run distributed. A 100 TB variant
  * would land the extracted `.js` payloads on object storage and read
  * them with `spark.read.json` directly — the transformers are already
  * pure DataFrame programs, only the byte-source changes.
  */
object Archive {

  /** S14 (`archive.py:45-50`): strip the JS assignment wrapper. */
  def extractJson(contents: String): String = {
    val trimmed = contents.trim
    if (trimmed.startsWith("window."))
      trimmed.split(" = ", 2)(1)
    else trimmed
  }

  /** S13 (`utils.py:656-665`): yield (basename, content) for every
    * .js member not under assets/.
    */
  def readArchiveZip(path: String): Seq[(String, String)] = {
    val zf = new ZipFile(path)
    try {
      zf.entries.asScala.toSeq
        .filter(e => e.getName.endsWith(".js") && !e.getName.startsWith("assets/"))
        .map { e =>
          val name = e.getName.split("/").last
          val bytes = zf.getInputStream(e).readAllBytes()
          name -> new String(bytes, "UTF-8")
        }
    } finally zf.close()
  }

  /** Distributed form of [[readArchiveZip]] for BULK historical loads:
    * every zip matching `pathGlob` unpacks inside the task that reads
    * it, landing one (archive, file, content) row per .js member with
    * the same member rules as the driver-side walk. This is the "land
    * extracted .js on object storage with one Spark job" step the
    * scale notes call for — a million per-account archives extract
    * with cluster parallelism and never move through the driver.
    *
    * The task STREAMS each archive (`FileSystem.open` →
    * `ZipInputStream`, one member decompressed at a time) rather than
    * materializing the zip's bytes as a row: the former binaryFile
    * form loaded whole archives into single rows, which hits Spark's
    * 2 GB row ceiling and pressures executor memory on multi-GB
    * archives. Per-task memory is now bounded by the LARGEST SINGLE
    * MEMBER (the row the member becomes — an irreducible bound),
    * independent of archive size. The driver holds only the path
    * listing (one string per archive — the same footprint any file
    * source's planning index pays).
    */
  def readArchiveZipsDistributed(
      spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val glob = new Path(pathGlob)
    val fs = glob.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val paths = Option(fs.globStatus(glob)).toSeq.flatten
      .filter(_.isFile).map(st => fs.makeQualified(st.getPath).toString)
    val bc = spark.sparkContext.broadcast(new org.apache.spark.SerializableWritable(
      spark.sparkContext.hadoopConfiguration))
    val par = math.max(1,
      math.min(paths.size, spark.sparkContext.defaultParallelism))
    spark.createDataset(paths).repartition(par)
      .mapPartitions { it =>
        val conf = bc.value.value
        // a downstream LIMIT can abandon the iterator mid-archive —
        // close whatever stream is open when the task ends, so the
        // early-exit path never leaks a file handle
        val open = new java.util.concurrent.atomic.AtomicReference[java.io.Closeable]()
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            Option(open.get()).foreach(_.close())))
        it.flatMap { ap =>
          val p = new Path(ap)
          val archive = p.getName
          val zin = new java.util.zip.ZipInputStream(
            new java.io.BufferedInputStream(p.getFileSystem(conf).open(p)))
          open.set(zin)
          // lazy per-entry iterator: only one member's bytes live at a
          // time; the stream closes when the archive is exhausted
          new Iterator[(String, String, String)] {
            private var nextRow: (String, String, String) = null
            private var closed = false
            private def advance(): Unit = {
              while (nextRow == null && !closed) {
                val e = zin.getNextEntry
                if (e == null) { zin.close(); open.set(null); closed = true }
                else if (e.getName.endsWith(".js") &&
                    !e.getName.startsWith("assets/"))
                  nextRow = (archive, e.getName.split("/").last,
                    new String(zin.readAllBytes(), "UTF-8"))
              }
            }
            override def hasNext: Boolean = { advance(); nextRow != null }
            override def next(): (String, String, String) = {
              advance()
              val r = nextRow; nextRow = null; r
            }
          }
        }
      }
      .toDF("archive", "file", "content")
  }

  // ------------------------------------------------------- transformers

  /** A transformer maps the parsed file DataFrame (one row per
    * top-level array element) to one or more output tables.
    */
  sealed trait Transformer {
    def tables(df: DataFrame): Map[String, DataFrame]
  }

  private def hasPath(schema: StructType, path: Seq[String]): Boolean =
    path match {
      case Seq() => true
      case head +: rest =>
        schema.fields.find(_.name == head).map(_.dataType) match {
          case Some(st: StructType) => hasPath(st, rest)
          case Some(_) => rest.isEmpty
          case None => false
        }
    }

  /** `register(filename, each=key)` / the ad-* path pluckers: one row
    * per element, fields of the struct at `path`.
    */
  case class Each(table: String, path: Seq[String]) extends Transformer {
    def tables(df: DataFrame): Map[String, DataFrame] = {
      if (!hasPath(df.schema, path)) return Map.empty
      val c = path.map(p => s"`$p`").mkString(".")
      Map(table -> df.filter(col(c).isNotNull).select(col(c + ".*")))
    }
  }

  case class Multi(f: DataFrame => Map[String, DataFrame]) extends Transformer {
    def tables(df: DataFrame): Map[String, DataFrame] = f(df)
  }

  /** T6 (`archive.py:213-226`): parse `…/<screen_name>/lists/<slug>`
    * URLs out of userListInfo.{urls|url}.
    */
  private def listFromCommon(table: String)(df: DataFrame): Map[String, DataFrame] = {
    val info = structFieldOf(df.schema, "userListInfo").getOrElse(return Map.empty)
    // per-ROW precedence like the reference: urls, else [url], else []
    val candidates: Seq[Column] =
      (if (info.fieldNames.contains("urls")) Seq(col("userListInfo.urls")) else Nil) ++
        (if (info.fieldNames.contains("url"))
          Seq(when(col("userListInfo.url").isNotNull, array(col("userListInfo.url"))))
        else Nil) :+ array().cast(ArrayType(StringType))
    val exploded = df
      .select(explode(coalesce(candidates: _*)).as("url"))
      .select(
        element_at(split(col("url"), "/"), -3).as("screen_name"),
        element_at(split(col("url"), "/"), -1).as("list_slug"))
    Map(table -> exploded)
  }

  private def structFieldOf(schema: StructType, name: String): Option[StructType] =
    schema.fields.find(_.name == name).map(_.dataType) collect {
      case st: StructType => st
    }

  /** T8 (`archive.py:131-140`): `niDeviceResponse` is a one-key dict
    * whose KEY is the category. The reference takes exactly the FIRST
    * key per block (`list(block.keys())[0]`) and writes the result as
    * `ne-devices` — a typo for ni-devices, but its table name
    * nonetheless; both are replicated for drop-in compatibility. JSON
    * key order is lost after parsing, so schema field order stands in
    * for "first" — identical whenever a block carries one category,
    * which is every observed archive.
    */
  private def niDevices(df: DataFrame): Map[String, DataFrame] = {
    val resp = structFieldOf(df.schema, "niDeviceResponse").getOrElse(return Map.empty)
    val cats = resp.fields.collect {
      case StructField(cat, _: StructType, _, _) => cat
    }
    val branches = cats.zipWithIndex.map { case (cat, i) =>
      val firstPresent = cats.take(i).foldLeft(
        col(s"niDeviceResponse.`$cat`").isNotNull) { (acc, prior) =>
        acc && col(s"niDeviceResponse.`$prior`").isNull
      }
      df.filter(firstPresent)
        .select(col(s"niDeviceResponse.`$cat`.*"))
        .withColumn("category", lit(cat))
    }
    branches.reduceOption(_.unionByName(_, allowMissingColumns = true))
      .map("ne-devices" -> _).toMap
  }

  /** T7 (`archive.py:147-180`): the personalization multi-output
    * flatten — one JSON doc fans out to 9 tables.
    */
  private def personalization(df: DataFrame): Map[String, DataFrame] = {
    val s = df.schema
    if (!hasPath(s, Seq("p13nData"))) return Map.empty
    val out = scala.collection.mutable.LinkedHashMap[String, DataFrame]()
    def put(table: String, c: => DataFrame): Unit =
      scala.util.Try(c).toOption.foreach(out(table) = _)
    put("personalization-demographics-languages",
      df.select(explode(col("p13nData.demographics.languages")).as("x")).select("x.*"))
    put("personalization-demographics-genderInfo",
      df.select(col("p13nData.demographics.genderInfo.*")))
    put("personalization-interests",
      df.select(explode(col("p13nData.interests.interests")).as("x")).select("x.*"))
    put("personalization-partnerInterests",
      df.select(explode(col("p13nData.interests.partnerInterests")).as("x")).select("x.*"))
    put("personalization-advertisers",
      df.select(explode(col("p13nData.interests.audienceAndAdvertisers.advertisers"))
        .as("name")))
    put("personalization-num-audiences",
      df.select(col("p13nData.interests.audienceAndAdvertisers.numAudiences")
        .as("numAudiences")))
    put("personalization-shows",
      df.select(explode(col("p13nData.interests.shows")).as("name")))
    put("personalization-locationHistory",
      df.select(explode(col("p13nData.locationHistory")).as("name")))
    put("personalization-inferredAgeInfo",
      df.select(col("p13nData.inferredAgeInfo.*")))
    out.toMap
  }

  /** T5 (`archive.py:191-207`): archive tweets — optional `tweet`
    * envelope, string ids → long, optional columns default-null.
    */
  private def archiveTweet(df: DataFrame): Map[String, DataFrame] = {
    val unwrapped =
      if (df.schema.fieldNames.contains("tweet")) df.select(col("tweet.*")) else df
    val idCast = unwrapped.schema.fields.foldLeft(unwrapped) { (acc, f) =>
      if (f.name == "id" || f.name.endsWith("_id"))
        acc.withColumn(f.name, col(s"`${f.name}`").cast(LongType))
      else acc
    }
    val withOptional = Seq("possibly_sensitive", "coordinates", "geo", "extended_entities")
      .foldLeft(idCast) { (acc, c) =>
        if (acc.schema.fieldNames.contains(c)) acc
        else acc.withColumn(c, lit(null).cast(StringType))
      }
    Map("tweet" -> withOptional)
  }

  /** The registry (`archive.py:53-210`): filename stem → (transformer,
    * pk). pk=None → hash_id column `pk`.
    */
  val transformers: Map[String, (Transformer, Option[String])] = {
    def each(name: String, key: String, pk: Option[String] = None) =
      name -> (Each(name, Seq(key)): Transformer, pk)
    def adPath(name: String, leaf: String) =
      name -> (Each(name, Seq("ad", "adsUserData", leaf)): Transformer, None)
    Map(
      each("account-creation-ip", "accountCreationIp"),
      each("account-suspension", "accountSuspension"),
      each("account-timezone", "accountTimezone"),
      each("account", "account"),
      adPath("ad-engagements", "adEngagements"),
      adPath("ad-impressions", "adImpressions"),
      adPath("ad-mobile-conversions-attributed", "attributedMobileAppConversions"),
      adPath("ad-mobile-conversions-unattributed", "unattributedMobileAppConversions"),
      adPath("ad-online-conversions-attributed", "attributedOnlineConversions"),
      adPath("ad-online-conversions-unattributed", "unattributedOnlineConversions"),
      "ageinfo" -> (Each("ageinfo", Seq("ageMeta", "ageInfo")): Transformer, None),
      each("app", "app", Some("appId")),
      each("block", "blocking", Some("accountId")),
      each("connected-application", "connectedApplication", Some("id")),
      each("direct-message-group-headers", "dmConversation", Some("conversationId")),
      each("direct-messages-group", "dmConversation", Some("conversationId")),
      each("direct-message-headers", "dmConversation", Some("conversationId")),
      each("direct-messages", "dmConversation"),
      each("email-address-change", "emailAddressChange"),
      each("follower", "follower", Some("accountId")),
      each("following", "following", Some("accountId")),
      each("ip-audit", "ipAudit"),
      each("like", "like", Some("tweetId")),
      "lists-created" -> (Multi(listFromCommon("lists-created")): Transformer, None),
      "lists-member" -> (Multi(listFromCommon("lists-member")): Transformer, None),
      "lists-subscribed" -> (Multi(listFromCommon("lists-subscribed")): Transformer, None),
      each("moment", "moment", Some("momentId")),
      "ni-devices" -> (Multi(niDevices): Transformer, None),
      "personalization" -> (Multi(personalization): Transformer, None),
      each("phone-number", "device"),
      each("profile", "profile"),
      each("saved-search", "savedSearch", Some("savedSearchId")),
      "tweet" -> (Multi(archiveTweet): Transformer, Some("id")),
      each("verified", "verified"))
  }

  /** Files the reference deliberately ignores (`archive.py:11`). */
  val Ignore: Set[String] = Set("manifest")

  /** K4 (`archive.py:229-248`): import one .js file — parse, dispatch,
    * drop-and-recreate `archive_<table>` (dashes → underscores). pk
    * tables dedupe by pk (replace); others get the `pk` hash_id
    * column. Empty inputs create no table. Returns imported table
    * names (or a not-implemented notice via stderr, like the
    * reference's print).
    */
  def importFromFile(
      spark: SparkSession,
      store: TableStore,
      filename: String,
      content: String): Seq[String] = {
    require(filename.endsWith(".js"), s"$filename does not end with .js")
    val stem = filename.stripSuffix(".js")
    transformers.get(stem) match {
      case None =>
        if (!Ignore.contains(stem))
          System.err.println(s"$stem: not yet implemented")
        Seq.empty
      case Some((transformer, pk)) =>
        import spark.implicits._
        // one-time rename migration: earlier versions of this repo
        // wrote ni-devices under the corrected name; the reference
        // spells it `ne-devices` (archive.py:140's typo, kept for
        // drop-in parity). Old-name rows MIGRATE into the new-name
        // table (insert-ignore keyed by the same pk convention, so
        // rows already present under the new name win) before the old
        // table drops — a re-import that doesn't cover them no longer
        // silently loses device rows. BEFORE parsing: an empty `[]`
        // re-import must still migrate, not drop-and-lose. When the
        // import DOES carry ne-devices rows, the overwrite below still
        // drop-and-recreates the table, per reference semantics.
        if (stem == "ni-devices" && store.exists("archive_ni_devices")) {
          val old = store.read("archive_ni_devices")
          val keyCol = pk.getOrElse("pk")
          val oldKeyed =
            if (old.columns.contains(keyCol)) old
            else old.withColumn("pk", HashId.hashIdOfAllColumns(old.schema))
          store.insertIgnore("archive_ne_devices", oldKeyed, Seq(keyCol))
          store.drop("archive_ni_devices")
        }
        val json = extractJson(content)
        val parsed = spark.read.json(Seq(json).toDS)
        if (parsed.schema.fieldNames.isEmpty) return Seq.empty // e.g. "[]"
        transformer.tables(parsed).flatMap { case (table, rows) =>
          val tableName = "archive_" + table.replace("-", "_")
          if (rows.isEmpty) None
          else {
            val keyed = pk match {
              case Some(_) => rows
              case None => rows.withColumn("pk",
                HashId.hashIdOfAllColumns(rows.schema))
            }
            // intra-file duplicates resolve last-wins in FILE order,
            // like sqlite-utils' sequential replace (the parsed array
            // is one partition, so the id is file-order-stable)
            val ordered = keyed.withColumn(graft.store.Upsert.OrdCol,
              org.apache.spark.sql.functions.monotonically_increasing_id())
            val deduped = graft.store.Upsert.upsert(
              None, ordered, Seq(pk.getOrElse("pk")))
            store.overwrite(tableName, deduped)
            Some(tableName)
          }
        }.toSeq
    }
  }

  /** The `import` CLI surface (cli.py:737-767): zip, directory of .js,
    * or individual .js paths.
    */
  def importPath(spark: SparkSession, store: TableStore, path: String): Seq[String] = {
    val f = new java.io.File(path)
    val files: Seq[(String, String)] =
      if (f.isDirectory)
        f.listFiles.filter(_.getName.endsWith(".js")).sortBy(_.getName)
          .map(x => x.getName -> scala.io.Source.fromFile(x, "UTF-8").mkString).toSeq
      else if (path.endsWith(".zip")) readArchiveZip(path)
      else Seq(f.getName -> scala.io.Source.fromFile(f, "UTF-8").mkString)
    files.flatMap { case (name, content) =>
      importFromFile(spark, store, name, content)
    }
  }
}
