package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.{HashId, Upsert}

/** The save_tweets normalization DAG (SURVEY.md §2.5 K1/K2,
  * `/root/reference/utils.py:411-469`): one DataFrame of nested tweet
  * documents → normalized fact / dimension / link DataFrames:
  *
  *   tweets (fact, self-referencing quoted/retweeted ids),
  *   users, sources (sha1 hash id), places, media (dims),
  *   media_tweets, favorited_by (links).
  *
  * The reference recurses into quoted_status / retweeted_status and
  * saves nested tweets first (utils.py:424-431). The API nests at most
  * two levels (retweet of a quote), so the recursion unrolls into an
  * explicit 3-level flatten + unionByName — no driver-side loops, the
  * whole pipeline is one declarative plan (SURVEY.md §7.3).
  *
  * Everything here is schema-driven: each transform inspects the
  * incoming schema and handles absent optional fields, mirroring the
  * reference's dict-based dynamism (`alter=True`) without giving up
  * Catalyst optimization.
  */
object Normalize {

  import Transforms.{htmlUnescape, isoFormat, parseTwitterTime}

  private val Ord = Upsert.OrdCol

  // ---------------------------------------------------------------- util

  private def fieldType(schema: StructType, name: String): Option[DataType] =
    schema.fields.find(_.name == name).map(_.dataType)

  private def structField(schema: StructType, name: String): Option[StructType] =
    fieldType(schema, name) collect { case st: StructType => st }

  // ------------------------------------------------- entity expansion T3

  /** Column form of expand_entities (`utils.py:275-281`): for every
    * array field of `entities` whose element struct has a `url`, fold
    * string-replace(url → expanded_url or url) over the text. Null/
    * absent arrays contribute nothing; a null url leaves the text
    * untouched (the reference would never see one).
    */
  private def expandEntities(text: Column, ent: Column, entSchema: StructType): Column = {
    val urlArrays: Seq[Column] = entSchema.fields.collect {
      case StructField(fname, ArrayType(elem: StructType, _), _, _)
          if elem.fieldNames.contains("url") =>
        val arr = ent.getField(fname)
        val hasExpanded = elem.fieldNames.contains("expanded_url")
        val pairs = transform(arr, e => struct(
          e.getField("url").as("u"),
          (if (hasExpanded) e.getField("expanded_url") else e.getField("url")).as("x")))
        coalesce(pairs, array().cast(ArrayType(StructType(Seq(
          StructField("u", StringType), StructField("x", StringType))))))
    }.toSeq
    if (urlArrays.isEmpty) text
    else {
      val all = if (urlArrays.size == 1) urlArrays.head else concat(urlArrays: _*)
      aggregate(all, text, (acc, e) => {
        val repl = when(length(e.getField("x")) > 0, e.getField("x"))
          .otherwise(e.getField("u"))
        when(e.getField("u").isNotNull && length(e.getField("u")) > 0,
          replace(acc, e.getField("u"), repl)).otherwise(acc)
      })
    }
  }

  // -------------------------------------------------------- T4 sources

  /** extract_and_save_source (`utils.py:668-673`): parse the anchor,
    * hash-id the {name, url} record; empty/null source → null key.
    */
  def sourceHashId(source: Column): Column =
    when(source.isNull || length(source) === 0, lit(null).cast(StringType))
      .otherwise(HashId.hashId(
        "name" -> Transforms.sourceName(source),
        "url" -> Transforms.sourceUrl(source)))

  // ----------------------------------------------------- level flatten

  /** Unroll the recursive quoted/retweeted nesting: returns flat tweet
    * DataFrames (struct fields at top level) each with an `__ord`
    * column encoding the reference's insertion sequence — nested
    * tweets precede their parent, input order preserved (utils.py:
    * 424-431: per input tweet, quoted then retweeted then parent).
    */
  private def levels(raw: DataFrame): Seq[DataFrame] = {
    val iid = "__iid"
    val base =
      if (raw.columns.contains(iid)) raw
      else raw.withColumn(iid, monotonically_increasing_id())

    val l0 = base.withColumn(Ord, col(iid) * 10 + 9).drop(iid)
    // keep __iid on the intermediate frames for the L2 extraction:
    val l1qRaw = structField(base.schema, "quoted_status").map(_ =>
      base.filter(col("quoted_status.id").isNotNull)
        .select(col(iid), col("quoted_status.*")))
    val l1rRaw = structField(base.schema, "retweeted_status").map(_ =>
      base.filter(col("retweeted_status.id").isNotNull)
        .select(col(iid), col("retweeted_status.*")))

    def finish(df: DataFrame, off: Int): DataFrame =
      df.withColumn(Ord, col(iid) * 10 + off).drop(iid)

    // reference insertion sequence per input tweet (utils.py:424-431,
    // recursive save_tweets([quoted, retweeted])): quoted's children,
    // QUOTED ITSELF, retweeted's children, retweeted, parent — i.e.
    // q.q=0, q.r=1, q=2, r.q=3, r.r=4, r=5, parent=9. The quoted
    // subtree completes (2) BEFORE retweeted's children (3,4) start,
    // so a tweet id present in both subtrees resolves LWW exactly
    // like the reference's last sequential insert — including the
    // retweet-of-a-quote shape where the same id is both the parent's
    // quoted_status and retweeted_status.quoted_status.
    val l2 = (l1qRaw.map((_, 0)).toSeq ++ l1rRaw.map((_, 3)).toSeq).flatMap {
      case (l1, base) =>
        Seq(("quoted_status", base), ("retweeted_status", base + 1)).flatMap {
          case (f, off) =>
            structField(l1.schema, f).map { _ =>
              l1.filter(col(s"$f.id").isNotNull)
                .select(col(iid), col(s"$f.*"))
                .withColumn(Ord, col(iid) * 10 + off)
                .drop(iid)
            }
        }
    }
    val l1 = l1qRaw.map(finish(_, 2)).toSeq ++ l1rRaw.map(finish(_, 5)).toSeq
    l2 ++ l1 ++ Seq(l0)
  }

  // ------------------------------------------------------- T1 tweets

  /** transform_tweet (`utils.py:299-310`) + the id-substitutions of
    * save_tweets (utils.py:415-429): entity-expand + unescape
    * full_text, ISO created_at, drop *_str / quoted_status_id /
    * quoted_status_permalink, replace nested user/place/source/
    * quoted/retweeted with their keys.
    */
  private def tweetFact(df: DataFrame): DataFrame = {
    val schema = df.schema
    val entSchema = structField(schema, "entities")
    // With INFERRED schemas (the reference's alter=True world), an
    // always-null nested field (place, quoted_status, …) infers as
    // StringType — extract the surrogate key only when it is actually
    // a struct, otherwise keep the (null) column as-is.
    def keyOf(name: String): Column =
      if (structField(schema, name).isDefined) col(s"$name.id").as(name)
      else col(name)
    val cols: Seq[Column] = schema.fields.flatMap { f =>
      f.name match {
        case "created_at" =>
          Some(isoFormat(parseTwitterTime(col("created_at"))).as("created_at"))
        case "full_text" =>
          val expanded = entSchema
            .map(es => expandEntities(col("full_text"), col("entities"), es))
            .getOrElse(col("full_text"))
          Some(htmlUnescape(expanded).as("full_text"))
        case "user" => Some(keyOf("user"))
        case "place" => Some(keyOf("place"))
        case "source" => Some(sourceHashId(col("source")).as("source"))
        case "quoted_status" => Some(keyOf("quoted_status"))
        case "retweeted_status" => Some(keyOf("retweeted_status"))
        case "entities" | "extended_entities" | "quoted_status_id" |
            "quoted_status_permalink" | "text" => None
        case n if n.endsWith("_str") => None
        case n => Some(col(n))
      }
    }.toSeq
    df.select(cols: _*)
  }

  // -------------------------------------------------------- T2 users

  /** transform_user (`utils.py:284-296`): expand entities inside
    * description and url (only when non-empty, Python truthiness),
    * ISO created_at, drop entities / status / *_str.
    */
  private def transformUsers(df: DataFrame): DataFrame = {
    val schema = df.schema
    val entSchema = structField(schema, "entities")
    def expandVia(textCol: String, entKey: String): Column = {
      val base = col(textCol)
      entSchema.flatMap(structField(_, entKey)) match {
        case Some(sub) =>
          when(base.isNotNull && length(base) > 0,
            expandEntities(base, col("entities").getField(entKey), sub))
            .otherwise(base)
        case None => base
      }
    }
    val cols: Seq[Column] = schema.fields.flatMap { f =>
      f.name match {
        case "created_at" =>
          Some(isoFormat(parseTwitterTime(col("created_at"))).as("created_at"))
        case "description" => Some(expandVia("description", "description").as("description"))
        case "url" => Some(expandVia("url", "url").as("url"))
        case "entities" | "status" => None
        case n if n.endsWith("_str") => None
        case n => Some(col(n))
      }
    }.toSeq
    df.select(cols: _*)
  }

  // ---------------------------------------------------------- the DAG

  /** Full save_tweets: returns the normalized tables as DataFrames,
    * keyed by table name, each already deduped with the reference's
    * replace-upsert (LWW) semantics within the batch. Sinks apply
    * these against existing tables via TableStore/Upsert.
    */
  def saveTweets(raw: DataFrame, favoritedBy: Option[Long] = None): Map[String, DataFrame] = {
    val lvls = levels(raw)

    def unionAll(dfs: Seq[DataFrame]): Option[DataFrame] =
      dfs.reduceOption(_.unionByName(_, allowMissingColumns = true))

    // facts
    val facts = unionAll(lvls.map(tweetFact)).get
    val tweets = Upsert.upsert(None, facts, Seq("id"))

    // users dimension (from every level)
    val userRows = lvls.flatMap { l =>
      structField(l.schema, "user").map(_ =>
        l.filter(col("user.id").isNotNull).select(col(Ord), col("user.*")))
    }
    val users = Upsert.upsert(None, unionAll(userRows.map(transformUsers)).get, Seq("id"))

    // sources dimension
    val sourceRows = lvls.map(_
      .filter(col("source").isNotNull && length(col("source")) > 0)
      .select(
        sourceHashId(col("source")).as("id"),
        Transforms.sourceName(col("source")).as("name"),
        Transforms.sourceUrl(col("source")).as("url"),
        col(Ord)))
    val sources = Upsert.upsert(None, unionAll(sourceRows).get, Seq("id"))

    // places dimension
    val placeRows = lvls.flatMap { l =>
      structField(l.schema, "place").map(_ =>
        l.filter(col("place.id").isNotNull).select(col(Ord), col("place.*")))
    }
    val places = unionAll(placeRows).map(Upsert.upsert(None, _, Seq("id")))

    // media dimension + m2m links
    val mediaRows = lvls.flatMap { l =>
      structField(l.schema, "extended_entities")
        .filter(_.fieldNames.contains("media"))
        .map(_ => l
          .filter(col("extended_entities.media").isNotNull)
          .select(col("id").as("__tweet_id"), col(Ord),
            explode(col("extended_entities.media")).as("m")))
    }
    val media = unionAll(mediaRows.map(_.select(col(Ord), col("m.*"))))
      .map(Upsert.upsert(None, _, Seq("id")))
    val mediaTweets = unionAll(mediaRows.map(_.select(
      col("m.id").as("media_id"), col("__tweet_id").as("tweets_id"), col(Ord))))
      .map(Upsert.upsert(None, _, Seq("media_id", "tweets_id")))

    // favorited_by records only the TOP-LEVEL tweets (the reference's
    // recursion passes no favorited_by for nested statuses,
    // utils.py:431 vs :435-441)
    val favorited = favoritedBy.map(uid =>
      raw.select(col("id").as("tweet")).distinct().withColumn("user", lit(uid)))

    Map("tweets" -> tweets, "users" -> users, "sources" -> sources) ++
      places.map("places" -> _) ++
      media.map("media" -> _) ++
      mediaTweets.map("media_tweets" -> _) ++
      favorited.map("favorited_by" -> _)
  }

  /** save_users (K2, `utils.py:449-469`): transform + upsert user
    * docs; optionally emit `following` graph edges — when fetched as
    * someone's followers, followedId is fixed and each user is the
    * follower (and vice versa). Edges carry first_seen and are
    * insert-IGNORED downstream so the original sighting date survives
    * re-fetches (K7).
    */
  def saveUsers(
      raw: DataFrame,
      followedId: Option[Long] = None,
      followerId: Option[Long] = None,
      firstSeen: String = ""): Map[String, DataFrame] = {
    require(followedId.isEmpty || followerId.isEmpty,
      "pass followedId or followerId, not both")
    val withOrd =
      if (raw.columns.contains(Ord)) raw
      else raw.withColumn(Ord, monotonically_increasing_id())
    val users = Upsert.upsert(None, transformUsers(withOrd), Seq("id"))
    val edges = (followedId, followerId) match {
      case (None, None) => None
      case _ => Some(users.select(
        followedId.map(lit(_)).getOrElse(col("id")).as("followed_id"),
        followerId.map(lit(_)).getOrElse(col("id")).as("follower_id"),
        lit(firstSeen).as("first_seen")))
    }
    Map("users" -> users) ++ edges.map("following" -> _)
  }
}
