package graft.schema

import org.apache.spark.sql.types._

/** Explicit StructTypes for Twitter API v1.1 documents (the reference's
  * fixed seed schema + observed fixture shape, SURVEY.md §1.3 /
  * FIXTURES.md §1). Field order follows the API document order so the
  * SQLite-compat JSON rendering reproduces the reference's
  * `json.dumps` output byte-for-byte (Python preserves dict order).
  *
  * All id fields are LongType — tweet ids exceed 2^53, doubles would
  * corrupt them (README.md:374 of the reference stores them as int for
  * the same reason).
  *
  * The reference grows columns dynamically (`alter=True`); here the
  * explicit schema covers the fixed core, and
  * `Upsert.upsert`'s deep unionByName(allowMissingColumns) supplies the
  * schema-evolution behavior for anything beyond it.
  */
object TwitterSchemas {

  val entityUrl: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("expanded_url", StringType),
    StructField("display_url", StringType),
    StructField("indices", ArrayType(LongType))))

  val userMention: StructType = StructType(Seq(
    StructField("screen_name", StringType),
    StructField("name", StringType),
    StructField("id", LongType),
    StructField("id_str", StringType),
    StructField("indices", ArrayType(LongType))))

  val hashtag: StructType = StructType(Seq(
    StructField("text", StringType),
    StructField("indices", ArrayType(LongType))))

  val mediaSize: StructType = StructType(Seq(
    StructField("w", LongType),
    StructField("h", LongType),
    StructField("resize", StringType)))

  val media: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("id_str", StringType),
    StructField("indices", ArrayType(LongType)),
    StructField("media_url", StringType),
    StructField("media_url_https", StringType),
    StructField("url", StringType),
    StructField("display_url", StringType),
    StructField("expanded_url", StringType),
    StructField("type", StringType),
    StructField("sizes", MapType(StringType, mediaSize)),
    StructField("source_status_id", LongType),
    StructField("source_status_id_str", StringType),
    StructField("source_user_id", LongType),
    StructField("source_user_id_str", StringType)))

  val entities: StructType = StructType(Seq(
    StructField("hashtags", ArrayType(hashtag)),
    StructField("symbols", ArrayType(hashtag)),
    StructField("user_mentions", ArrayType(userMention)),
    StructField("urls", ArrayType(entityUrl)),
    StructField("media", ArrayType(media))))

  val extendedEntities: StructType = StructType(Seq(
    StructField("media", ArrayType(media))))

  val userEntities: StructType = StructType(Seq(
    StructField("url", StructType(Seq(
      StructField("urls", ArrayType(entityUrl))))),
    StructField("description", StructType(Seq(
      StructField("urls", ArrayType(entityUrl)))))))

  val user: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("id_str", StringType),
    StructField("name", StringType),
    StructField("screen_name", StringType),
    StructField("location", StringType),
    StructField("description", StringType),
    StructField("url", StringType),
    StructField("entities", userEntities),
    StructField("protected", BooleanType),
    StructField("followers_count", LongType),
    StructField("friends_count", LongType),
    StructField("listed_count", LongType),
    StructField("created_at", StringType),
    StructField("favourites_count", LongType),
    StructField("utc_offset", StringType),
    StructField("time_zone", StringType),
    StructField("geo_enabled", BooleanType),
    StructField("verified", BooleanType),
    StructField("statuses_count", LongType),
    StructField("lang", StringType),
    StructField("contributors_enabled", BooleanType),
    StructField("is_translator", BooleanType),
    StructField("is_translation_enabled", BooleanType),
    StructField("profile_background_color", StringType),
    StructField("profile_background_image_url", StringType),
    StructField("profile_background_image_url_https", StringType),
    StructField("profile_background_tile", BooleanType),
    StructField("profile_image_url", StringType),
    StructField("profile_image_url_https", StringType),
    StructField("profile_banner_url", StringType),
    StructField("profile_link_color", StringType),
    StructField("profile_sidebar_border_color", StringType),
    StructField("profile_sidebar_fill_color", StringType),
    StructField("profile_text_color", StringType),
    StructField("profile_use_background_image", BooleanType),
    StructField("has_extended_profile", BooleanType),
    StructField("default_profile", BooleanType),
    StructField("default_profile_image", BooleanType),
    StructField("following", BooleanType),
    StructField("follow_request_sent", BooleanType),
    StructField("notifications", BooleanType),
    StructField("translator_type", StringType)))

  val boundingBox: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("coordinates", ArrayType(ArrayType(ArrayType(DoubleType))))))

  val place: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("url", StringType),
    StructField("place_type", StringType),
    StructField("name", StringType),
    StructField("full_name", StringType),
    StructField("country_code", StringType),
    StructField("country", StringType),
    StructField("contained_within", ArrayType(StringType)),
    StructField("bounding_box", boundingBox),
    StructField("attributes", MapType(StringType, StringType))))

  val quotedStatusPermalink: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("expanded", StringType),
    StructField("display", StringType)))

  /** Streaming-format extras (S12, `/root/reference/utils.py:636-644`):
    * the firehose delivers truncated `text` plus an `extended_tweet`
    * envelope holding the full versions.
    */
  val extendedTweet: StructType = StructType(Seq(
    StructField("full_text", StringType),
    StructField("display_text_range", ArrayType(LongType)),
    StructField("entities", entities),
    StructField("extended_entities", extendedEntities)))

  /** Tweet document as delivered by the streaming API: REST shape plus
    * `extended_tweet` at every nesting level.
    */
  def streamTweet(depth: Int = 2): StructType = {
    val base = tweet(0).fields.toSeq :+ StructField("extended_tweet", extendedTweet)
    val nested =
      if (depth <= 0) Seq.empty
      else Seq(
        StructField("retweeted_status", streamTweet(depth - 1)),
        StructField("quoted_status", streamTweet(depth - 1)))
    StructType(base ++ nested)
  }

  /** Tweet document. `depth` controls how many levels of nested
    * quoted_status / retweeted_status are modeled (the API nests at
    * most a retweet-of-a-quote = 2; the reference recursion is
    * unbounded but the data is not, SURVEY.md §7.3).
    */
  def tweet(depth: Int = 2): StructType = {
    val base = Seq(
      StructField("created_at", StringType),
      StructField("id", LongType),
      StructField("id_str", StringType),
      StructField("full_text", StringType),
      // streaming API pre-extended format (S12):
      StructField("text", StringType),
      StructField("truncated", BooleanType),
      StructField("display_text_range", ArrayType(LongType)),
      StructField("entities", entities),
      StructField("source", StringType),
      StructField("in_reply_to_status_id", LongType),
      StructField("in_reply_to_status_id_str", StringType),
      StructField("in_reply_to_user_id", LongType),
      StructField("in_reply_to_user_id_str", StringType),
      StructField("in_reply_to_screen_name", StringType),
      StructField("user", user),
      StructField("geo", StringType),
      StructField("coordinates", StringType),
      StructField("place", place),
      StructField("contributors", StringType),
      StructField("is_quote_status", BooleanType),
      StructField("retweet_count", LongType),
      StructField("favorite_count", LongType),
      StructField("favorited", BooleanType),
      StructField("retweeted", BooleanType),
      StructField("lang", StringType),
      StructField("extended_entities", extendedEntities),
      StructField("possibly_sensitive", BooleanType),
      StructField("quoted_status_id", LongType),
      StructField("quoted_status_id_str", StringType),
      StructField("quoted_status_permalink", quotedStatusPermalink))
    val nested =
      if (depth <= 0) Seq.empty
      else Seq(
        StructField("retweeted_status", tweet(depth - 1)),
        StructField("quoted_status", tweet(depth - 1)))
    StructType(base ++ nested)
  }
}
