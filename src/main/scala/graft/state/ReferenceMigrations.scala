package graft.state

import org.apache.spark.sql.functions._

import graft.ingest.{Normalize, Transforms}
import graft.store.TableStore

/** The reference's one shipped migration
  * (`/root/reference/twitter_to_sqlite/migrations.py:11-28`
  * convert_source_column): tweets whose `source` still holds the raw
  * `<a href=…>` HTML get it extracted into the `sources` dimension and
  * replaced by the sha1 hash id. Golden ids in
  * `tests/test_migrations.py:23-50`.
  */
object ReferenceMigrations {

  val convertSourceColumn: Migrations.Migration = Migrations.Migration(
    "convert_source_column",
    store => {
      if (!store.exists("tweets")) ()
      else {
        val tweets = store.read("tweets")
        val anchored = tweets.filter(col("source").startsWith("<"))
        val sources = anchored.select(
          Normalize.sourceHashId(col("source")).as("id"),
          Transforms.sourceName(col("source")).as("name"),
          Transforms.sourceUrl(col("source")).as("url"))
        store.upsert("sources", sources, Seq("id"))
        store.overwrite("tweets", tweets.withColumn("source",
          when(col("source").startsWith("<"),
            Normalize.sourceHashId(col("source")))
            .otherwise(col("source"))))
      }
    })

  val all: Seq[Migrations.Migration] = Seq(convertSourceColumn)
}
