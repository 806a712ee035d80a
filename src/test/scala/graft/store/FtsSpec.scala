package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** FTS inverted-index semantics: build-on-upsert (trigger analog),
  * AND match, BM25 ranked order, index freshness after re-upsert.
  */
class FtsSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): TableStore =
    new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-fts").toString)

  test("index build + MATCH AND semantics") {
    val store = freshStore()
    val docs = Seq(
      (1L, "spark streams join the window"),
      (2L, "the quick brown fox"),
      (3L, "spark window functions")).toDF("id", "full_text")
    Fts.upsertWithIndex(store, "tweets", docs, "id", "full_text")

    def hits(q: String): Set[Long] =
      Fts.search(spark, store, "tweets", q).collect().map(_.getLong(0)).toSet

    assert(hits("spark") === Set(1L, 3L))
    assert(hits("spark window") === Set(1L, 3L)) // AND
    assert(hits("spark fox") === Set.empty)
    assert(hits("THE") === Set(1L, 2L)) // case folded
    assert(hits("absent") === Set.empty)
  }

  test("ranked search: BM25 relevance order (FTS5 ORDER BY rank analog)") {
    val store = freshStore()
    val docs = Seq(
      (1L, "spark spark spark window"),
      (2L, "spark window and other words about other things"),
      (3L, "spark spark window window"),
      (4L, "unrelated text entirely")).toDF("id", "full_text")
    Fts.upsertWithIndex(store, "tweets", docs, "id", "full_text")

    // single term: highest tf in the shortest doc wins
    val one = Fts.searchRanked(spark, store, "tweets", "spark")
      .collect().map(_.getLong(0)).toSeq
    assert(one === Seq(1L, 3L, 2L))

    // two terms: BM25 tf saturation prefers the balanced doc (2+2)
    // over the lopsided one (3+1)
    val two = Fts.searchRanked(spark, store, "tweets", "spark window")
      .collect().map(_.getLong(0)).toSeq
    assert(two === Seq(3L, 1L, 2L))

    // AND semantics preserved: docs missing a term don't appear
    assert(Fts.searchRanked(spark, store, "tweets", "spark unrelated")
      .isEmpty)

    // index carries tf and dl per posting
    val idx = store.read(Fts.indexName("tweets"))
    assert(idx.columns.toSet === Set("pk", "token", "tf", "dl"))
    val row = idx.filter(col("pk") === 1L && col("token") === "spark").head
    assert(row.getAs[Long]("tf") === 3L && row.getAs[Long]("dl") === 4L)
  }

  test("legacy (pk, token) index migrates to the ranked layout on upsert") {
    val store = freshStore()
    // seed base + a pre-ranking-era index (schema without tf/dl)
    store.upsert("tweets",
      Seq((1L, "old spark words")).toDF("id", "full_text"), Seq("id"))
    store.overwrite(Fts.indexName("tweets"),
      Seq((1L, "old"), (1L, "spark"), (1L, "words")).toDF("pk", "token"))

    Fts.upsertWithIndex(store, "tweets",
      Seq((2L, "new spark text")).toDF("id", "full_text"), "id", "full_text")

    val idx = store.read(Fts.indexName("tweets"))
    assert(idx.columns.toSet === Set("pk", "token", "tf", "dl"))
    // both the pre-existing doc and the new batch are searchable/ranked
    assert(Fts.search(spark, store, "tweets", "spark")
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    assert(Fts.searchRanked(spark, store, "tweets", "old")
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("re-upsert replaces a doc's postings (trigger analog)") {
    val store = freshStore()
    Fts.upsertWithIndex(store, "tweets",
      Seq((1L, "old words here")).toDF("id", "full_text"), "id", "full_text")
    assert(Fts.search(spark, store, "tweets", "old").count() === 1)

    Fts.upsertWithIndex(store, "tweets",
      Seq((1L, "completely new text")).toDF("id", "full_text"), "id", "full_text")
    assert(Fts.search(spark, store, "tweets", "old").count() === 0)
    assert(Fts.search(spark, store, "tweets", "new").count() === 1)
    // base table also replaced
    assert(store.read("tweets").count() === 1)
  }
}
