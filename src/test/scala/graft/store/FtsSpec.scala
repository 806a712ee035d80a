package graft.store

import graft.SparkSpec

/** FTS inverted-index semantics: build-on-upsert (trigger analog),
  * AND match, index freshness after re-upsert.
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
