package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.{TableStore, Trigram}

/** Streaming trigram maintenance: substring search answers over
  * everything ingested so far after EVERY micro-batch, the index
  * equals a from-scratch rebuild, and a redelivered batch converges.
  */
class StreamTrigramSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): TableStore =
    new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-stri").toString)

  private def hits(store: TableStore, needle: String): Seq[Long] =
    Trigram.substringSearch(store, "docs", "doc_id", "text", needle)
      .collect().map(_.getLong(0)).sorted.toSeq

  test("searchable after every micro-batch; equals a cold rebuild") {
    implicit val sqlCtx = spark.sqlContext
    val store = freshStore()
    val mem = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stri-ck").toString
    val q = StreamTrigram.writeIndexed(
      mem.toDF().toDF("doc_id", "text"), store, "docs", "doc_id", "text", ckpt)
    try {
      mem.addData((1L, "the quick brown fox"), (2L, "pack my box"))
      q.processAllAvailable()
      assert(hits(store, "quick brown") === Seq(1L))

      mem.addData((3L, "quick silver box"), (4L, "nothing here"))
      q.processAllAvailable()
      assert(hits(store, "quick") === Seq(1L, 3L))
      assert(hits(store, "box") === Seq(2L, 3L))

      // the streamed index equals a from-scratch rebuild of the same docs
      val cold = freshStore()
      Trigram.upsertWithIndex(cold, "docs", store.read("docs"),
        "doc_id", "text")
      def postings(s: TableStore) = s.read(Trigram.indexName("docs"))
        .select(col("pk"), col("g"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(postings(store) === postings(cold))
    } finally q.stop()
  }

  test("redelivered batch converges (idempotent by-pk replace)") {
    val store = freshStore()
    val sink = StreamTrigram.indexSink(store, "docs", "doc_id", "text")
    val batch = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    sink(batch, 0L)
    val before = store.read(Trigram.indexName("docs")).count()
    sink(batch, 0L)
    assert(store.read(Trigram.indexName("docs")).count() === before)
    assert(hits(store, "beta gam") === Seq(1L))
  }
}
