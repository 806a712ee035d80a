package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.{Lsh, TableStore}

/** Streaming LSH band-index maintenance: micro-batches run the same
  * O(batch) bucket rewrite as the batch path, the index answers
  * incremental collision probes mid-stream, and redelivery converges.
  */
class StreamLshSpec extends SparkSpec {
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta"

  test("streamed docs join the band index and collide with their twins mid-stream") {
    implicit val sqlCtx = spark.sqlContext
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-slsh").toString)
    Lsh.buildIndex(store, "documents",
      Seq(0L -> base, 1L -> "one two three four five six")
        .toDF("doc_id", "text"),
      "doc_id", "text")

    val mem = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-slsh-ck").toString
    val q = StreamLsh.writeBandIndexed(
      mem.toDF().toDF("doc_id", "text"), store, "documents",
      "doc_id", "text", ckpt)
    try {
      // a twin of doc 0 streams in
      mem.addData((100L, base))
      q.processAllAvailable()
      val got = Lsh.candidatesFor(store, "documents", Seq(100L).toDF("pk"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((0L, 100L)))

      // redelivery converges: same rows, same index
      val before = store.read(Lsh.indexName("documents")).count()
      mem.addData((100L, base))
      q.processAllAvailable()
      assert(store.read(Lsh.indexName("documents")).count() === before)
      assert(store.read("documents").count() === 3L)
    } finally q.stop()
  }
}
