package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.{Lsh, TableStore}

/** Streaming near-dup detection: per micro-batch the LSH index
  * maintains, the batch probes for collisions against the WHOLE
  * corpus, candidates verify by Jaccard, and verified pairs land in
  * the dups ledger idempotently.
  */
class StreamNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta"

  test("streamed twin is detected, verified, and recorded exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-sndup").toString)
    Lsh.buildIndex(store, "documents",
      Seq(0L -> base, 1L -> "one two three four five six")
        .toDF("doc_id", "text"),
      "doc_id", "text")

    val mem = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sndup-ck").toString
    val q = StreamNearDup.writeNearDupIndexed(
      mem.toDF().toDF("doc_id", "text"), store, "documents",
      "doc_id", "text", ckpt, threshold = 0.5)
    try {
      // batch 1: a near-twin of doc 0 (7/9 shared tokens) + noise doc
      mem.addData((100L, base + " iota"), (101L, "totally unrelated words here"))
      q.processAllAvailable()
      val dups1 = store.read(StreamNearDup.dupsName("documents"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(dups1 === Set((0L, 100L)))

      // batch 2: an exact twin of the STREAMED doc — detected against
      // corpus state built by earlier batches, not just the seed
      mem.addData((102L, base + " iota"))
      q.processAllAvailable()
      val dups2 = store.read(StreamNearDup.dupsName("documents"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(dups2.contains((100L, 102L)))
      assert(dups2.contains((0L, 102L))) // transitively near the seed too
      val n = dups2.size

      // redelivery converges: no duplicate ledger rows, same index
      mem.addData((102L, base + " iota"))
      q.processAllAvailable()
      assert(store.read(StreamNearDup.dupsName("documents")).count() === n.toLong)
      assert(store.read("documents").count() === 5L)
    } finally q.stop()
  }
}
