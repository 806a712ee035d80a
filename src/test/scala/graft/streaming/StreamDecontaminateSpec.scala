package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.TableStore

/** Streaming decontamination gate: a doc sharing any word-8-gram with
  * the installed eval split quarantines, clean docs land, short docs
  * are trivially clean, and redelivery converges (by-pk upserts both
  * sides).
  */
class StreamDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val evalText =
    "the quick brown fox jumps over the lazy dog every single day"

  test("contaminated docs quarantine; clean and short docs land") {
    implicit val sqlCtx = spark.sqlContext
    // counting store: the WIRE path (writeDecontaminated) must hold
    // the read-once blob contract across micro-batches, not just a
    // hand-held sink closure
    var bloomReads = 0
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-sdc").toString) {
      override def read(name: String) = {
        if (name == StreamDecontaminate.bloomName("docs")) bloomReads += 1
        super.read(name)
      }
    }
    StreamDecontaminate.install(store, "docs",
      Seq(evalText).toDF("text"), "text",
      expectedItems = 64L, numBits = 640L)

    val mem = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sdc-ck").toString
    val q = StreamDecontaminate.writeDecontaminated(
      mem.toDF().toDF("doc_id", "text"), store, "docs", "doc_id", "text", ckpt)
    try {
      mem.addData(
        // shares the 8-gram "the quick brown fox jumps over the lazy"
        (1L, "prefix words then the quick brown fox jumps over the lazy dog"),
        // same words, different order: no shared 8-gram → clean
        (2L, "dog lazy the over jumps fox brown quick the day single every"),
        // shorter than 8 tokens: trivially clean
        (3L, "too short to matter"))
      q.processAllAvailable()
      assert(store.read(StreamDecontaminate.quarantineName("docs"))
        .select(col("doc_id")).collect().map(_.getLong(0)).toSeq === Seq(1L))
      assert(store.read("docs")
        .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
        === Seq(2L, 3L))

      // redelivery: same rows, same destinations, no duplicates
      mem.addData(
        (1L, "prefix words then the quick brown fox jumps over the lazy dog"))
      q.processAllAvailable()
      assert(store.read(StreamDecontaminate.quarantineName("docs")).count() === 1L)
      assert(store.read("docs").count() === 2L)
      assert(bloomReads === 1,
        s"wire path fetched the blob $bloomReads times across 2 batches")
    } finally q.stop()
  }

  test("the bloom blob is read once per sink, not per micro-batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sdc3").toString
    var bloomReads = 0
    val store = new TableStore(spark, dir) {
      override def read(name: String) = {
        if (name == StreamDecontaminate.bloomName("docs")) bloomReads += 1
        super.read(name)
      }
    }
    StreamDecontaminate.install(store, "docs",
      Seq(evalText).toDF("text"), "text",
      expectedItems = 64L, numBits = 640L)
    bloomReads = 0
    val sink = StreamDecontaminate.decontaminateSink(
      store, "docs", "doc_id", "text")
    for (b <- 0 until 3)
      sink(Seq((10L + b, s"clean words for batch number $b with nothing shared"))
        .toDF("doc_id", "text"), b.toLong)
    assert(store.read("docs").count() === 3L)
    assert(bloomReads === 1,
      s"blob fetched $bloomReads times across 3 batches; want 1 per query")
  }

  test("a torn install (0-row blob table) fails with an actionable message") {
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-sdc4").toString)
    StreamDecontaminate.install(store, "docs",
      Seq(evalText).toDF("text"), "text",
      expectedItems = 64L, numBits = 640L)
    store.overwrite(StreamDecontaminate.bloomName("docs"),
      store.read(StreamDecontaminate.bloomName("docs")).limit(0))
    val sink = StreamDecontaminate.decontaminateSink(
      store, "docs", "doc_id", "text")
    val ex = intercept[IllegalStateException] {
      sink(Seq((1L, evalText)).toDF("doc_id", "text"), 0L)
    }
    assert(ex.getMessage.contains("re-run"))
  }

  test("empty eval split installs a NULL blob and everything lands clean") {
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-sdc2").toString)
    StreamDecontaminate.install(store, "docs",
      Seq.empty[String].toDF("text"), "text")
    val sink = StreamDecontaminate.decontaminateSink(
      store, "docs", "doc_id", "text")
    sink(Seq((1L, evalText)).toDF("doc_id", "text"), 0L)
    assert(store.read("docs").count() === 1L)
    assert(!store.exists(StreamDecontaminate.quarantineName("docs")))
  }
}
