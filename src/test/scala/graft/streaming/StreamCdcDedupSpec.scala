package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.TableStore

/** Streaming CDC dedup: per micro-batch, documents are chunked with
  * the content-defined rolling hash, per-doc overlap with the
  * pre-batch chunk ledger is recorded, and the ledger grows
  * first-wins. The property under test is the one whole-document
  * fingerprints lack: a prefix-shifted repost is exposed as
  * mostly-seen on arrival.
  */
class StreamCdcDedupSpec extends SparkSpec {
  import spark.implicits._

  // long enough to span several 64-char-expected chunks
  private val article = (1 to 120)
    .map(i => s"word$i token${i * 7 % 13} item${i * 11 % 17}")
    .mkString(" ")

  private def runStream(store: TableStore, bucketize: Boolean): Unit = {
    implicit val sqlCtx = spark.sqlContext
    if (bucketize)
      store.ensureBucketed(StreamCdcDedup.ledgerName("documents"), Seq("fp"), 8)
    val mem = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-scdc-ck").toString
    val q = StreamCdcDedup.writeCdcDeduped(
      mem.toDF().toDF("doc_id", "text"), store, "documents",
      "doc_id", "text", ckpt)
    try {
      // batch 1: two unrelated docs — nothing seen yet
      mem.addData((1L, article), (2L, "totally unrelated words here"))
      q.processAllAvailable()
      // batch 2: an exact repost, a PREFIX-SHIFTED repost, and noise
      mem.addData(
        (10L, article),
        (11L, "breaking update just in " + article),
        (12L, "other fresh content entirely"))
      q.processAllAvailable()
      // redelivered batch must not change stats or ledger
      val statsBefore = store.read(StreamCdcDedup.statsName("documents"))
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      val ledgerBefore = store.read(StreamCdcDedup.ledgerName("documents")).count()
      mem.addData((10L, article))
      q.processAllAvailable()
      assert(store.read(StreamCdcDedup.statsName("documents"))
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap === statsBefore)
      assert(store.read(StreamCdcDedup.ledgerName("documents")).count()
        === ledgerBefore)
    } finally q.stop()
  }

  private def checkStats(store: TableStore): Unit = {
    val stats = store.read(StreamCdcDedup.statsName("documents"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_seen")))
      .toMap
    assert(stats.keySet === Set(1L, 2L, 10L, 11L, 12L))
    // batch 1 arrived to an empty ledger
    assert(stats(1L)._2 === 0L)
    assert(stats(2L)._2 === 0L)
    assert(stats(1L)._1 > 3L, s"fixture too short: ${stats(1L)._1} chunks")
    // the exact repost: every chunk already in the ledger
    assert(stats(10L)._2 === stats(10L)._1)
    // the prefix-shifted repost: chunks re-align after the first
    // boundary, so MOST are seen — the property fixed-offset windows
    // and whole-doc fingerprints both miss
    assert(stats(11L)._2 * 2 > stats(11L)._1,
      s"shifted repost not detected: ${stats(11L)._2}/${stats(11L)._1} seen")
    // fresh content stays fresh
    assert(stats(12L)._2 === 0L)
  }

  test("prefix-shifted repost is exposed as mostly-seen; redelivery converges") {
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-scdc").toString)
    runStream(store, bucketize = false)
    checkStats(store)
  }

  test("bucketized ledger: same stats through the bucket-pruned probe") {
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-scdc-b").toString)
    runStream(store, bucketize = true)
    checkStats(store)
    val ledgerN = StreamCdcDedup.ledgerName("documents")
    assert(store.bucketLayoutOf(ledgerN) === Some((8, Seq("fp"))))
    assert(store.partitionColumnsOf(ledgerN) === Seq("pk_bucket"))
  }
}
