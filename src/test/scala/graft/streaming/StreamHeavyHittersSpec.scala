package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.TableStore

/** Streaming Misra-Gries maintenance: the persisted sketch keeps the
  * frequent-items guarantee over the WHOLE stream history at every
  * micro-batch boundary, stays k-bounded, and a redelivered batchId
  * never double-counts.
  */
class StreamHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): TableStore =
    new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-shh").toString)

  test("sketch holds the guarantee across batches and stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    val store = freshStore()
    val k = 8
    val mem = MemoryStream[String]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-shh-ck").toString
    val q = StreamHeavyHitters.writeHeavyHitters(
      mem.toDF().toDF("term"), store, "terms", "term", ckpt, k)

    // zipf-ish skew split across batches + a churning tail
    def batchData(offset: Int): Seq[String] =
      (1 to 6).flatMap(i => Seq.fill(60 / i)(s"hot_$i")) ++
        (0 until 100).map(i => s"tail_${offset + i}")
    val all = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      for (b <- 0 until 3) {
        val data = batchData(b * 100)
        all ++= data
        mem.addData(data: _*)
        q.processAllAvailable()
        val sketch = StreamHeavyHitters.counters(store, "terms")
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(sketch.size <= k, s"batch $b: ${sketch.size} > $k")
        val n = all.size.toLong
        val exact = all.groupBy(identity).map { case (t, v) => t -> v.size }
        val mustHave = exact.filter(_._2 > n / (k + 1)).keySet
        assert(mustHave.subsetOf(sketch.keySet),
          s"batch $b missing: ${mustHave -- sketch.keySet}")
      }
    } finally q.stop()
  }

  test("a redelivered batchId never merges twice") {
    val store = freshStore()
    val sink = StreamHeavyHitters.heavyHittersSink(store, "terms", "term", 8)
    val batch = Seq.fill(10)("hot").toDF("term")
    sink(batch, 0L)
    def counters() = StreamHeavyHitters.counters(store, "terms")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counters() === Map("hot" -> 10L))
    sink(batch, 0L) // redelivery of the same epoch
    assert(counters() === Map("hot" -> 10L))
    sink(batch, 1L) // a genuinely new batch does merge
    assert(counters() === Map("hot" -> 20L))
    // the watermark rides the SAME swap as the counters — one table,
    // no crash window between data and batch-id
    assert(store.read(StreamHeavyHitters.sketchName("terms"))
      .select(col("batch_id")).distinct().head.getLong(0) === 1L)
  }

  test("a fresh checkpoint (new run_id) merges from batch 0 instead of skipping") {
    val store = freshStore()
    def sink(run: String) =
      StreamHeavyHitters.heavyHittersSink(store, "terms", "term", 8, runId = run)
    def counters() = StreamHeavyHitters.counters(store, "terms")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sink("ckpt-A")(Seq.fill(10)("hot").toDF("term"), 5L)
    assert(counters() === Map("hot" -> 10L))
    // same run, stale batchId: redelivery, skip
    sink("ckpt-A")(Seq.fill(10)("hot").toDF("term"), 3L)
    assert(counters() === Map("hot" -> 10L))
    // NEW checkpoint lineage restarts batchIds at 0 — with a
    // batch_id-only watermark this batch (and the next 5) would be
    // silently dropped; the run-scoped watermark merges it
    sink("ckpt-B")(Seq.fill(7)("hot").toDF("term"), 0L)
    assert(counters() === Map("hot" -> 17L))
  }

  test("a degenerate sketch (out-of-band rewrite) is overwritten, not a crash loop") {
    val store = freshStore()
    val sink = StreamHeavyHitters.heavyHittersSink(store, "terms", "term", 8)
    // the exact state Doctor reports: a *_hh table that is not
    // sketch-shaped — the sink must treat it as no-watermark and
    // replace it, not AnalysisException on every batch
    store.overwrite(StreamHeavyHitters.sketchName("terms"),
      Seq((0L, "junk")).toDF("batch_id", "whatever"))
    sink(Seq.fill(4)("hot").toDF("term"), 0L)
    assert(StreamHeavyHitters.counters(store, "terms")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === Map("hot" -> 4L))
    // a 0-row sketch likewise
    store.overwrite(StreamHeavyHitters.sketchName("terms"),
      store.read(StreamHeavyHitters.sketchName("terms")).limit(0))
    sink(Seq.fill(3)("hot").toDF("term"), 1L)
    assert(StreamHeavyHitters.counters(store, "terms")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === Map("hot" -> 3L))
  }

  test("an all-tied overflow still advances the watermark via the sentinel") {
    val store = freshStore()
    val sink = StreamHeavyHitters.heavyHittersSink(store, "terms", "term", 2)
    // 3 distinct items, one occurrence each, k=2: the combine
    // subtracts the 3rd-largest (1) and drops EVERYTHING
    sink(Seq("a", "b", "c").toDF("term"), 0L)
    assert(StreamHeavyHitters.counters(store, "terms").count() === 0L)
    // redelivery of batch 0 must still skip — the sentinel row holds
    // the batch id even with zero counters
    sink(Seq("a", "b", "c").toDF("term"), 0L)
    assert(StreamHeavyHitters.counters(store, "terms").count() === 0L)
    sink(Seq.fill(5)("d").toDF("term"), 1L)
    assert(StreamHeavyHitters.counters(store, "terms")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      === Set(("d", 5L)))
  }
}
