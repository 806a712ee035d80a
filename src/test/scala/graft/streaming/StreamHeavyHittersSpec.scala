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
        val sketch = store.read(StreamHeavyHitters.sketchName("terms"))
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
    val once = store.read(StreamHeavyHitters.sketchName("terms"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(once === Map("hot" -> 10L))
    sink(batch, 0L) // redelivery of the same epoch
    val twice = store.read(StreamHeavyHitters.sketchName("terms"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(twice === once)
    sink(batch, 1L) // a genuinely new batch does merge
    assert(store.read(StreamHeavyHitters.sketchName("terms"))
      .head.getLong(1) === 20L)
  }
}
