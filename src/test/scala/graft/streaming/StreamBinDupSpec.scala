package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.{Bin, TableStore}

/** Streaming binary near-dup loop: cold-starts on an EMPTY store (no
  * training precondition anywhere in the loop), screens by Hamming
  * radius, verifies exactly, and converges under redelivery.
  */
class StreamBinDupSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 16

  private def jitter(i: Int, d: Int): Double = {
    var x = i * 1000003 + d * 8191 + 54321
    x ^= x << 13; x ^= x >>> 17; x ^= x << 5
    (math.floorMod(x, 2001) - 1000) / 1000.0 * 2.0
  }

  private def vec(i: Int): Seq[Double] =
    (0 until dims).map(d => math.sin((i % 5) * dims + d) * 10.0 + jitter(i, d))

  test("cold-start screen: twin caught, verification exact, redelivery converges") {
    implicit val sqlCtx = spark.sqlContext
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-sbindup").toString)
    val mem = MemoryStream[(Long, Seq[Double])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sbindup-ck").toString
    val q = StreamBinDup.writeBinDupIndexed(
      mem.toDF().toDF("vec_id", "e"), store, "vectors", "vec_id", "e",
      ckpt, radius = 8, threshold = 0.999)
    try {
      // batch 1: the corpus, onto an EMPTY store — nothing to probe
      // against yet, the index materializes as a side effect
      mem.addData((0 until 40).map(i => (i.toLong, vec(i))): _*)
      q.processAllAvailable()
      assert(store.read(Bin.codesName("vectors")).count() === 40L)
      // jittered same-cluster members sit within the Hamming radius
      // but BELOW the 0.999 cosine bar — the exact stage holds them out
      val early = store.readIfExists(StreamBinDup.dupsName("vectors"))
        .map(_.count()).getOrElse(0L)

      // batch 2: an exact twin of vector 7
      mem.addData((100L, vec(7)))
      q.processAllAvailable()
      val dups = store.read(StreamBinDup.dupsName("vectors"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(dups.contains((7L, 100L)), dups.toString)
      assert(dups.size > early.toInt)
      val after2 = dups.size.toLong

      // redelivery converges (insert-ignore on the ordered pair)
      mem.addData((100L, vec(7)))
      q.processAllAvailable()
      assert(store.read(StreamBinDup.dupsName("vectors")).count() === after2)
      assert(store.read(Bin.codesName("vectors")).count() === 41L)
      assert(store.read("vectors").count() === 41L)
    } finally q.stop()
  }
}
