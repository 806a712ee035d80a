package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.{Bin, Ivf, IvfBin, IvfPq, Pq, Sq, TableStore}

/** Streaming vector-index maintenance: micro-batches encode/assign
  * against the PERSISTED books/centroids and replace by pk, so the
  * indexes stay queryable mid-stream and redelivery is idempotent.
  */
class StreamVectorsSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 64

  private def vec(i: Int): Seq[Double] =
    (0 until dims).map(d => ((i * 37 + d * 13) % 101) / 10.0)

  private def corpus: DataFrame =
    (0 until 24).map(i => (i.toLong, vec(i))).toDF("vec_id", "e")

  private def freshStore(): TableStore =
    new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-svec").toString)

  test("streamed vectors join the PQ code table and ADC search mid-stream") {
    implicit val sqlCtx = spark.sqlContext
    val store = freshStore()
    Pq.buildIndex(store, "vectors", corpus, "vec_id", "e", iters = 1)
    assert(store.read(Pq.codesName("vectors")).count() === 24L)

    val mem = MemoryStream[(Long, Seq[Double])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-svec-ck").toString
    val q = StreamVectors.writePqIndexed(
      mem.toDF().toDF("vec_id", "e"), store, "vectors", "vec_id", "e", ckpt)
    try {
      // stream a new vector placed exactly on vector 5's position
      mem.addData((100L, vec(5)))
      q.processAllAvailable()
      val codes = store.read(Pq.codesName("vectors"))
        .select(col("pk"), hex(col("codes")).as("cs"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(codes.size === 25)
      assert(codes(100L) === codes(5L)) // identical position → identical codes

      // ADC search from vec 5's position surfaces the streamed twin
      val res = Pq.annTopK(store, "vectors",
        corpus.filter(col("vec_id") === 5), "vec_id", "e", k = 2)
        .collect()
      assert(res.map(_.getLong(2)).toSet === Set(5L, 100L))

      // redelivery converges (same data, same state)
      mem.addData((100L, vec(5)))
      q.processAllAvailable()
      assert(store.read(Pq.codesName("vectors")).count() === 25L)
      assert(store.read("vectors").count() === 25L)
    } finally q.stop()
  }

  test("streamed vectors join the SQ8 code table and search mid-stream") {
    implicit val sqlCtx = spark.sqlContext
    val store = freshStore()
    Sq.buildIndex(store, "vectors", corpus, "vec_id", "e")
    assert(store.read(Sq.codesName("vectors")).count() === 24L)

    val mem = MemoryStream[(Long, Seq[Double])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-svec-ck6").toString
    val q = StreamVectors.writeSqIndexed(
      mem.toDF().toDF("vec_id", "e"), store, "vectors", "vec_id", "e", ckpt)
    try {
      // stream a new vector placed exactly on vector 5's position:
      // identical codes against the frozen scales
      mem.addData((100L, vec(5)))
      q.processAllAvailable()
      val codes = store.read(Sq.codesName("vectors"))
        .select(col("pk"), hex(col("codes")).as("cs"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(codes.size === 25)
      assert(codes(100L) === codes(5L))

      // asymmetric search from vec 5's position surfaces the twin
      val res = Sq.annTopK(store, "vectors",
        corpus.filter(col("vec_id") === 5), "vec_id", "e", k = 2)
        .collect()
      assert(res.map(_.getLong(2)).toSet === Set(5L, 100L))

      // redelivery converges
      mem.addData((100L, vec(5)))
      q.processAllAvailable()
      assert(store.read(Sq.codesName("vectors")).count() === 25L)
      assert(store.read("vectors").count() === 25L)
    } finally q.stop()
  }

  test("streamed vectors land in their IVF cell and are searchable") {
    implicit val sqlCtx = spark.sqlContext
    val store = freshStore()
    Ivf.buildIndex(store, "vectors", corpus, "vec_id", "e", k = 4, iters = 2)

    val mem = MemoryStream[(Long, Seq[Double])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-svec-ck2").toString
    val q = StreamVectors.writeIvfIndexed(
      mem.toDF().toDF("vec_id", "e"), store, "vectors", "vec_id", "e", ckpt)
    try {
      mem.addData((100L, vec(7)))
      q.processAllAvailable()
      val cells = store.read(Ivf.mapName("vectors"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(cells.size === 25)
      assert(cells(100L) === cells(7L)) // same position → same cell

      val res = Ivf.annTopK(store, "vectors",
        corpus.filter(col("vec_id") === 7), "vec_id", "e", k = 1, nprobe = 1)
        .collect()
      assert(res.head.getLong(2) === 100L) // exact twin tops the ranking
      assert(math.abs(res.head.getDouble(3) - 1.0) < 1e-12)
    } finally q.stop()
  }

  test("streamed vectors land in their IVF+PQ cell with fresh residual codes") {
    implicit val sqlCtx = spark.sqlContext
    val store = freshStore()
    IvfPq.buildIndex(store, "vectors", corpus, "vec_id", "e",
      kCells = 4, kCodes = 8, iters = 2)
    assert(store.read(IvfPq.codesName("vectors")).count() === 24L)

    val mem = MemoryStream[(Long, Seq[Double])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-svec-ck3").toString
    val q = StreamVectors.writeIvfPqIndexed(
      mem.toDF().toDF("vec_id", "e"), store, "vectors", "vec_id", "e", ckpt)
    try {
      // stream a new vector placed exactly on vector 7's position
      mem.addData((100L, vec(7)))
      q.processAllAvailable()
      val rows = store.read(IvfPq.codesName("vectors"))
        .select(col("pk"), hex(col("codes")).as("cs"),
          col("cell").cast("long"))
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
        .toMap
      assert(rows.size === 25)
      assert(rows(100L) === rows(7L)) // same position → same cell + codes

      // ADC search from vec 7's position surfaces the streamed twin
      val res = IvfPq.annTopK(store, "vectors",
        corpus.filter(col("vec_id") === 7), "vec_id", "e",
        k = 1, nprobe = 1)
        .collect()
      assert(res.head.getLong(2) === 100L)

      // redelivery converges (same data, same state)
      mem.addData((100L, vec(7)))
      q.processAllAvailable()
      assert(store.read(IvfPq.codesName("vectors")).count() === 25L)
    } finally q.stop()
  }

  test("a stream COLD-STARTS the binary index — no buildIndex, no trained state") {
    // the property no other vector sink has: encode is stateless, so
    // the first micro-batch can create the index from an empty store
    implicit val sqlCtx = spark.sqlContext
    val store = freshStore()
    val mem = MemoryStream[(Long, Seq[Double])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-svec-ck7").toString
    val q = StreamVectors.writeBinIndexed(
      mem.toDF().toDF("vec_id", "e"), store, "vectors", "vec_id", "e", ckpt)
    try {
      mem.addData((0 until 24).map(i => (i.toLong, vec(i))): _*)
      q.processAllAvailable()
      assert(store.read(Bin.codesName("vectors")).count() === 24L)

      // stream a twin of vector 5; 1-bit codes tie whole
      // neighborhoods at Hamming 0, so only the exact-cosine rerank
      // may claim it — top-2 is {self, twin}, both at cos 1.0
      mem.addData((100L, vec(5)))
      q.processAllAvailable()
      val blobs = store.read(Bin.codesName("vectors"))
        .select(col("pk"), hex(col("bits")).as("bs"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(blobs.size === 25)
      assert(blobs(100L) === blobs(5L))
      val res = Bin.rerank(store, "vectors",
        corpus.filter(col("vec_id") === 5), "vec_id", "e",
        k = 2, depth = 25)
        .collect()
      assert(res.map(_.getLong(2)).toSet === Set(5L, 100L), res.toSeq.toString)

      // redelivery converges
      mem.addData((100L, vec(5)))
      q.processAllAvailable()
      assert(store.read(Bin.codesName("vectors")).count() === 25L)
      assert(store.read("vectors").count() === 25L)
    } finally q.stop()
  }

  test("streamed vectors land in their IVF+binary cell and rerank finds the twin") {
    implicit val sqlCtx = spark.sqlContext
    val store = freshStore()
    IvfBin.buildIndex(store, "vectors", corpus, "vec_id", "e",
      kCells = 4, iters = 2)
    assert(store.read(IvfBin.codesName("vectors")).count() === 24L)

    val mem = MemoryStream[(Long, Seq[Double])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-svec-ck8").toString
    val q = StreamVectors.writeIvfBinIndexed(
      mem.toDF().toDF("vec_id", "e"), store, "vectors", "vec_id", "e", ckpt)
    try {
      mem.addData((100L, vec(7)))
      q.processAllAvailable()
      val rows = store.read(IvfBin.codesName("vectors"))
        .select(col("pk"), hex(col("bits")).as("bs"),
          col("cell").cast("long"))
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
        .toMap
      assert(rows.size === 25)
      assert(rows(100L) === rows(7L)) // same position → same cell + blob

      val res = IvfBin.rerank(store, "vectors",
        corpus.filter(col("vec_id") === 7), "vec_id", "e",
        k = 1, depth = 25, nprobe = 1)
        .collect()
      assert(res.head.getLong(2) === 100L) // annTopK excludes self
      assert(math.abs(res.head.getDouble(3) - 1.0) < 1e-12)

      // redelivery converges
      mem.addData((100L, vec(7)))
      q.processAllAvailable()
      assert(store.read(IvfBin.codesName("vectors")).count() === 25L)
    } finally q.stop()
  }

  test("streaming semantic dedup over IVF+PQ: ADC screen finds the twin, verify is exact") {
    implicit val sqlCtx = spark.sqlContext
    val store = freshStore()
    IvfPq.buildIndex(store, "vectors", corpus, "vec_id", "e",
      kCells = 4, kCodes = 8, iters = 2)

    val mem = MemoryStream[(Long, Seq[Double])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-svec-ck5").toString
    val q = StreamSemanticDedup.writeSemanticDupIndexed(
      mem.toDF().toDF("vec_id", "e"), store, "vectors", "vec_id", "e",
      ckpt, threshold = 0.999)
    try {
      // an exact twin of vector 7: same cell, identical codes, ADC
      // distance 0 → tops the screen; exact cosine 1.0 passes verify
      mem.addData((100L, vec(7)))
      q.processAllAvailable()
      val dups = store.read(StreamSemanticDedup.dupsName("vectors"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(dups === Set((7L, 100L)))

      // redelivery: insert-ignore keeps the ledger converged
      mem.addData((100L, vec(7)))
      q.processAllAvailable()
      assert(store.read(StreamSemanticDedup.dupsName("vectors")).count() === 1L)

      // a lone far-away vector screens candidates but none verify
      mem.addData((200L, (0 until dims).map(d => if (d == 0) 1.0 else 0.0)))
      q.processAllAvailable()
      assert(store.read(StreamSemanticDedup.dupsName("vectors")).count() === 1L)
    } finally q.stop()
  }

  test("streaming embedding near-dup: twin detected via its cell, redelivery converges") {
    implicit val sqlCtx = spark.sqlContext
    val store = freshStore()
    Ivf.buildIndex(store, "vectors", corpus, "vec_id", "e", k = 4, iters = 2)

    val mem = MemoryStream[(Long, Seq[Double])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-svec-ck4").toString
    // threshold near 1: the all-positive pseudo-random corpus has
    // high pairwise cosines (~0.75+), only an exact twin clears 0.999
    val q = StreamEmbedDup.writeEmbedDupIndexed(
      mem.toDF().toDF("vec_id", "e"), store, "vectors", "vec_id", "e",
      ckpt, threshold = 0.999)
    try {
      // an exact twin of vector 7 lands in vector 7's cell
      mem.addData((100L, vec(7)))
      q.processAllAvailable()
      val dups = store.read(StreamEmbedDup.dupsName("vectors"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(dups === Set((7L, 100L)))

      // redelivery: insert-ignore keeps the ledger converged
      mem.addData((100L, vec(7)))
      q.processAllAvailable()
      assert(store.read(StreamEmbedDup.dupsName("vectors")).count() === 1L)

      // a lone far-away vector adds no pairs
      mem.addData((200L, (0 until dims).map(d => if (d == 0) 1.0 else 0.0)))
      q.processAllAvailable()
      assert(store.read(StreamEmbedDup.dupsName("vectors")).count() === 1L)
    } finally q.stop()
  }
}
