package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Empty-batch upserts must be harmless no-ops on every maintained
  * index: no partition rewrites that lose rows, no crashes on empty
  * driver-side cell/bucket collects, indexes still searchable. The
  * streaming sinks guard `batch.isEmpty` themselves, but batch-path
  * callers can legitimately pass an empty filter result.
  */
class EmptyBatchSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8

  private def vecs: DataFrame =
    (0 until 20).map { i =>
      val sign = if (i % 2 == 0) 1.0 else -1.0
      (i.toLong, (0 until dims).map(d => sign * (10.0 + ((i * 3 + d) % 5) * 0.1)))
    }.toDF("vec_id", "e")

  private def docs: DataFrame = Seq(
    (1L, "the quick brown fox"), (2L, "pack my box with jugs"))
    .toDF("doc_id", "text")

  private def freshStore(): TableStore =
    new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-empty").toString)

  test("empty batches leave IVF, IVF+PQ, and trigram indexes untouched") {
    val store = freshStore()
    Ivf.buildIndex(store, "vectors", vecs, "vec_id", "e", k = 2, iters = 1)
    IvfPq.buildIndex(store, "pvectors", vecs, "vec_id", "e",
      kCells = 2, slices = 4, subDim = 2, kCodes = 4, iters = 1)
    Trigram.upsertWithIndex(store, "docs", docs, "doc_id", "text")

    // binary blob columns (the packed PQ codes) render as identity
    // [B@… in Row.toString — canonicalize them to hex for a VALUE
    // comparison, or "unchanged" could never hold across two reads
    def snapshot(name: String): Set[String] =
      store.read(name).collect().map { r =>
        (0 until r.length).map { i =>
          r.get(i) match {
            case b: Array[Byte] => b.map("%02x".format(_)).mkString
            case v => String.valueOf(v)
          }
        }.mkString("[", ",", "]")
      }.toSet
    val ivfBefore = snapshot(Ivf.indexName("vectors"))
    val pqBefore = snapshot(IvfPq.codesName("pvectors"))
    val triBefore = snapshot(Trigram.indexName("docs"))

    val noVecs = vecs.filter(col("vec_id") < 0)
    val noDocs = docs.filter(col("doc_id") < 0)
    Ivf.upsertWithCells(store, "vectors", noVecs, "vec_id", "e")
    IvfPq.upsertWithCodes(store, "pvectors", noVecs, "vec_id", "e",
      slices = 4, subDim = 2)
    Trigram.upsertWithIndex(store, "docs", noDocs, "doc_id", "text")

    assert(snapshot(Ivf.indexName("vectors")) === ivfBefore)
    assert(snapshot(IvfPq.codesName("pvectors")) === pqBefore)
    assert(snapshot(Trigram.indexName("docs")) === triBefore)

    // and everything still answers
    assert(Ivf.annTopK(store, "vectors", vecs.limit(1), "vec_id", "e",
      k = 1, nprobe = 1).count() === 1)
    assert(IvfPq.annTopK(store, "pvectors", vecs.limit(1), "vec_id", "e",
      k = 1, nprobe = 1, slices = 4, subDim = 2).count() === 1)
    assert(Trigram.substringSearch(store, "docs", "doc_id", "text", "quick")
      .count() === 1)
    assert(Doctor.check(store) === Seq.empty)
  }

  test("all-filtered quantile batches leave the sample table untouched") {
    // the streaming sinks gate on batch.isEmpty, but the quantile
    // sink ALSO gates on the post-null-filter frame — a batch whose
    // rows all filter away must not pay (or even perform) a rewrite
    val store = freshStore()
    val sink = graft.streaming.StreamQuantiles
      .quantilesSink(store, "docs", "grp", "id", "v", 4)
    sink((0 until 10).map(i => ("g", i.toLong, i.toLong))
      .toDF("grp", "id", "v"), 0L)
    val name = graft.streaming.StreamQuantiles.sampleName("docs")
    def files(): Set[String] = store.dataFiles(name).toSet
    val before = files()
    // every row nulls out: null grp and null value
    val allNull = Seq((null.asInstanceOf[String], 1L, null.asInstanceOf[java.lang.Long]))
      .toDF("grp", "id", "v")
    sink(allNull, 1L)
    assert(files() === before,
      "an all-filtered batch rewrote the sample table")
    assert(Doctor.check(store) === Seq.empty)
  }
}
