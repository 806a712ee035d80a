package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IVF+binary composed index: cell pruning + in-cell Hamming over
  * sign blobs. The planted corpus must come back through the TRAINED
  * index path — a rerank recall floor vs exact cosine, exact-twin
  * retrieval, O(batch) cross-cell maintenance via the shared
  * CellIndex machinery, and Doctor-named corruption.
  */
class IvfBinSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 16

  private def freshStore(): TableStore =
    new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-ivfbin").toString)

  private def jitter(i: Int, d: Int): Double = {
    var x = i * 1000003 + d * 8191 + 54321
    x ^= x << 13; x ^= x >>> 17; x ^= x << 5
    (math.floorMod(x, 2001) - 1000) / 1000.0 * 2.0
  }

  private def planted = (0 until 100).map { i =>
    val c = i % 5
    (i.toLong, (0 until dims).map { d =>
      math.sin(c * dims + d) * 10.0 + jitter(i, d)
    })
  }.toDF("vec_id", "e")

  test("trained index: rerank recall@10 floor, same-cluster top-1, Doctor-clean") {
    val store = freshStore()
    IvfBin.buildIndex(store, "vectors", planted, "vec_id", "e",
      kCells = 5, iters = 2)
    assert(store.read(IvfBin.codesName("vectors")).count() === 100L)
    assert(Doctor.check(store).filter(_.component == "ivfbin").isEmpty)

    val queries = planted.filter(col("vec_id") < 5)
    val got = IvfBin.rerank(store, "vectors", queries, "vec_id", "e",
        k = 10, depth = 40, nprobe = 2)
      .filter(col("cand_id") =!= col("query_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val vecs = planted.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val recall = (0L until 5L).map { q =>
      val exact = vecs.keys.filter(_ != q).toSeq
        .sortBy(c => (-dot(vecs(q), vecs(c)) /
          (math.sqrt(dot(vecs(q), vecs(q))) * math.sqrt(dot(vecs(c), vecs(c)))),
          c))
        .take(10).toSet
      val approx = got.filter(_._1 == q).map(_._3).toSet
      exact.intersect(approx).size / 10.0
    }.sum / 5.0
    assert(recall >= 0.8, s"ivfbin rerank recall@10 $recall")
    // clusters are far apart in sign space — the probe must not leak
    got.filter(_._2 == 1L).foreach { case (q, _, cand) =>
      assert(cand % 5 === q % 5, s"query $q top-1 $cand crossed clusters")
    }
  }

  test("a streamed-in twin joins its cell and tops the rerank; moves are O(batch)") {
    val store = freshStore()
    IvfBin.buildIndex(store, "vectors", planted, "vec_id", "e",
      kCells = 5, iters = 2)
    // an exact twin of vector 3: same cell, byte-identical blob
    val twin = Seq((100L, (0 until dims).map(d =>
      math.sin(3 * dims + d) * 10.0 + jitter(3, d))))
      .toDF("vec_id", "e")
    IvfBin.upsertWithCodes(store, "vectors", twin, "vec_id", "e")
    val rows = store.read(IvfBin.codesName("vectors"))
      .select(col("pk"), hex(col("bits")).as("bs"),
        col("cell").cast("long"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(rows.size === 101)
    assert(rows(100L) === rows(3L))

    // 1-bit codes tie whole neighborhoods at Hamming 0 — only the
    // exact-cosine rerank may claim the twin outranks them
    val res = IvfBin.rerank(store, "vectors",
        planted.filter(col("vec_id") === 3), "vec_id", "e",
        k = 2, depth = 20, nprobe = 1)
      .filter(col("cand_id") =!= col("query_id"))
      .collect()
    assert(res.head.getLong(2) === 100L, s"twin not on top: ${res.toSeq}")

    // map stays in sync after a cross-cell move (CellIndex invariant)
    val moved = Seq((100L, (0 until dims).map(d =>
      math.sin(1 * dims + d) * 10.0))).toDF("vec_id", "e")
    IvfBin.upsertWithCodes(store, "vectors", moved, "vec_id", "e")
    assert(Doctor.check(store).filter(_.component == "ivfbin").isEmpty)
    assert(store.read(IvfBin.codesName("vectors")).count() === 101L)
    assert(rows(100L)._2 !== store.read(IvfBin.mapName("vectors"))
      .filter(col("pk") === 100L).select(col("cell").cast("long"))
      .head.getLong(0))
  }

  test("filtered search: predicate holds at wide probes, narrow probes starve") {
    val store = freshStore()
    IvfBin.buildIndex(store, "vectors", planted, "vec_id", "e",
      kCells = 5, iters = 2)
    val queries = planted.filter(col("vec_id") < 3) // centers 0, 1, 2
    val allowed = planted.filter(col("vec_id") % 5 === 4).select(col("vec_id"))
    val allowedSet = allowed.collect().map(_.getLong(0)).toSet

    val wide = IvfBin.annTopKFiltered(store, "vectors", queries,
        "vec_id", "e", k = 5, allowed, nprobe = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(wide.forall { case (_, cand) => allowedSet.contains(cand) })
    assert(wide.groupBy(_._1).forall(_._2.length == 5))

    // each query's own cell holds no allowed member: nprobe=1 sees none
    val narrow = IvfBin.annTopKFiltered(store, "vectors", queries,
        "vec_id", "e", k = 5, allowed, nprobe = 1)
    assert(narrow.count() === 0L,
      "fixture no longer isolates the allowed cluster from the query cells")
  }

  test("seeded corruption is named (stray blob width, missing cents/map)") {
    val store = freshStore()
    IvfBin.buildIndex(store, "vectors", planted, "vec_id", "e",
      kCells = 5, iters = 1)
    val codes = store.read(IvfBin.codesName("vectors"))
    store.overwrite(IvfBin.codesName("vectors"), Iteration.materialize(
      codes.withColumn("bits",
        when(col("pk") === 3L, expr("substring(bits, 1, 1)"))
          .otherwise(col("bits")))), Seq("cell"))
    assert(Doctor.check(store).filter(_.component == "ivfbin")
      .exists(_.problem.contains("mixed blob widths")))
    store.drop(IvfBin.centsName("vectors"))
    assert(Doctor.check(store).filter(_.component == "ivfbin")
      .exists(_.problem.contains("centroids missing")))
    store.drop(IvfBin.mapName("vectors"))
    assert(Doctor.check(store).filter(_.component == "ivfbin")
      .exists(_.problem.contains("map table missing")))
  }
}
