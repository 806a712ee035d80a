package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IVF+SQ composed index: cell pruning + residual int8 codes. The
  * planted corpus must come back through the TRAINED index path —
  * self-retrieval, a recall floor vs exact cosine, and O(batch)
  * cross-cell maintenance via the shared CellIndex machinery.
  */
class IvfSqSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 16

  private def freshStore(): TableStore =
    new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-ivfsq").toString)

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

  test("trained index: self at top-1, recall@10 floor, Doctor-clean") {
    val store = freshStore()
    IvfSq.buildIndex(store, "vectors", planted, "vec_id", "e",
      kCells = 5, iters = 2)
    assert(store.read(IvfSq.codesName("vectors")).count() === 100L)
    assert(store.read(IvfSq.scalesName("vectors")).count() === dims.toLong)
    assert(Doctor.check(store).filter(_.component == "ivfsq").isEmpty)

    val queries = planted.filter(col("vec_id") < 5)
    val got = IvfSq.annTopK(store, "vectors", queries, "vec_id", "e",
        k = 10, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // annTopK excludes self (pk != query) like Ivf's — top-1 must be a
    // same-cluster member; recall measured against exact cosine minus
    // self
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
    assert(recall >= 0.8, s"ivfsq recall@10 $recall")
    // same-cluster top-1 (clusters are far apart; the probe must not
    // leak across)
    got.filter(_._2 == 1L).foreach { case (q, _, cand) =>
      assert(cand % 5 === q % 5, s"query $q top-1 $cand crossed clusters")
    }
  }

  test("a streamed-in twin joins its cell and tops the search; moves are O(batch)") {
    val store = freshStore()
    IvfSq.buildIndex(store, "vectors", planted, "vec_id", "e",
      kCells = 5, iters = 2)
    // an exact twin of vector 3 (cluster 3): same cell, same codes
    val twin = Seq((100L, (0 until dims).map(d =>
      math.sin(3 * dims + d) * 10.0 + jitter(3, d))))
      .toDF("vec_id", "e")
    IvfSq.upsertWithCodes(store, "vectors", twin, "vec_id", "e")
    val rows = store.read(IvfSq.codesName("vectors"))
      .select(col("pk"), hex(col("codes")).as("cs"),
        col("cell").cast("long"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(rows.size === 101)
    assert(rows(100L) === rows(3L))

    val res = IvfSq.annTopK(store, "vectors",
        planted.filter(col("vec_id") === 3), "vec_id", "e", k = 1, nprobe = 1)
      .collect()
    assert(res.head.getLong(2) === 100L, s"twin not on top: ${res.toSeq}")

    // map stays in sync after a cross-cell move (CellIndex invariant,
    // Doctor-checked)
    val moved = Seq((100L, (0 until dims).map(d =>
      math.sin(1 * dims + d) * 10.0))).toDF("vec_id", "e")
    IvfSq.upsertWithCodes(store, "vectors", moved, "vec_id", "e")
    assert(Doctor.check(store).filter(_.component == "ivfsq").isEmpty)
    assert(store.read(IvfSq.codesName("vectors")).count() === 101L)
    assert(rows(100L)._2 !== store.read(IvfSq.mapName("vectors"))
      .filter(col("pk") === 100L).select(col("cell").cast("long"))
      .head.getLong(0))
  }

  test("filtered search: predicate holds, wide probes restore recall, narrow probes starve") {
    val store = freshStore()
    IvfSq.buildIndex(store, "vectors", planted, "vec_id", "e",
      kCells = 5, iters = 2)
    val queries = planted.filter(col("vec_id") < 3) // centers 0, 1, 2
    // selective predicate: members of center 4 only — a DIFFERENT
    // cluster than any query's own, so its cell is never the
    // closest probe
    val allowed = planted.filter(col("vec_id") % 5 === 4).select(col("vec_id"))
    val allowedSet = allowed.collect().map(_.getLong(0)).toSet

    // wide probes (the filtered default covers all 5 cells here):
    // every result satisfies the predicate and every query fills k
    val wide = IvfSq.annTopKFiltered(store, "vectors", queries,
        "vec_id", "e", k = 5, allowed, nprobe = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(wide.forall { case (_, cand) => allowedSet.contains(cand) })
    assert(wide.groupBy(_._1).forall(_._2.length == 5))
    // recall vs exact cosine over the allowed set
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val vecs = planted.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val recall = (0L until 3L).map { q =>
      val exact = allowedSet.toSeq
        .sortBy(c => (-dot(vecs(q), vecs(c)) /
          (math.sqrt(dot(vecs(q), vecs(q))) * math.sqrt(dot(vecs(c), vecs(c)))),
          c))
        .take(5).toSet
      exact.intersect(wide.filter(_._1 == q).map(_._2).toSet).size / 5.0
    }.sum / 3.0
    assert(recall >= 0.8, s"filtered recall@5 $recall")

    // narrow probes (nprobe = 1: each query's own cell only) cannot
    // see the allowed cluster at all — the filter × probe interaction
    // the widened default exists for
    val narrow = IvfSq.annTopKFiltered(store, "vectors", queries,
        "vec_id", "e", k = 5, allowed, nprobe = 1)
    assert(narrow.count() === 0L,
      "fixture no longer isolates the allowed cluster from the query cells")
  }

  test("seeded corruption is named (mis-shaped codes, missing scales)") {
    val store = freshStore()
    IvfSq.buildIndex(store, "vectors", planted, "vec_id", "e",
      kCells = 5, iters = 1)
    val codes = store.read(IvfSq.codesName("vectors"))
    store.overwrite(IvfSq.codesName("vectors"), Iteration.materialize(
      codes.withColumn("codes",
        when(col("pk") === 3L, expr("substring(codes, 1, 4)"))
          .otherwise(col("codes")))), Seq("cell"))
    assert(Doctor.check(store).filter(_.component == "ivfsq")
      .exists(_.problem.contains("don't fit")))
    store.drop(IvfSq.scalesName("vectors"))
    assert(Doctor.check(store).filter(_.component == "ivfsq")
      .exists(_.problem.contains("scales missing")))
  }
}
