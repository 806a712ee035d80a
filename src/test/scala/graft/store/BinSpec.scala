package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Binary sign-bit index: stateless encode maintains O(batch), the
  * Hamming shortlist → exact-rerank composition clears a real recall
  * floor against exact cosine (deterministically monotone in the
  * shortlist depth), and Doctor names seeded corruption.
  */
class BinSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 16

  private def freshStore(): TableStore =
    new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-bin").toString)

  // the SqSpec planted corpus: 5 well-separated centers × 20 jittered
  // members. For SIGN bits the relevant property is different from
  // SQ8's: a member's sign pattern matches its center's except on the
  // ~|center|<jitter dims, so same-cluster Hamming is small (0-4 of
  // 16) and cross-cluster large — exactly the shortlist separation
  // the binary rung sells. Hamming TIES inside a cluster are normal
  // (1-bit codes can't rank twins); only the rerank stage claims
  // cosine order.
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

  test("blobs pack ceil(dims/8) bytes; incremental build equals cold rebuild") {
    val store = freshStore()
    val (head, tail) =
      (planted.filter(col("vec_id") < 60), planted.filter(col("vec_id") >= 60))
    Bin.buildIndex(store, "vectors", head, "vec_id", "e")
    Bin.upsertWithCodes(store, "vectors", tail, "vec_id", "e")
    val incr = store.read(Bin.codesName("vectors"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap

    val cold = freshStore()
    Bin.buildIndex(cold, "vectors", planted, "vec_id", "e")
    val full = cold.read(Bin.codesName("vectors"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap

    assert(incr.size === 100)
    assert(incr === full)
    assert(incr.values.forall(_.length === (dims + 7) / 8))
  }

  test("exact twin ties at hamming 0 and the lower pk wins the tie") {
    val store = freshStore()
    val twin = Seq((999L, (0 until dims).map { d =>
      math.sin(d) * 10.0 + jitter(0, d) })).toDF("vec_id", "e")
    Bin.buildIndex(store, "vectors", planted.union(twin), "vec_id", "e")
    val got = Bin.annTopK(store, "vectors",
        planted.filter(col("vec_id") === 0L), "vec_id", "e", k = 25)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // self at distance 0, first by the cand_id tie-break; the planted
    // twin (byte-identical blob) is in the hamming-0 tie group too
    assert(got.head === ((1L, 0L, 0L)))
    val zeroGroup = got.filter(_._3 == 0L).map(_._2).toSet
    assert(zeroGroup.contains(999L), s"twin missing from $zeroGroup")
  }

  test("re-upsert rewrites only the touched pk's blob") {
    val store = freshStore()
    Bin.buildIndex(store, "vectors", planted, "vec_id", "e")
    val before = store.read(Bin.codesName("vectors"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    // flip vector 3 to the negated center-3 pattern: its signs invert
    val moved = Seq((3L, (0 until dims).map { d =>
      -(math.sin(3 * dims + d) * 10.0) })).toDF("vec_id", "e")
    Bin.upsertWithCodes(store, "vectors", moved, "vec_id", "e")
    val after = store.read(Bin.codesName("vectors"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(after.size === 100)
    assert(after(3L) !== before(3L))
    (after - 3L).foreach { case (pk, bits) =>
      assert(bits === before(pk), s"pk $pk blob moved")
    }
  }

  test("rerank recall@10 clears a floor and is deterministically monotone in depth") {
    val store = freshStore()
    Bin.buildIndex(store, "vectors", planted, "vec_id", "e")
    val queries = planted.filter(col("vec_id") < 5)

    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val vecs = planted.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def exactTop10(q: Long): Set[Long] = vecs.keys.toSeq
      .sortBy(c => (-dot(vecs(q), vecs(c)) /
        (math.sqrt(dot(vecs(q), vecs(q))) * math.sqrt(dot(vecs(c), vecs(c)))),
        c))
      .take(10).toSet

    def recallAt(depth: Int): Double = {
      val got = Bin.rerank(store, "vectors", queries, "vec_id", "e",
          k = 10, depth = depth)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
      (0L until 5L).map { q =>
        exactTop10(q).intersect(
          got.filter(_._1 == q).map(_._2).toSet).size / 10.0
      }.sum / 5.0
    }

    val shallow = recallAt(12)
    val deep = recallAt(40)
    // a depth-40 shortlist is a SUPERSET of the depth-12 one (same
    // ordering, longer prefix), so exact-rerank recall cannot drop —
    // this is a deterministic claim, not a statistical one
    assert(deep >= shallow, s"recall fell with depth: $shallow -> $deep")
    assert(shallow >= 0.5, s"recall@10 at depth 12: $shallow")
    assert(deep >= 0.8, s"recall@10 at depth 40: $deep")
  }

  test("filtered search: pre-filter equals exhaustive-then-filter; filtered rerank fills k") {
    val store = freshStore()
    Bin.buildIndex(store, "vectors", planted, "vec_id", "e")
    val queries = planted.filter(col("vec_id") < 3) // centers 0, 1, 2
    val allowed = planted.filter(col("vec_id") % 5 === 4)
      .select(col("vec_id"))
    val allowedSet = allowed.collect().map(_.getLong(0)).toSet
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    val filtered = rows(Bin.annTopKFiltered(
      store, "vectors", queries, "vec_id", "e", k = 5, allowed))
    val exhaustive = rows(Bin.annTopK(
        store, "vectors", queries, "vec_id", "e", k = 100))
      .filter { case (_, _, cand) => allowedSet.contains(cand) }
      .groupBy(_._1).flatMap { case (q, rs) =>
        rs.sortBy(_._2).take(5).zipWithIndex
          .map { case ((_, _, cand), i) => (q, i + 1L, cand) }
      }.toSeq
    assert(filtered.sorted === exhaustive.sorted)
    assert(filtered.groupBy(_._1).forall(_._2.size == 5))

    // filtered rerank: k exact-cosine results, all inside the
    // predicate, where post-filtering a depth-5 unfiltered shortlist
    // would return zero (queries' own centers crowd it out)
    val rr = Bin.rerankFiltered(
        store, "vectors", queries, "vec_id", "e", k = 5, depth = 10, allowed)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(rr.forall { case (_, cand) => allowedSet.contains(cand) })
    assert(rr.groupBy(_._1).forall(_._2.length == 5))
    val post5 = rows(Bin.annTopK(store, "vectors", queries, "vec_id", "e", k = 5))
      .filter { case (_, _, cand) => allowedSet.contains(cand) }
    assert(post5.isEmpty,
      "fixture no longer demonstrates the post-filter starvation case")
  }

  test("doctor: healthy index is silent; seeded corruption is named") {
    val store = freshStore()
    Bin.buildIndex(store, "vectors", planted, "vec_id", "e")
    assert(Doctor.check(store).filter(_.component == "bin") === Seq.empty)

    // out-of-band mixed-width blob (a 24-dim vector's 3-byte blob in
    // a 2-byte index)
    val stray = Seq((998L, (0 until 24).map(d => math.sin(d)))).toDF("vec_id", "e")
    store.upsert(Bin.codesName("vectors"),
      Bin.encode(stray, "vec_id", "e"), Seq("pk"))
    val mixed = Doctor.check(store).filter(_.component == "bin")
    assert(mixed.exists(_.problem.contains("mixed blob widths")), mixed.toString)

    // out-of-band NULL blob
    store.upsert(Bin.codesName("vectors"),
      Seq((997L, null: Array[Byte])).toDF("pk", "bits"), Seq("pk"))
    val nulls = Doctor.check(store).filter(_.component == "bin")
    assert(nulls.exists(_.problem.contains("NULL sign blobs")), nulls.toString)
  }
}
