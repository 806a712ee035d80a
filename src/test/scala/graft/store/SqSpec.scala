package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scalar-quantization index: per-dim affine codes match the
  * q_int8_quant convention, the persisted tables maintain O(batch),
  * and the asymmetric search clears a real recall floor against exact
  * cosine on a planted-neighborhood corpus.
  */
class SqSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 16

  private def freshStore(): TableStore =
    new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-sq").toString)

  // planted corpus: 5 well-separated centers × 20 jittered members.
  // Jitter (±2.0) sits well ABOVE the int8 resolution of the ±12
  // per-dim range (~0.05/step): members stay mutually distinguishable
  // after quantization, which is what makes self-top-1 a fair ask —
  // at jitter ≈ the quantization step, SQ8 legitimately cannot tell
  // twins apart.
  // integer-hash jitter (the signMatrix recurrence) — sin-phase
  // jitter sin(131·i + d) aliases for i pairs with 131·Δi ≈ 0 mod 2π,
  // planting accidental near-twins the quantizer can't split
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

  test("codes follow the affine floor(v + 0.5) convention; constant dims code 0") {
    val emb = Seq(
      (1L, Seq(0.0, 10.0, 7.0)),
      (2L, Seq(4.0, 10.0, 3.0)),
      (3L, Seq(8.0, 10.0, 5.0))).toDF("vec_id", "e")
    val scales = Sq.trainScales(emb, "e")
    // codes persist as one unsigned byte per dim (BinaryType blob)
    val got = Sq.encode(emb, scales, "vec_id", "e")
      .collect()
      .map(r => r.getLong(0) ->
        r.getAs[Array[Byte]](1).toSeq.map(_ & 0xff)).toMap
    // dim 1: [0, 8] → 0, 128 (4.0 → floor(127.5+0.5)), 255
    // dim 2: constant → 0 everywhere
    // dim 3: [3, 7] → 255, 0, 128 (5.0 → floor(127.5+0.5))
    assert(got(1L) === Seq(0, 0, 255))
    assert(got(2L) === Seq(128, 0, 0))
    assert(got(3L) === Seq(255, 0, 128))
    // dnorm is the dequantized norm: vec 1's dequant is exact on dims
    // 1 and 3 (range endpoints) and mn on the constant dim → the full
    // (0, 10, 7) vector, norm sqrt(149)
    val dn = Sq.encode(emb, scales, "vec_id", "e")
      .filter(col("pk") === 1L).select(col("dnorm")).head.getDouble(0)
    assert(math.abs(dn - math.sqrt(149.0)) < 1e-3, s"dnorm $dn")
  }

  test("dequantization error is bounded by half a step per dimension") {
    // the property that makes SQ8 predictable where PQ is not: with
    // round-half-up codes, |dequant(x) − x| ≤ (mx − mn)/255/2 + ulp
    // noise in every dimension
    val emb = planted
    val scales = Sq.trainScales(emb, "e")
    val worst = emb
      .select(col("vec_id"), posexplode(col("e")).as(Seq("p", "x")))
      .select(col("vec_id"), (col("p") + 1).as("pos"), col("x"))
      .join(broadcast(scales), Seq("pos"))
      .select(col("pos"), col("x"), col("mn"), col("mx"),
        when(col("mx") === col("mn"), lit(0))
          .otherwise(floor(
            (col("x") - col("mn")) * lit(255.0) / (col("mx") - col("mn"))
              + lit(0.5)).cast("int")).as("code"))
      .select(col("pos"),
        abs(col("mn") + col("code").cast("double") * (col("mx") - col("mn"))
          / lit(255.0) - col("x")).as("err"),
        ((col("mx") - col("mn")) / lit(255.0) / lit(2.0) + lit(1e-9)).as("bound"))
      .filter(col("err") > col("bound"))
      .count()
    assert(worst === 0L, s"$worst dims exceed the half-step error bound")
  }

  test("buildIndex + search: every planted query's top-1 is itself, recall@10 >= 0.9") {
    val store = freshStore()
    Sq.buildIndex(store, "vectors", planted, "vec_id", "e")
    assert(store.read(Sq.scalesName("vectors")).count() === dims.toLong)
    assert(store.read(Sq.codesName("vectors")).count() === 100L)

    val queries = planted.filter(col("vec_id") < 5)
    val got = Sq.annTopK(store, "vectors", queries, "vec_id", "e", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // self is findable at full precision → must survive int8
    got.filter(_._2 == 1L).foreach { case (q, _, cand) =>
      assert(cand === q, s"query $q top-1 was $cand")
    }
    // recall@10 vs exact cosine
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val vecs = planted.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val recall = (0L until 5L).map { q =>
      val exact = vecs.keys.toSeq
        .sortBy(c => (-dot(vecs(q), vecs(c)) /
          (math.sqrt(dot(vecs(q), vecs(q))) * math.sqrt(dot(vecs(c), vecs(c)))),
          c))
        .take(10).toSet
      val approx = got.filter(_._1 == q).map(_._3).toSet
      exact.intersect(approx).size / 10.0
    }.sum / 5.0
    assert(recall >= 0.9, s"sq recall@10 $recall")
  }

  test("filtered search: pre-filter equals exhaustive-then-filter, beats post-filter-at-depth") {
    val store = freshStore()
    Sq.buildIndex(store, "vectors", planted, "vec_id", "e")
    val queries = planted.filter(col("vec_id") < 3)
    // a SELECTIVE predicate: only members of center 4 (20 of 100 pks),
    // none of which are the queries' own centers
    val allowed = planted.filter(col("vec_id") % 5 === 4)
      .select(col("vec_id"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    val filtered = rows(Sq.annTopKFiltered(
      store, "vectors", queries, "vec_id", "e", k = 5, allowed))
    // ground truth: score EVERYTHING (k = corpus), then keep allowed
    val allowedSet = allowed.collect().map(_.getLong(0)).toSet
    val exhaustive = rows(Sq.annTopK(
        store, "vectors", queries, "vec_id", "e", k = 100))
      .filter { case (_, _, cand) => allowedSet.contains(cand) }
      .groupBy(_._1).flatMap { case (q, rs) =>
        rs.sortBy(_._2).take(5).zipWithIndex
          .map { case ((_, _, cand), i) => (q, i + 1L, cand) }
      }.toSeq
    assert(filtered.sorted === exhaustive.sorted)
    // every query gets its full k — POST-filtering a depth-5 shortlist
    // would return ZERO here (the queries' own centers crowd out the
    // allowed label entirely at that depth)
    assert(filtered.groupBy(_._1).forall(_._2.size == 5))
    val post5 = rows(Sq.annTopK(store, "vectors", queries, "vec_id", "e", k = 5))
      .filter { case (_, _, cand) => allowedSet.contains(cand) }
    assert(post5.isEmpty,
      "fixture no longer demonstrates the post-filter starvation case")
  }

  test("re-upserted vectors re-encode O(batch); search is deterministic") {
    val store = freshStore()
    Sq.buildIndex(store, "vectors", planted, "vec_id", "e")
    val before = Sq.annTopK(store, "vectors",
        planted.filter(col("vec_id") === 0L), "vec_id", "e", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    // move vector 7 onto an exact twin of query 0: its code row must
    // change and it must enter the query's neighborhood at the top
    // (tie with self, broken by the lower pk)
    val moved = Seq((7L, (0 until dims).map(d => math.sin(d) * 10.0 + jitter(0, d))))
      .toDF("vec_id", "e")
    val oldCodes = store.read(Sq.codesName("vectors"))
      .filter(col("pk") === 7L).select(col("codes"))
      .head.getAs[Array[Byte]](0).toSeq
    Sq.upsertWithCodes(store, "vectors", moved, "vec_id", "e")
    val newCodes = store.read(Sq.codesName("vectors"))
      .filter(col("pk") === 7L).select(col("codes"))
      .head.getAs[Array[Byte]](0).toSeq
    assert(oldCodes !== newCodes)
    assert(store.read(Sq.codesName("vectors")).count() === 100L)
    val after = Sq.annTopK(store, "vectors",
        planted.filter(col("vec_id") === 0L), "vec_id", "e", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(after.map(_._3).contains(7L))

    // determinism: identical plan, identical rows across runs
    val again = Sq.annTopK(store, "vectors",
        planted.filter(col("vec_id") === 0L), "vec_id", "e", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(after === again)
  }
}
