package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PairExpansion must emit exactly the naive in-bucket all-pairs set
  * for ANY cellSize — including the adversarial case every LSH dedup
  * eventually hits: one degenerate bucket holding a large share of
  * the corpus (boilerplate). There the grid split is what keeps any
  * single task's expansion bounded.
  */
class PairExpansionSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference: self-join on the bucket key, a.id < b.id. */
  private def naivePairs(members: org.apache.spark.sql.DataFrame) = {
    val a = members.select(col("k1"), col("k2"),
      col("id").as("a_id"), col("payload").as("a_p"))
    val b = members.select(col("k1"), col("k2"),
      col("id").as("b_id"), col("payload").as("b_p"))
    a.join(b, Seq("k1", "k2")).filter(col("a_id") < col("b_id"))
      .select("a_id", "a_p", "b_id", "b_p").distinct()
  }

  private def gridPairs(members: org.apache.spark.sql.DataFrame, cellSize: Int) =
    PairExpansion.pairsWithinBuckets(members, Seq("k1", "k2"), "id",
        payloadCols = Seq("payload"), cellSize = cellSize)
      .select(col("a.id").as("a_id"), col("a.payload").as("a_p"),
        col("b.id").as("b_id"), col("b.payload").as("b_p"))
      .distinct()

  test("matches naive expansion on mixed bucket sizes, any cellSize") {
    // buckets of size 1, 2, 3, 7 across two key columns
    val members = Seq(
      (0L, "x", 1L, "p1"), (0L, "x", 2L, "p2"),
      (0L, "y", 3L, "p3"),
      (1L, "x", 4L, "p4"), (1L, "x", 5L, "p5"), (1L, "x", 6L, "p6"),
      (2L, "z", 10L, "a"), (2L, "z", 11L, "b"), (2L, "z", 12L, "c"),
      (2L, "z", 13L, "d"), (2L, "z", 14L, "e"), (2L, "z", 15L, "f"),
      (2L, "z", 16L, "g")
    ).toDF("k1", "k2", "id", "payload")
    val expected = naivePairs(members)
    for (cellSize <- Seq(1, 2, 3, 64)) {
      val got = gridPairs(members, cellSize)
      assert(got.count() === expected.count(), s"cellSize=$cellSize")
      assert(got.except(expected).isEmpty && expected.except(got).isEmpty,
        s"cellSize=$cellSize")
    }
  }

  test("property: random corpora match naive expansion across cell sizes") {
    val rnd = new scala.util.Random(11)
    (1 to 6).foreach { round =>
      val nBuckets = 1 + rnd.nextInt(5)
      val members = (1 to 60 + rnd.nextInt(120)).map { i =>
        (rnd.nextInt(nBuckets).toLong, s"k${rnd.nextInt(2)}",
          i.toLong, s"p$i")
      }.toDF("k1", "k2", "id", "payload")
      val expected = naivePairs(members)
      val cellSize = 1 + rnd.nextInt(20)
      val got = gridPairs(members, cellSize)
      assert(got.count() === expected.count(), s"round=$round cs=$cellSize")
      assert(got.except(expected).isEmpty && expected.except(got).isEmpty,
        s"round=$round cs=$cellSize")
    }
  }

  test("adversarial single hot bucket: exact pair set, bounded cells") {
    // 300 members in ONE bucket → 300·299/2 = 44850 pairs; with
    // cellSize=16 the grid splits it into ceil(300/16)=19 groups so no
    // task expands more than ~16² pairs at once.
    val n = 300
    val members = (1 to n).map(i => (9L, "hot", i.toLong, s"p$i"))
      .toDF("k1", "k2", "id", "payload")
    val got = gridPairs(members, cellSize = 16)
    assert(got.count() === n.toLong * (n - 1) / 2)
    // spot equality with naive (full except is O(n²) rows but n is small)
    val expected = naivePairs(members)
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
    // pair order canonical: a < b everywhere
    assert(got.filter(col("a_id") >= col("b_id")).isEmpty)
    // and the grid actually split the bucket: every (bucket, group)
    // cell holds ≤ cellSize members for the 19-way split
    val cellSizes = members
      .withColumn("ng", lit(math.ceil(n / 16.0).toLong))
      .withColumn("g", pmod(xxhash64(col("id")), col("ng")))
      .groupBy("g").count()
    assert(cellSizes.count() > 10)
    assert(cellSizes.agg(max("count")).head.getLong(0) <= 3 * 16)
  }

  test("duplicate ids in a bucket never emit a self-pair (precondition guard)") {
    // id 1 appears twice with different payloads — a violated
    // uniqueness precondition must degrade (no (1,1) pair), not emit a
    // self-pair that a Jaccard/Hamming verify would score as a perfect
    // duplicate of itself
    val members = Seq(
      (0L, "x", 1L, "pA"), (0L, "x", 1L, "pB"), (0L, "x", 2L, "p2"))
      .toDF("k1", "k2", "id", "payload")
    val got = gridPairs(members, cellSize = 4)
    assert(got.filter(col("a_id") === col("b_id")).isEmpty)
    // the distinct-id pair is still produced (with either payload)
    assert(got.filter(col("a_id") === 1L && col("b_id") === 2L).count() >= 1)
  }

  test("duplicate ids dedup deterministically: one pair, minimal payload wins") {
    // raw output (no distinct): each duplicated id must collapse to
    // its minimal-payload struct BEFORE expansion, so the pair set has
    // no payload-divergent double emissions — across every cellSize
    // (duplicates hash to the same grid group, so in-task dedup is
    // globally correct)
    val members = Seq(
      (0L, "x", 1L, "pB"), (0L, "x", 1L, "pA"), (0L, "x", 1L, "pC"),
      (0L, "x", 2L, "p2"), (0L, "x", 3L, "p3"), (0L, "x", 3L, "p0"))
      .toDF("k1", "k2", "id", "payload")
    for (cellSize <- Seq(1, 2, 64)) {
      val raw = PairExpansion.pairsWithinBuckets(members, Seq("k1", "k2"), "id",
          payloadCols = Seq("payload"), cellSize = cellSize)
        .select(col("a.id").as("a_id"), col("a.payload").as("a_p"),
          col("b.id").as("b_id"), col("b.payload").as("b_p"))
      // exactly the 3 distinct-id pairs, each emitted once, no self-pairs
      assert(raw.count() === 3L, s"cellSize=$cellSize")
      assert(raw.filter(col("a_id") === col("b_id")).isEmpty)
      // the surviving payload for id 1 is the minimal one everywhere
      assert(raw.filter(col("a_id") === 1L && col("a_p") =!= "pA").isEmpty,
        s"cellSize=$cellSize")
      // and for id 3 (appears on the b side)
      assert(raw.filter(col("b_id") === 3L && col("b_p") =!= "p0").isEmpty,
        s"cellSize=$cellSize")
    }
  }
}
