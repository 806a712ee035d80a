package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Misra-Gries sketch: the candidate set must contain every item
  * above the N/(k+1) guarantee threshold under ANY partitioning (the
  * merge path is exercised adversarially), and the thresholded
  * exact-verified result must equal a brute-force groupBy.
  */
class MgSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish skew: item i appears ~1000/i times, plus a uniform tail
  private val corpus: Seq[String] =
    (1 to 20).flatMap(i => Seq.fill(1000 / i)(s"hot_$i")) ++
      (0 until 2000).map(i => s"tail_${i % 500}")

  private def exact: Map[String, Long] =
    corpus.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("guarantee: items above N/(k+1) are always candidates, any partitioning") {
    val n = corpus.size.toLong
    for (k <- Seq(8, 32); parts <- Seq(1, 3, 32)) {
      val df = corpus.toDF("term").repartition(parts)
      val cands = df.agg(MgCounters.mgCounters(spark, col("term"), k))
        .head.getSeq[String](0).toSet
      assert(cands.size <= k, s"k=$k parts=$parts: ${cands.size} > $k")
      val mustHave = exact.filter(_._2 > n / (k + 1)).keySet
      assert(mustHave.subsetOf(cands),
        s"k=$k parts=$parts missing: ${mustHave -- cands}")
    }
  }

  test("thresholded exact verification equals brute force on every shape") {
    val n = corpus.size.toLong
    val k = 16
    val brute = exact.filter(_._2 > n / (k + 1))
    for (parts <- Seq(1, 4, 32)) {
      val df = corpus.toDF("term").repartition(parts)
      val cands = df.agg(MgCounters.mgCounters(spark, col("term"), k))
        .head.getSeq[String](0)
      val got = df.join(broadcast(cands.toDF("term")), Seq("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > n / (k + 1))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === brute, s"parts=$parts")
    }
  }

  test("a >64KB token survives the partial-aggregate serialization") {
    // writeUTF would throw UTFDataFormatException past 65535 bytes;
    // the length-prefixed raw-UTF-8 state format must not care
    val big = "x" * 70000
    val df = (Seq.fill(5)(big) ++ Seq("small")).toDF("term")
      .repartition(3) // force serialize/merge across partials
    val cands = df.agg(MgCounters.mgCounters(spark, col("term"), 4))
      .head.getSeq[String](0)
    assert(cands.contains(big))
  }

  test("fewer than k distinct items: sketch is exact") {
    val df = Seq("a", "a", "b", "c", "c", "c").toDF("term")
    val cands = df.agg(MgCounters.mgCounters(spark, col("term"), 8))
      .head.getSeq[String](0)
    assert(cands.sorted === Seq("a", "b", "c"))
  }
}
