package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Distributed BPE training (store/Bpe) against a single-threaded
  * reference implementation of the Sennrich et al. algorithm: same
  * word counting, same greedy left-to-right merge scan, same
  * (count desc, pair asc) tie-break. The merge LIST is the model, so
  * the two must agree exactly, rank by rank.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // --- reference implementation (driver-side, obviously-correct) ---

  private def refWordCounts(docs: Seq[String]): Map[String, Long] =
    docs.flatMap(_.toLowerCase.split("\\W+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def refMerge(s: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < s.length) {
      if (j < s.length - 1 && s(j) == a && s(j + 1) == b) { out += a + b; j += 2 }
      else { out += s(j); j += 1 }
    }
    out.result()
  }

  private def refBpe(wc: Map[String, Long], k: Int, minCount: Long)
      : Seq[(String, String, Long)] = {
    var syms = wc.toSeq.map { case (w, n) => (w.map(_.toString).toVector, n) }
    val out = Seq.newBuilder[(String, String, Long)]
    var i = 0
    var done = false
    while (i < k && !done) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((s, n) <- syms; j <- 0 until s.length - 1)
        counts.updateWith((s(j), s(j + 1)))(c => Some(c.getOrElse(0L) + n))
      val best = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some(((a, b), c)) if c >= minCount =>
          out += ((a, b, c))
          syms = syms.map { case (s, n) => (refMerge(s, a, b), n) }
          i += 1
        case _ => done = true
      }
    }
    out.result()
  }

  // --- the corpora ---

  private val corpus = Seq(
    "low low low lower lower lowest",
    "new newer newest newest widest wide",
    "slow slower slowest slowest lowly",
    "the lower the slower the newer")

  // overlapping-run + merged-symbol-reuse edges: aaa with pair (a,a)
  // must merge once per non-overlapping occurrence; banana exercises
  // (a,n) inside repeats
  private val edgeCorpus = Seq(
    "aaa aaaa aa aaa banana bananas banana anna",
    "aaa aa banana nana na")

  private def trainBoth(docs: Seq[String], k: Int, minCount: Long = 2L) = {
    val got = Bpe.train(docs.zipWithIndex.map(_.swap).toDF("id", "text"),
      "text", k, minCount).map(m => (m.a, m.b, m.count))
    val want = refBpe(refWordCounts(docs), k, minCount)
    (got, want)
  }

  test("merge list matches the reference algorithm, rank by rank") {
    val (got, want) = trainBoth(corpus, 12)
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("overlapping runs and merged-symbol reuse match the reference") {
    val (got, want) = trainBoth(edgeCorpus, 15, minCount = 1L)
    assert(got === want)
  }

  test("minCount stops training early") {
    val (got, want) = trainBoth(Seq("ab ab cd"), 10, minCount = 3L)
    assert(got === want)
    assert(got.size < 10)
  }

  test("applyMerges tokenizes with the learned vocabulary") {
    val merges = Bpe.train(corpus.zipWithIndex.map(_.swap).toDF("id", "text"),
      "text", 12)
    val toks = Seq("lowest", "slowest", "newer", "unseen")
      .toDF("w")
      .select(col("w"), Bpe.applyMerges(col("w"), merges).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector)
      .toMap
    // the reference encode: char split, merges in rank order
    val wantEnc = Seq("lowest", "slowest", "newer", "unseen").map { w =>
      var s = w.map(_.toString).toVector
      merges.sortBy(_.rank).foreach(m => s = refMerge(s, m.a, m.b))
      w -> s
    }.toMap
    assert(toks === wantEnc)
    // round-trip: concatenating tokens reconstructs the word
    toks.foreach { case (w, t) => assert(t.mkString === w) }
  }
}
