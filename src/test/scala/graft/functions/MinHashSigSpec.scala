package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.Transforms

/** The native MinHashSig expression must be bit-identical to the
  * declarative higher-order-function formulation (which is also what
  * the DuckDB oracle SQL spells out): tokenize \W+ lower → distinct
  * word-3-gram shingles → md5 → four 8-hex min slices, concatenated.
  */
class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  test("native expression == declarative formulation on varied inputs") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c d e f g h i j k l",
      "one two three",          // exactly one shingle
      "one two",                // too short -> null
      "",                       // empty -> null
      "Repeat repeat REPEAT repeat words words words again again",
      "punctuation, splits; tokens! correctly? yes/no",
      "tabs\tand\nnewlines   and    runs of spaces",
      "numbers 123 and 456 mix with_underscores kept")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")

    val native = df.select(col("id"),
      MinHashSig.minhashSig(spark, col("text")).as("sig"))

    val decl = df
      .select(col("id"), Transforms.tokens(col("text")).as("toks"))
      .select(col("id"), Transforms.shingles(col("toks"), 3).as("shRaw"))
      .select(col("id"), array_distinct(col("shRaw")).as("sh"))
      .select(col("id"), size(col("sh")).as("n"),
        transform(col("sh"), s => md5(s)).as("hs"))
      .select(col("id"),
        when(col("n") > 0, concat(
          array_min(transform(col("hs"), h => substring(h, 1, 8))),
          array_min(transform(col("hs"), h => substring(h, 9, 8))),
          array_min(transform(col("hs"), h => substring(h, 17, 8))),
          array_min(transform(col("hs"), h => substring(h, 25, 8)))))
          .as("sig"))

    val n = native.orderBy("id").collect().map(_.getAs[String]("sig")).toSeq
    val d = decl.orderBy("id").collect().map(_.getAs[String]("sig")).toSeq
    assert(n === d)
    assert(n(3) == null && n(4) == null) // short/empty docs
    assert(n.head.length === 32)
  }

  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.types.StringType
  import org.apache.spark.unsafe.types.UTF8String

  private def rawSig(text: String, shingleSize: Int, nHashes: Int): String =
    MinHashSig(Literal(UTF8String.fromString(text), StringType),
      shingleSize, nHashes).eval(null) match {
      case null          => null
      case u: UTF8String => u.toString
    }

  test("wider signatures extend the 4-hash family (group 0 unsalted)") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val s4 = rawSig(text, 3, 4)
    val s16 = rawSig(text, 3, 16)
    assert(s4.length === 32 && s16.length === 128)
    assert(s16.take(32) === s4) // hashes 0-3 identical at any width
    // salted groups differ from the unsalted one (independent hashes)
    assert(s16.slice(32, 64) !== s4)
    // non-multiple-of-4 widths truncate the last group
    assert(rawSig(text, 3, 6).length === 48)
    intercept[IllegalArgumentException] {
      MinHashSig.bandKeys(col("x"), nHashes = 16, bands = 5)
    }
  }

  /** Band collision probability must follow the (r, b) S-curve
    * 1 − (1 − s^r)^b. With shingleSize=1 the shingle set IS the token
    * set, so pair Jaccard is exactly controllable: m shared + p
    * private tokens per side → s = m / (m + 2p). 300 deterministic
    * pairs per similarity level, 16 hashes in 4 bands of r=4.
    */
  test("band collision rate matches the (r,b) S-curve on synthetic pairs") {
    val nHashes = 16
    val bands = 4
    val r = nHashes / bands
    val width = 8 * r

    def collide(a: String, b: String): Boolean =
      (0 until bands).exists(i =>
        a.substring(i * width, (i + 1) * width) ==
          b.substring(i * width, (i + 1) * width))

    // (m shared, p private-per-side) → jaccard m/(m+2p)
    val levels = Seq((16, 2, 0.8), (10, 5, 0.5), (6, 7, 0.3))
    val nPairs = 300
    levels.foreach { case (m, p, s) =>
      val hits = (0 until nPairs).count { i =>
        val shared = (0 until m).map(j => s"p${i}c$j")
        val a = (shared ++ (0 until p).map(j => s"p${i}a$j")).mkString(" ")
        val b = (shared ++ (0 until p).map(j => s"p${i}b$j")).mkString(" ")
        collide(rawSig(a, 1, nHashes), rawSig(b, 1, nHashes))
      }
      val got = hits.toDouble / nPairs
      val want = 1.0 - math.pow(1.0 - math.pow(s, r), bands)
      val tol = 3.2 * math.sqrt(want * (1 - want) / nPairs) + 0.01
      assert(math.abs(got - want) < tol,
        s"s=$s: empirical $got vs S-curve $want (tol $tol)")
    }
  }
}
