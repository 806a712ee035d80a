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
}
