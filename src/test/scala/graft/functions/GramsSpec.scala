package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native gram loops must be DROP-IN replacements for the
  * declarative HOF chains they displaced (same grams, same order,
  * same edge behavior) — the swap was purely about interpreted-lambda
  * cost, so any semantic drift here silently changes oracle-checked
  * queries.
  */
class GramsSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox",
    "aaaa",                       // overlapping repeats collapse
    "ab",                         // below gram size → empty
    "",                           // empty string
    "Mixed CASE and punct-uation, too!",
    "ünïcødé tæxt größe",         // non-ASCII code points
    "a b c d e f g h")

  test("char_grams equals array_distinct(transform(sequence)) chain") {
    val df = texts.zipWithIndex.map(_.swap).toDF("id", "t")
      .select(col("id"), lower(col("t")).as("t"))
    val got = df.select(col("id"),
        CharGrams.charGrams(spark, col("t"), 3).as("g"))
      .collect().map(r => r.getInt(0) ->
        r.getSeq[String](1).toList).toMap
    val want = df
      .select(col("id"), when(length(col("t")) >= 3,
        array_distinct(transform(sequence(lit(1), length(col("t")) - 2),
          i => col("t").substr(i, lit(3)))))
        .otherwise(array().cast("array<string>")).as("g"))
      .collect().map(r => r.getInt(0) ->
        r.getSeq[String](1).toList).toMap
    assert(got === want)
  }

  test("word_grams(distinct) equals the tokenize+slice+array_join chain") {
    for (n <- Seq(2, 8)) {
      val df = texts.zipWithIndex.map(_.swap).toDF("id", "t")
      val got = df.select(col("id"),
          WordGrams.wordGrams(spark, col("t"), n, distinct = true).as("g"))
        .collect().map(r => r.getInt(0) ->
          r.getSeq[String](1).toList).toMap
      val toks = graft.ingest.Transforms.tokens(col("t"))
      val want = df
        .select(col("id"), when(size(toks) >= n,
          array_distinct(transform(sequence(lit(0), size(toks) - n),
            j => array_join(slice(toks, j + 1, lit(n)), " "))))
          .otherwise(array().cast("array<string>")).as("g"))
        .collect().map(r => r.getInt(0) ->
          r.getSeq[String](1).toList).toMap
      assert(got === want, s"n=$n")
    }
  }

  test("SQL registry tolerates non-INT integral literals (BIGINT cast)") {
    CharGrams.register(spark)
    WordGrams.register(spark)
    // eval() of CAST(3 AS BIGINT) is a java.lang.Long — the registry
    // lambda must go through Number.intValue, not asInstanceOf[Int]
    val c = spark.sql(
      "SELECT char_grams('abcd', CAST(3 AS BIGINT)) AS g")
      .head.getSeq[String](0).toList
    assert(c === List("abc", "bcd"))
    val w = spark.sql(
      "SELECT word_grams('a b c', CAST(2 AS BIGINT), true) AS g")
      .head.getSeq[String](0).toList
    assert(w === List("a b", "b c"))
  }

  test("word_grams keeps every occurrence when distinct=false") {
    val df = Seq((0, "a b a b a")).toDF("id", "t")
    val got = df.select(
        WordGrams.wordGrams(spark, col("t"), 2, distinct = false).as("g"))
      .head.getSeq[String](0).toList
    assert(got === List("a b", "b a", "a b", "b a"))
  }

  test("kernel codegen survives a NON-nullable child (no janino fallback)") {
    // with a non-nullable child, ev.isNull folds to the literal
    // `false` — the old generated `false = true;` failed janino and
    // every row of the stage silently paid the interpreted fallback;
    // fallback=false makes any such compile failure fatal again
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = spark.range(4)
        .select(concat(lit("word"), col("id").cast("string")).as("t"))
      assert(!df.schema("t").nullable, "probe needs a non-nullable child")
      val grams = df
        .select(CharGrams.charGrams(spark, col("t"), 3).as("g"))
        .selectExpr("size(g)").collect().map(_.getInt(0)).toSeq
      assert(grams === Seq(3, 3, 3, 3))
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
