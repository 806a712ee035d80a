package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted joins must return exactly the unsalted join's rows while
  * spreading a hot key over `factor` salt partitions.
  */
class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted join == plain join; hot key spreads over salts") {
    // skewed fact: one hot key (1) with many rows, some cold keys
    val fact = ((1 to 500).map(i => (1L, i.toLong)) ++
      Seq((2L, 901L), (3L, 902L))).toDF("k", "payload")
    val dim = Seq((1L, "hot"), (2L, "cold2"), (4L, "unmatched"))
      .toDF("k", "label")

    val plain = fact.join(dim, Seq("k")).select("k", "payload", "label")
    val salted = Salting.saltedJoin(fact, dim, Seq("k"), col("payload"), 8)
      .select("k", "payload", "label")

    assert(salted.count() === plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)

    // the hot key's rows actually landed on multiple salts
    val saltSpread = Salting.saltSkewed(fact.filter(col("k") === 1), col("payload"), 8)
      .select(Salting.SaltCol).distinct().count()
    assert(saltSpread > 4)

    // left join keeps unmatched rows exactly once too
    val leftPlain = fact.join(dim, Seq("k"), "left").select("k", "payload", "label")
    val leftSalted = Salting
      .saltedJoin(fact, dim, Seq("k"), col("payload"), 8, "left")
      .select("k", "payload", "label")
    assert(leftSalted.count() === leftPlain.count())
    assert(leftSalted.except(leftPlain).isEmpty)
  }
}
