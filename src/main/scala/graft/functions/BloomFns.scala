package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.{call_function, lit}

/** Column builders for Spark's built-in bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the codegen'd
  * machinery behind Spark's own runtime shuffle filters, SPARK-32268).
  * Spark registers neither in the public function registry, so this
  * exposes them through the session registry the same way the native
  * graft expressions (minhash_sig & co.) are exposed.
  *
  * The aggregate is a MERGEABLE bounded sketch: each partition fills
  * its own bits from `xxhash64(key)` values, merge is a bitwise OR,
  * and only `numBits/8` bytes cross the exchange — the right shape for
  * building a membership filter over billions of seen keys. Probing is
  * a per-row bit test against the broadcast filter: no false
  * negatives, tunable false-positive rate (~1% at 10 bits/item).
  */
object BloomFns {

  def register(spark: SparkSession): Unit = {
    // idempotent and cheap on the hot path: skip the registry
    // mutation once the session already has both functions
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_bloom_agg"))) {
      reg.createOrReplaceTempFunction(
        "graft_bloom_agg",
        exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
        "scala_udf")
      reg.createOrReplaceTempFunction(
        "graft_might_contain",
        exprs => BloomFilterMightContain(exprs(0), exprs(1)),
        "scala_udf")
    }
  }

  /** Aggregate a bloom filter over `hashed` (must be an xxhash64-style
    * long column): binary filter blob sized `numBits`.
    */
  def bloomAgg(
      spark: SparkSession, hashed: Column,
      expectedItems: Long, numBits: Long): Column = {
    register(spark)
    call_function("graft_bloom_agg", hashed, lit(expectedItems), lit(numBits))
  }

  /** Per-row membership probe of `hashed` against a bloom blob. */
  def mightContain(spark: SparkSession, bloom: Column, hashed: Column): Column = {
    register(spark)
    call_function("graft_might_contain", bloom, hashed)
  }
}
