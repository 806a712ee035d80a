package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md scale notes; AQE's
  * skew-join handles moderate skew at runtime, but a pathologically
  * hot key — a celebrity user in `following`, a boilerplate band in
  * dedup — needs structural salting):
  *
  *  - the SKEWED (large) side gets a deterministic salt in
  *    [0, factor) derived from a stable hash of the whole row's other
  *    column, spreading one key over `factor` reducers;
  *  - the other side is REPLICATED `factor` times, once per salt
  *    value, so every (key, salt) partition can still join.
  *
  * Join on (key, salt). Equivalent results to the unsalted join, with
  * the hot key's work fanned out `factor`-ways.
  */
object Salting {

  val SaltCol = "__salt"

  /** Add a deterministic salt column to the skewed side. `entropy`
    * should be any column that varies within a key (an id, a payload
    * hash) so the salt distributes evenly and reproducibly.
    */
  def saltSkewed(df: DataFrame, entropy: Column, factor: Int): DataFrame =
    df.withColumn(SaltCol, pmod(xxhash64(entropy), lit(factor)))

  /** Replicate the build side once per salt value. */
  def replicateForSalt(df: DataFrame, factor: Int): DataFrame =
    df.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(factor.toLong - 1))))

  /** Salted equi-join: same rows as df1.join(df2, keys) with the
    * skewed side's hot keys spread over `factor` partitions.
    */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      keys: Seq[String],
      entropy: Column,
      factor: Int,
      joinType: String = "inner"): DataFrame =
    saltSkewed(skewed, entropy, factor)
      .join(replicateForSalt(other, factor), keys :+ SaltCol, joinType)
      .drop(SaltCol)
}
