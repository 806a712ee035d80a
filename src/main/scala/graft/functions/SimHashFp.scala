package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit SimHash fingerprint: per token, 60 bits derived from the
  * first 15 hex digits of md5(token); each bit votes ±1; fingerprint
  * sets the bits with positive vote. Near-duplicate documents land at
  * small Hamming distance, so 15-bit blocks of the fingerprint form an
  * exact-match index for Hamming-≤4 candidate retrieval (pigeonhole) —
  * the standard web-scale simhash dedup scheme.
  *
  * 60 bits (not 64) keeps the value in the positive BIGINT range of
  * both engines; bit j of token t = bit (3 - j%4) of hex digit j/4 of
  * md5(t) — exactly reproducible in the DuckDB oracle.
  */
case class SimHashFp(child: Expression, bits: Int = 60)
    extends UnaryExpression with KernelCodegen {

  override protected def kernelJavaType: String = "java.lang.Long"
  override protected def kernelUnbox(cast: String): String =
    s"$cast.longValue()"

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_fp"

  @transient private lazy val splitter = java.util.regex.Pattern.compile("\\W+")
  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
    val toks = splitter.split(text).filter(_.nonEmpty)
    if (toks.isEmpty) return null
    val votes = new Array[Int](bits)
    toks.foreach { t =>
      md.reset()
      val d = md.digest(t.getBytes("UTF-8"))
      var j = 0
      while (j < bits) {
        // hex digit j/4 of the digest; nibble-internal bit 3 - j%4
        val b = d(j / 8)
        val nibble = if ((j / 4) % 2 == 0) (b >> 4) & 0xf else b & 0xf
        val bit = (nibble >> (3 - j % 4)) & 1
        votes(j) += (bit * 2 - 1)
        j += 1
      }
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashFp =
    copy(child = newChild)
}

object SimHashFp {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_fp", exprs => SimHashFp(exprs.head), "scala_udf")

  def simhashFp(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function("simhash_fp", c)
  }
}
