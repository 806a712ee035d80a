package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (rolling-hash fingerprinting per
  * Schleimer et al., SIGMOD'03 — the "document fingerprinting" op of
  * the training-data pipeline): normalize text → char k-gram hashes →
  * sliding-window minima (window w) → distinct set → digest.
  * Documents sharing long substrings share window minima, so digest
  * overlap ≈ content overlap — robust to small edits where exact
  * hashing breaks.
  *
  * Semantics mirror the DuckDB-oracle SQL exactly: gram hash = first 8
  * hex chars of md5(gram); per-window lexicographic min; distinct,
  * ascending sort, comma-join, md5. Native loop for the same reason as
  * [[MinHashSig]]: hundreds of hashes per row is interpreter-hostile.
  */
case class WinnowFp(child: Expression, k: Int = 8, w: Int = 16)
    extends UnaryExpression with KernelCodegen {

  override protected def kernelJavaType: String =
    "org.apache.spark.unsafe.types.UTF8String"

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fp"

  @transient private lazy val nonWord = java.util.regex.Pattern.compile("\\W+")
  @transient private lazy val md = MessageDigest.getInstance("MD5")
  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(s: String, outLen: Int): String = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](outLen)
    var i = 0
    while (i < outLen) {
      val b = d(i / 2)
      out(i) = hexDigits(if (i % 2 == 0) (b >> 4) & 0xf else b & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val norm = nonWord.matcher(
      input.asInstanceOf[UTF8String].toString.toLowerCase(java.util.Locale.ROOT))
      .replaceAll(" ").trim
    val n = norm.length
    if (n < k) return null
    val nGrams = n - k + 1
    val grams = new Array[String](nGrams)
    var i = 0
    while (i < nGrams) {
      grams(i) = md5Hex(norm.substring(i, i + k), 8)
      i += 1
    }
    val nWindows = math.max(nGrams - w + 1, 1)
    val picked = new java.util.TreeSet[String]()
    var j = 0
    while (j < nWindows) {
      var min = grams(j)
      var t = j + 1
      val end = math.min(j + w, nGrams)
      while (t < end) {
        if (grams(t).compareTo(min) < 0) min = grams(t)
        t += 1
      }
      picked.add(min)
      j += 1
    }
    val sb = new java.lang.StringBuilder()
    val it = picked.iterator()
    while (it.hasNext) {
      if (sb.length > 0) sb.append(',')
      sb.append(it.next())
    }
    UTF8String.fromString(md5Hex(sb.toString, 32))
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFp =
    copy(child = newChild)
}

object WinnowFp {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fp", exprs => WinnowFp(exprs.head), "scala_udf")

  def winnowFp(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function("winnow_fp", c)
  }
}
