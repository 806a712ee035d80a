package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (Rabin-style, per the LBFS/rsync family):
  * normalize text → Horner rolling hash over a sliding char window →
  * cut wherever the hash is ≡ 0 mod the divisor → md5 one fingerprint
  * per chunk. Because boundaries depend only on LOCAL window content,
  * inserting or deleting a prefix shifts every byte offset yet the
  * downstream chunks re-align — the property fixed-offset windows
  * (q_chunk_windows) and winnowing digests fundamentally lack, and the
  * reason CDC is the dedup workhorse for append/prepend-edited corpora.
  *
  * Semantics mirror the DuckDB-oracle SQL exactly: window fold
  * h = (h*31 + code) mod 1e9+7 over the trailing `w` chars, boundary
  * at 1-based end position i when h mod 64 = 0, spans split on the
  * cuts, final chunk takes the remainder; a document shorter than the
  * window is one chunk. The oracle folds each window outright
  * (O(n·w)); this native pass rolls the same polynomial in O(n) —
  * identical values mod M regardless of where the mod is applied.
  *
  * Returns array<struct<clen, fp>> — chunk char length + md5 of the
  * chunk text; null for an empty normalized document.
  */
case class CdcChunks(child: Expression, w: Int = 16)
    extends UnaryExpression with KernelCodegen {

  override protected def kernelJavaType: String =
    "org.apache.spark.sql.catalyst.util.ArrayData"

  private val B = 31L
  private val M = 1000000007L
  private val D = 64L

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("clen", LongType, nullable = false),
    StructField("fp", StringType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "cdc_chunks"

  @transient private lazy val nonWord = java.util.regex.Pattern.compile("\\W+")
  @transient private lazy val md = MessageDigest.getInstance("MD5")
  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 32) {
      val b = d(i / 2)
      out(i) = hexDigits(if (i % 2 == 0) (b >> 4) & 0xf else b & 0xf)
      i += 1
    }
    new String(out)
  }

  // B^(w-1) mod M, for evicting the window's oldest char while rolling
  private val bPow: Long = {
    var acc = 1L
    var i = 0
    while (i < w - 1) { acc = acc * B % M; i += 1 }
    acc
  }

  override def nullSafeEval(input: Any): Any = {
    // \W is ASCII-word in Java and RE2 alike, so norm is pure ASCII
    // and char == code point — the invariant the oracle's ord() relies on
    val norm = nonWord.matcher(
      input.asInstanceOf[UTF8String].toString.toLowerCase(java.util.Locale.ROOT))
      .replaceAll(" ").trim
    val n = norm.length
    if (n < 1) return null
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    if (n >= w) {
      var h = 0L
      var i = 0
      while (i < w) { h = (h * B + norm.charAt(i)) % M; i += 1 }
      if (h % D == 0L) cuts += w
      var end = w // 0-based index of the next char entering the window
      while (end < n) {
        h = ((h - norm.charAt(end - w) * bPow) % M + M) % M
        h = (h * B + norm.charAt(end)) % M
        end += 1
        if (h % D == 0L) cuts += end // 1-based window-end position
      }
    }
    val starts = 1 +: cuts.map(_ + 1)
    val ends = cuts :+ n
    val out = starts.indices.collect {
      case k if ends(k) >= starts(k) =>
        val chunk = norm.substring(starts(k) - 1, ends(k))
        InternalRow(chunk.length.toLong, UTF8String.fromString(md5Hex(chunk)))
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cdc_chunks", exprs => CdcChunks(exprs.head), "scala_udf")

  def cdcChunks(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function("cdc_chunks", c)
  }
}
