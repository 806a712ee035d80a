package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-grams: tokenize (lower / `\W+` split / drop empties
  * — [[graft.ingest.Transforms.tokens]]' semantics, the same
  * tokenizer [[TrigramStats]] loops with) and emit space-joined
  * n-grams in one pass — replacing the
  * `transform(sequence(...), j => array_join(slice(toks, j+1, n)))`
  * chain whose higher-order lambdas evaluate INTERPRETED per element
  * and re-slice the token array per position.
  *
  * `distinct = true` keeps first occurrences only (array_distinct
  * parity — the per-doc passage/contamination unit); `false` keeps
  * every occurrence (the type/token-ratio denominators). Fewer than
  * `n` tokens → empty array, matching the `size(toks) >= n` guards
  * upstream of the chains this replaces (callers may drop the guard:
  * explode of an empty array emits nothing).
  */
case class WordGrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with KernelCodegen {

  override protected def kernelJavaType: String =
    "org.apache.spark.sql.catalyst.util.ArrayData"

  require(n >= 1, s"gram size must be positive: $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_grams"

  @transient private lazy val splitter = Pattern.compile("\\W+")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
    val toks = splitter.split(text).filter(_.nonEmpty)
    val total = toks.length - n + 1
    if (total <= 0) return new GenericArrayData(Array.empty[Any])
    val sb = new java.lang.StringBuilder()
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String](total * 2)
      var j = 0
      while (j < total) {
        sb.setLength(0)
        var i = 0
        while (i < n) {
          if (i > 0) sb.append(' ')
          sb.append(toks(j + i))
          i += 1
        }
        seen.add(UTF8String.fromString(sb.toString))
        j += 1
      }
      new GenericArrayData(seen.toArray[AnyRef](Array.empty[AnyRef]))
    } else {
      val out = new Array[Any](total)
      var j = 0
      while (j < total) {
        sb.setLength(0)
        var i = 0
        while (i < n) {
          if (i > 0) sb.append(' ')
          sb.append(toks(j + i))
          i += 1
        }
        out(j) = UTF8String.fromString(sb.toString)
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
}

object WordGrams {
  /** Registry/extension builder (see CharGrams.builder). */
  val builder: Seq[Expression] => Expression = exprs => {
    val n = exprs(1).eval()
    require(n != null, "word_grams: n must be a non-null literal")
    WordGrams(exprs.head, n.asInstanceOf[Number].intValue,
      exprs(2).eval().asInstanceOf[Boolean])
  }

  def register(spark: SparkSession): Unit = {
    // idempotent on the hot path (the BloomFns guard pattern)
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("word_grams")))
      reg.createOrReplaceTempFunction("word_grams", builder, "scala_udf")
  }

  /** Word n-grams of raw text `c` (tokenization included). */
  def wordGrams(
      spark: SparkSession, c: Column, n: Int, distinct: Boolean): Column = {
    register(spark)
    call_function("word_grams", c, lit(n), lit(distinct))
  }
}
