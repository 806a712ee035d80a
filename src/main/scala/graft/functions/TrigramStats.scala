package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native in-document repetition statistics (the Gopher duplicate
  * n-gram signal): per document, one tight loop computes tokenize →
  * word-3-gram count + distinct count → struct(n_trigrams,
  * dup_ratio = 1 - distinct/total).
  *
  * Semantics are IDENTICAL to the declarative formulation the DuckDB
  * oracle uses (lower / \W+ split / ' '-joined trigrams /
  * list_distinct — TextOps.repetitionSql), but the higher-order
  * transform-of-slices chain runs interpreted and measured ~4 s at
  * sf0.1 where this loop takes ~0.3 s. Same single-division double →
  * bit-exact parity. Null for documents with fewer than 3 tokens
  * (the WHERE len(sh) > 0 filter).
  */
case class TrigramStats(child: Expression)
    extends UnaryExpression with KernelCodegen {

  override protected def kernelJavaType: String =
    "org.apache.spark.sql.catalyst.InternalRow"

  override def dataType: DataType = StructType(Seq(
    StructField("n_trigrams", LongType, nullable = false),
    StructField("dup_ratio", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "trigram_stats"

  @transient private lazy val splitter = Pattern.compile("\\W+")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
    val toks = splitter.split(text).filter(_.nonEmpty)
    val total = toks.length - 2
    if (total <= 0) return null
    val seen = new java.util.HashSet[String](total * 2)
    val sb = new java.lang.StringBuilder()
    var j = 0
    var distinct = 0
    while (j < total) {
      sb.setLength(0)
      sb.append(toks(j)).append(' ').append(toks(j + 1))
        .append(' ').append(toks(j + 2))
      if (seen.add(sb.toString)) distinct += 1
      j += 1
    }
    InternalRow(total.toLong, 1.0 - distinct.toDouble / total.toDouble)
  }

  override protected def withNewChildInternal(newChild: Expression): TrigramStats =
    copy(child = newChild)
}

object TrigramStats {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "trigram_stats", exprs => TrigramStats(exprs.head), "scala_udf")

  def trigramStats(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function("trigram_stats", c)
  }
}
