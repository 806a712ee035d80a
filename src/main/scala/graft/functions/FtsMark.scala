package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{array, call_function, lit}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FTS5 auxiliary-function analogs `highlight()` / `snippet()`
  * (fts5_aux.c; the reference's FTS5 tables at
  * /root/reference/utils.py:330-332,352 expose both to Datasette's
  * search UI). Both wrap matched phrase instances of the ORIGINAL
  * text (case preserved) in open/close markers; snippet additionally
  * trims to the best window of ≤ nTok tokens.
  *
  * Matching semantics mirror the engine's tokenizer exactly: tokens
  * are the `\w+` runs of the text (the complement of the `\W+` split
  * used everywhere else), matched case-insensitively. A term is a
  * space-joined phrase of query tokens; a trailing `*` on a word
  * makes it a prefix match (FTS5 prefix tokens). Overlapping phrase
  * instances merge into one marked region (FTS5 coalesces overlapping
  * ranges the same way). Documented simplifications vs fts5_aux.c:
  * NEAR operands highlight wherever they occur in a matched row (not
  * only within qualifying spans), and the snippet window maximizes
  * (phrase instances, matched tokens, earliest) rather than FTS5's
  * internal weighting.
  */
private[graft] object FtsMarkCore {

  private val word = Pattern.compile("\\w+")

  /** (start, end, lowered) for each token of the original text. */
  def tokens(text: String): Array[(Int, Int, String)] = {
    val m = word.matcher(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
    while (m.find()) out += ((m.start, m.end,
      text.substring(m.start, m.end).toLowerCase(java.util.Locale.ROOT)))
    out.toArray
  }

  private def wordMatches(w: String, tokLower: String): Boolean =
    if (w.endsWith("*")) tokLower.startsWith(w.dropRight(1))
    else tokLower == w

  /** Merged, sorted inclusive token-index spans of every phrase
    * instance.
    */
  def matchedSpans(
      toks: Array[(Int, Int, String)],
      terms: Seq[String]): Array[(Int, Int)] = {
    val phrases = terms.filter(_.nonEmpty).map(_.split(" ").filter(_.nonEmpty))
      .filter(_.nonEmpty)
    val raw = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    phrases.foreach { ph =>
      var i = 0
      while (i + ph.length <= toks.length) {
        var k = 0
        while (k < ph.length && wordMatches(ph(k), toks(i + k)._3)) k += 1
        if (k == ph.length) raw += ((i, i + ph.length - 1))
        i += 1
      }
    }
    val sorted = raw.sortBy(s => (s._1, s._2))
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    sorted.foreach { s =>
      if (merged.nonEmpty && s._1 <= merged.last._2)
        merged(merged.length - 1) =
          (merged.last._1, math.max(merged.last._2, s._2))
      else merged += s
    }
    merged.toArray
  }

  /** Text characters [charFrom, charTo) with every span intersecting
    * tokens [from, to] (clipped) wrapped in open/close.
    */
  def render(
      text: String, toks: Array[(Int, Int, String)],
      spans: Array[(Int, Int)], open: String, close: String,
      from: Int, to: Int, charFrom: Int, charTo: Int): String = {
    val sb = new java.lang.StringBuilder()
    var pos = charFrom
    spans.foreach { case (s0, e0) =>
      val s = math.max(s0, from); val e = math.min(e0, to)
      if (s <= e) {
        sb.append(text, pos, toks(s)._1).append(open)
          .append(text, toks(s)._1, toks(e)._2).append(close)
        pos = toks(e)._2
      }
    }
    sb.append(text, pos, charTo)
    sb.toString
  }

  def highlight(
      text: String, terms: Seq[String], open: String, close: String): String = {
    val toks = tokens(text)
    if (toks.isEmpty) return text
    render(text, toks, matchedSpans(toks, terms), open, close,
      0, toks.length - 1, 0, text.length)
  }

  def snippet(
      text: String, terms: Seq[String], open: String, close: String,
      ellipsis: String, nTok: Int): String = {
    val toks = tokens(text)
    if (toks.isEmpty) return text
    val spans = matchedSpans(toks, terms)
    val w = math.min(math.max(nTok, 1), toks.length)
    // best window: most phrase instances fully inside, then most
    // matched tokens, then earliest
    var best = 0; var bestKey = (-1, -1)
    var i = 0
    while (i + w <= toks.length) {
      val inst = spans.count(s => s._1 >= i && s._2 <= i + w - 1)
      val toksIn = spans.map(s =>
        math.max(0, math.min(s._2, i + w - 1) - math.max(s._1, i) + 1)).sum
      if (inst > bestKey._1 || (inst == bestKey._1 && toksIn > bestKey._2)) {
        best = i; bestKey = (inst, toksIn)
      }
      i += 1
    }
    val from = best; val to = best + w - 1
    // full-text edges keep surrounding punctuation; trimmed edges cut
    // exactly at the window's token bounds and mark the cut
    val lead = if (from > 0) ellipsis else ""
    val tail = if (to < toks.length - 1) ellipsis else ""
    val charFrom = if (from == 0) 0 else toks(from)._1
    val charTo = if (to == toks.length - 1) text.length else toks(to)._2
    lead + render(text, toks, spans, open, close, from, to,
      charFrom, charTo) + tail
  }
}

/** `fts_highlight(text, terms, open, close)` — see [[FtsMarkCore]].
  * Compiled via [[NaryKernelCodegen]] (the last kernel family the
  * round-8 codegen sweep left interpreted): the highlight projection
  * stays inside the surrounding WholeStageCodegen span, which matters
  * because a ranked-search page at corpus scale highlights millions
  * of matched rows, not the handful a test store holds.
  */
case class FtsHighlight(
    text: Expression, terms: Expression, open: Expression, close: Expression)
    extends Expression with NaryKernelCodegen {

  override def children: Seq[Expression] = Seq(text, terms, open, close)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "fts_highlight"

  override def kernel(a: Array[Any]): Any = {
    if (a(0) == null || a(1) == null) return null
    UTF8String.fromString(FtsMarkCore.highlight(
      a(0).asInstanceOf[UTF8String].toString, FtsMark.termStrings(a(1)),
      FtsMark.strOrEmpty(a(2)), FtsMark.strOrEmpty(a(3))))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(text = newChildren(0), terms = newChildren(1),
      open = newChildren(2), close = newChildren(3))
}

/** `fts_snippet(text, terms, open, close, ellipsis, ntok)` — see
  * [[FtsMarkCore]] and the codegen note on [[FtsHighlight]]. A null
  * `ntok` yields a null snippet (both paths share the one kernel).
  */
case class FtsSnippet(
    text: Expression, terms: Expression, open: Expression,
    close: Expression, ellipsis: Expression, nTok: Expression)
    extends Expression with NaryKernelCodegen {

  override def children: Seq[Expression] =
    Seq(text, terms, open, close, ellipsis, nTok)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "fts_snippet"

  override def kernel(a: Array[Any]): Any = {
    if (a(0) == null || a(1) == null || a(5) == null) return null
    UTF8String.fromString(FtsMarkCore.snippet(
      a(0).asInstanceOf[UTF8String].toString, FtsMark.termStrings(a(1)),
      FtsMark.strOrEmpty(a(2)), FtsMark.strOrEmpty(a(3)),
      FtsMark.strOrEmpty(a(4)), a(5).asInstanceOf[Number].intValue))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(text = newChildren(0), terms = newChildren(1),
      open = newChildren(2), close = newChildren(3),
      ellipsis = newChildren(4), nTok = newChildren(5))
}

object FtsMark {

  private[functions] def strOrEmpty(v: Any): String =
    if (v == null) "" else v.asInstanceOf[UTF8String].toString

  private[functions] def termStrings(arr: Any): Seq[String] = {
    val a = arr.asInstanceOf[ArrayData]
    (0 until a.numElements()).map { i =>
      if (a.isNullAt(i)) "" else a.getUTF8String(i).toString
    }
  }

  /** Register both functions for the session. Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fts_highlight",
      exprs => FtsHighlight(exprs(0), exprs(1), exprs(2), exprs(3)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fts_snippet",
      exprs => FtsSnippet(exprs(0), exprs(1), exprs(2), exprs(3),
        exprs(4), exprs(5)),
      "scala_udf")
  }

  def ftsHighlight(
      spark: SparkSession, text: Column, terms: Seq[String],
      open: String = "[", close: String = "]"): Column = {
    register(spark)
    call_function("fts_highlight", text,
      array(terms.map(lit): _*), lit(open), lit(close))
  }

  def ftsSnippet(
      spark: SparkSession, text: Column, terms: Seq[String],
      open: String = "[", close: String = "]",
      ellipsis: String = "…", nTok: Int = 10): Column = {
    register(spark)
    call_function("fts_snippet", text,
      array(terms.map(lit): _*), lit(open), lit(close), lit(ellipsis),
      lit(nTok))
  }
}
