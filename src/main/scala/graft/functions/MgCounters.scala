package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MERGEABLE heavy-hitters sketch: Misra-Gries frequent-items
  * counters (Misra & Gries 1982) with the mergeable-summaries
  * combine (Agarwal et al. 2012: sum counters, subtract the
  * (k+1)-largest, drop non-positive) — the aggregate-side sibling of
  * [[KmvMins]]. State is ≤ k (item, count) pairs per group; partial
  * aggregation runs map-side and only ≤ k pairs per group cross the
  * exchange, where an exact frequent-items groupBy would shuffle the
  * full item stream.
  *
  * GUARANTEE (what makes a nondeterministic-internals sketch
  * oracle-checkable): after any update/merge order, every item with
  * true count > N/(k+1) is present among the returned candidates.
  * The candidate LIST depends on partitioning; the THRESHOLDED
  * verification built on it does not — re-counting the candidates
  * exactly and keeping those above N/(k+1) yields exactly the items
  * an exact full groupBy would (queries/TextOps.heavyHitters), on
  * any cluster shape.
  *
  * Returns candidates sorted ascending (determinism of the ARRAY is
  * still partition-dependent through which sub-threshold stragglers
  * survive — consumers must re-verify, which is the sketch contract).
  */
case class MgCounters(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"k must be >= 1: $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_counters"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(
      buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(item)
      if (cur != null) buf.put(item, cur + 1L)
      else if (buf.size < k) buf.put(item, 1L)
      else decrementAll(buf) // classic MG: unseen item at capacity
    }
    buf
  }

  private def decrementAll(buf: java.util.HashMap[String, Long]): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
    }
  }

  override def merge(
      buf: java.util.HashMap[String, Long],
      other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count, drop non-positive — the
      // error-preserving mergeable combine
      val counts = new Array[Long](buf.size)
      var i = 0
      val vs = buf.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(buf.size - k - 1) // (k+1)-th largest
      val es = buf.entrySet().iterator()
      while (es.hasNext) {
        val e = es.next()
        if (e.getValue <= sub) es.remove() else e.setValue(e.getValue - sub)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val items = new Array[String](buf.size)
    var i = 0
    val ks = buf.keySet().iterator()
    while (ks.hasNext) { items(i) = ks.next(); i += 1 }
    java.util.Arrays.sort(items, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(items.map(UTF8String.fromString): Array[Any])
  }

  // length-prefixed raw UTF-8, not writeUTF: writeUTF throws on items
  // past 65535 modified-UTF-8 bytes, and a >64 KB unbroken token
  // (base64 blob, minified identifier) is ordinary input for the
  // corpora this pipeline targets — the sketch must survive anything
  // the exact groupBy it replaces would have
  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e.getValue)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.put(new String(kb, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgCounters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgCounters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MgCounters =
    copy(child = newChild)
}

object MgCounters {
  /** Registry/extension builder: optional literal k (default 64). */
  val builder: Seq[Expression] => Expression = exprs => {
    val k =
      if (exprs.length > 1) exprs(1).eval(null).asInstanceOf[Number].intValue
      else 64
    MgCounters(exprs.head, k)
  }

  def register(spark: SparkSession): Unit = {
    // idempotent on the hot path (the BloomFns guard pattern)
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("mg_counters")))
      reg.createOrReplaceTempFunction("mg_counters", builder, "scala_udf")
  }

  /** Misra-Gries candidate heavy hitters of a string column. */
  def mgCounters(spark: SparkSession, c: Column, k: Int): Column = {
    register(spark)
    call_function("mg_counters", c, lit(k))
  }
}
