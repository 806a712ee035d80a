package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native bounded-state aggregate: the VALUES carried by the k rows
  * with the smallest `(hash, tie)` key per group — a deterministic
  * bottom-k-by-hash uniform sample (the sampling sibling of
  * [[KmvMins]]: KMV keeps the hashes and estimates cardinality; this
  * keeps the PAYLOAD the hashes select and hands any rank statistic
  * a fixed-size uniform sample to run on).
  *
  * Why this shape at 100 TB: the classical exact-quantile plan sorts
  * every group (full shuffle + per-group sort of the corpus). Here
  * state is ≤ k `(hash, tie, value)` triples per group — partial
  * aggregation runs map-side, merge is a bounded ordered-set union,
  * only ≤ k triples per group cross the exchange, and the quantile
  * math happens on the k-element array after the aggregate. The
  * sample is a function of the DATA only (salted md5 of a unique row
  * key, `tie` breaking 48-bit collisions totally), so results are
  * identical on any partitioning, any cluster size — and in any
  * engine, which is what lets a DuckDB oracle replay it exactly
  * (row_number over the same (hash, tie) order).
  *
  * Reference analog: twitter-to-sqlite's progress estimates sample
  * the API's count fields (`/root/reference/cli.py:151-157`); at
  * warehouse scale the same "answer from a bounded sketch, not a
  * full pass" need covers rank statistics too.
  */
case class BottomKSample(
    first: Expression, second: Expression, third: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[(Long, Long), Long]]
  with TernaryLike[Expression] {

  require(k >= 1, s"k must be >= 1: $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k_sample"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = children.forall(_.dataType == LongType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (hash: bigint, tie: bigint, value: bigint), got " +
        children.map(_.dataType).mkString("(", ", ", ")"))
  }

  private implicit val keyOrder: Ordering[(Long, Long)] =
    Ordering.Tuple2(Ordering.Long, Ordering.Long)

  override def createAggregationBuffer(): java.util.TreeMap[(Long, Long), Long] =
    new java.util.TreeMap[(Long, Long), Long](keyOrder)

  private def add(
      buf: java.util.TreeMap[(Long, Long), Long],
      key: (Long, Long), v: Long): Unit = {
    // duplicate (hash, tie) keys collapse to the MINIMUM value:
    // callers pass a unique tie so this never fires for them, but a
    // general SQL caller might not, and last-write-wins would make
    // the surviving value depend on partition/merge encounter order —
    // min() keeps the aggregate a pure function of the input multiset
    // on any partitioning.
    if (buf.containsKey(key)) {
      if (v < buf.get(key)) { buf.put(key, v); () }
    } else if (buf.size < k) { buf.put(key, v); () }
    else if (keyOrder.lt(key, buf.lastKey)) {
      buf.put(key, v)
      if (buf.size > k) { buf.remove(buf.lastKey); () }
    }
  }

  override def update(
      buf: java.util.TreeMap[(Long, Long), Long],
      input: InternalRow): java.util.TreeMap[(Long, Long), Long] = {
    val h = first.eval(input)
    val t = second.eval(input)
    val v = third.eval(input)
    if (h != null && t != null && v != null)
      add(buf, (h.asInstanceOf[Long], t.asInstanceOf[Long]), v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeMap[(Long, Long), Long],
      other: java.util.TreeMap[(Long, Long), Long])
      : java.util.TreeMap[(Long, Long), Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); add(buf, e.getKey, e.getValue) }
    buf
  }

  /** Values in ascending (hash, tie) order — the sample, not yet
    * value-sorted (quantile math sorts the k-element array after the
    * aggregate, where it costs nothing).
    */
  override def eval(buf: java.util.TreeMap[(Long, Long), Long]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.values().iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeMap[(Long, Long), Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getKey._1); out.writeLong(e.getKey._2)
      out.writeLong(e.getValue)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[(Long, Long), Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      buf.put((in.readLong(), in.readLong()), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression)
      : BottomKSample =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BottomKSample {
  /** Registry/extension builder: optional literal k (default 64). The
    * fourth argument must be a foldable non-null integral literal — a
    * general SQL caller passing NULL, a column, or a string gets a
    * named AnalysisException, not a bare NPE/ClassCastException.
    */
  val builder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 3 || exprs.length == 4,
      s"bottom_k_sample expects (hash, tie, value[, k]); got ${exprs.length} arguments")
    def badK(invalid: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "INVALID_PARAMETER_VALUE.INTEGER",
        messageParameters = Map(
          "parameter" -> "`k`",
          "functionName" -> "`bottom_k_sample`",
          "invalidValue" -> invalid))
    val k =
      if (exprs.length > 3) {
        val e = exprs(3)
        if (!e.foldable) badK(e.sql)
        e.eval(null) match {
          case n: java.lang.Integer => n.intValue
          case n: java.lang.Long => n.intValue
          case n: java.lang.Short => n.intValue
          case n: java.lang.Byte => n.intValue
          case null => badK("NULL")
          case other => badK(s"$other (${e.dataType.simpleString})")
        }
      } else 64
    BottomKSample(exprs(0), exprs(1), exprs(2), k)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bottom_k_sample", builder, "scala_udf")

  /** Values of the k rows with smallest (hash, tie); all LongType. */
  def bottomK(
      spark: SparkSession, hash: Column, tie: Column, value: Column,
      k: Int): Column = {
    register(spark)
    call_function("bottom_k_sample", hash, tie, value, lit(k))
  }
}
