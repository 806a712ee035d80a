package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom membership probe against a NON-CONSTANT blob column —
  * the expression Spark's own `BloomFilterMightContain` refuses to
  * be (it requires a foldable blob or a scalar subquery, i.e. ONE
  * filter embedded in the plan). This is the piece that lets
  * sharded skip-existing scale: the per-shard blobs stay a tiny
  * `(shard, blob)` TABLE, each batch row equi-joins to its shard's
  * row, and this probe tests the joined blob — blobs travel as
  * shuffle/broadcast DATA (each task sees only its shards' blobs),
  * never as plan literals serialized with every task.
  *
  * Deserialization discipline: `BloomFilter.readFrom` per ROW would
  * dominate the probe, and the per-row blob bytes are fresh copies
  * (unsafe-row reads), so identity caching can't work. The JOIN
  * OUTPUT carries the answer: `key` (the shard id) functionally
  * determines the blob within a build, so the filter is cached per
  * key — each task deserializes each shard blob it sees ONCE, then
  * probes at in-memory BitArray speed. CALLER CONTRACT: within one
  * plan, equal keys must map to byte-identical blobs (true by
  * construction for a `groupBy(shard).agg(bloomAgg)` build; the
  * cache cannot detect a violated contract).
  *
  * Codegen: the generated Java calls this instance's own
  * [[probe]] through a plan reference (the KernelCodegen
  * discipline) — one direct call per row, the per-task filter
  * cache lives on the instance either way, and the surrounding
  * stage keeps its WholeStageCodegen span instead of breaking at
  * the probe.
  *
  * Reference analog: twitter-to-sqlite's `--skip-existing` ingest
  * (cli.py:483-487) at key spaces past one filter's caps.
  */
case class KeyedBloomMightContain(
    first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "keyed_might_contain"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = first.dataType == LongType &&
      second.dataType == BinaryType && third.dataType == LongType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (key: bigint, blob: binary, hash: bigint), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }

  // Per-task instance (tasks deserialize their own expression copy),
  // LRU-bounded as a memory safety valve. The bound never bites in a
  // sane plan: under a shuffle join each task sees only its own
  // shards' rows (cache ≈ shards / tasks entries), and the planner
  // only picks a broadcast join when the total blob table is small
  // (within the broadcast threshold), so even caching every shard it
  // streams stays bounded by that same small total. Only a
  // pathological plan (huge blobs side force-broadcast) would evict —
  // degrading to re-deserialization, never to OOM.
  @transient private lazy val cache =
    new java.util.LinkedHashMap[java.lang.Long, BloomFilter](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[java.lang.Long, BloomFilter]): Boolean =
        size() > 64
    }

  /** Single row kernel — interpreted eval and generated code both
    * land here, so the compiled path cannot drift from the
    * interpreted one (the KernelCodegen guarantee).
    */
  final def probe(key: Long, blob: Array[Byte], hash: Long): Boolean = {
    val k = java.lang.Long.valueOf(key)
    var bf = cache.get(k)
    if (bf == null) {
      bf = BloomFilter.readFrom(new ByteArrayInputStream(blob))
      cache.put(k, bf)
    }
    bf.mightContainLong(hash)
  }

  override protected def nullSafeEval(key: Any, blob: Any, hash: Any): Any =
    probe(key.asInstanceOf[Long], blob.asInstanceOf[Array[Byte]],
      hash.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (k, b, h) => {
      val ref = ctx.addReferenceObj("keyedBloomExpr", this)
      s"${ev.value} = $ref.probe($k, $b, $h);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression)
      : KeyedBloomMightContain =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object KeyedBloom {
  def register(spark: SparkSession): Unit = {
    // idempotent on the hot path (the BloomFns guard pattern)
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("keyed_might_contain")))
      reg.createOrReplaceTempFunction(
        "keyed_might_contain",
        exprs => KeyedBloomMightContain(exprs(0), exprs(1), exprs(2)),
        "scala_udf")
  }

  /** Probe `hashed` (an xxhash64-style long) against the bloom blob
    * in `blob`, caching deserialization per distinct `key`.
    */
  def keyedMightContain(
      spark: SparkSession, key: Column, blob: Column, hashed: Column): Column = {
    register(spark)
    call_function("keyed_might_contain", key, blob, hashed)
  }
}
