package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.TableStore

/** Streaming token-budget admission: cross-batch budgets enforce per
  * source, a full source stops admitting while others continue,
  * redelivered batches change nothing, and the admitted set matches
  * the batch recipe's greedy semantics on the same arrivals.
  */
class StreamTokenBudgetSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): TableStore = new TableStore(spark,
    java.nio.file.Files.createTempDirectory("graft-stb").toString)

  private def admitted(store: TableStore): Map[Long, (String, Long)] =
    store.read(StreamTokenBudget.admittedName("docs"))
      .select(col("id").cast("long"), col("source"), col("n_tokens"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap

  test("per-source budgets fill across batches; full sources stop; redelivery is silent") {
    val store = freshStore()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stb-ck").toString
    // budget 5 tokens per source
    val q = StreamTokenBudget.writeBudgeted(
      mem.toDF().toDF("id", "source", "text"), store, "docs",
      "id", "source", "text", budget = 5L, checkpoint = ckpt)
    try {
      // batch 1: a fills 3 of 5; b fills 4 of 5
      mem.addData((1L, "a", "one two three"), (2L, "b", "w x y z"))
      q.processAllAvailable()
      assert(admitted(store).keySet === Set(1L, 2L))

      // batch 2: a's 2-token doc fits exactly (3+2=5); b's 2-token doc
      // would overflow (4+2=6) and is dropped; a NEW source admits
      mem.addData((3L, "a", "four five"), (4L, "b", "p q"),
        (5L, "c", "hello"))
      q.processAllAvailable()
      assert(admitted(store).keySet === Set(1L, 2L, 3L, 5L),
        s"got ${admitted(store)}")

      // batch 3: a is exactly full and b has 1 left — both docs
      // overflow, nothing admits, but the watermark still advances
      // (the state swap is the commit point)
      mem.addData((6L, "a", "more"), (7L, "b", "two words"))
      q.processAllAvailable()
      assert(admitted(store).keySet === Set(1L, 2L, 3L, 5L))

      // totals are exact
      val used = StreamTokenBudget.usedTotals(store, "docs")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(used === Map("a" -> 5L, "b" -> 4L, "c" -> 1L))

      // redelivery: replaying an already-merged batch must not
      // double-count (the run/batch watermark rides the state table)
      val before = used
      mem.addData((3L, "a", "four five"))
      q.processAllAvailable()
      // doc 3 is already admitted (insert-ignore) and a is full — no
      // new rows, and CRUCIALLY no token double-count
      assert(StreamTokenBudget.usedTotals(store, "docs")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        .getOrElse("a", 0L) === before("a"))
      assert(q.exception.isEmpty)
    } finally q.stop()
  }

  test("a source that overflows mid-stream stays closed — admission is trigger-cadence-invariant") {
    val store = freshStore()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stb-ck").toString
    val q = StreamTokenBudget.writeBudgeted(
      mem.toDF().toDF("id", "source", "text"), store, "docs",
      "id", "source", "text", budget = 5L, checkpoint = ckpt)
    try {
      // batch 1: 3 of 5 used
      mem.addData((1L, "s", "one two three"))
      q.processAllAvailable()
      assert(admitted(store).keySet === Set(1L))
      // batch 2: a 4-token doc overflows (3+4=7) — the source is now
      // CLOSED, not merely blocked for this batch
      mem.addData((2L, "s", "a b c d"))
      q.processAllAvailable()
      assert(admitted(store).keySet === Set(1L))
      // batch 3: a 2-token doc would fit the ADMITTED total (3+2=5);
      // gating on admitted tokens would re-open the source here and
      // make the corpus depend on where triggers cut the stream. The
      // batch recipe's monotone prefix stopped at doc 2 — so must we.
      mem.addData((3L, "s", "x y"))
      q.processAllAvailable()
      assert(admitted(store).keySet === Set(1L),
        "a closed source re-admitted after its overflow — admission " +
          "depends on micro-batch boundaries")
      // reporting surface: used = admitted tokens only; the persisted
      // gate carries every arrival
      assert(StreamTokenBudget.usedTotals(store, "docs")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        === Map("s" -> 3L))
      assert(store.read(StreamTokenBudget.stateName("docs"))
        .filter(col("source") === "s")
        .head.getAs[Long]("seen") === 9L)
      assert(q.exception.isEmpty)
    } finally q.stop()
  }

  test("within one batch the admission order is the batch recipe's (hash-shuffled)") {
    val store = freshStore()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stb-ck").toString
    // budget 3: only some of the four 2-token docs fit — which ones is
    // decided by the deterministic hash order, not arrival order
    val q = StreamTokenBudget.writeBudgeted(
      mem.toDF().toDF("id", "source", "text"), store, "docs",
      "id", "source", "text", budget = 3L, checkpoint = ckpt)
    try {
      val docs = (1L to 4L).map(i => (i, "s", "two words"))
      mem.addData(docs: _*)
      q.processAllAvailable()
      // model: order by (hashBucket(id), id), admit while cum <= 3
      val order = docs.map(_._1).sortBy { i =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(i.toString.getBytes("UTF-8"))
        ((h(0) & 0xff), i)
      }
      val expect = order.take(1).toSet // 2 tokens each: only one fits 3
      assert(admitted(store).keySet === expect,
        s"admission did not follow the deterministic order $order")
      assert(q.exception.isEmpty)
    } finally q.stop()
  }
}
