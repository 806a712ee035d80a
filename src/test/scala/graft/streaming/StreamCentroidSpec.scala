package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.TableStore

/** The streaming centroid classifier's core claim is EXACTNESS, not
  * approximation: class sums merge by addition, so N micro-batches
  * must produce the byte-identical model (and therefore identical
  * predictions) as one batch over the union — plus the sketch-sink
  * redelivery discipline (non-idempotent sums behind a (run_id,
  * batch_id) watermark riding the model's own atomic swap).
  */
class StreamCentroidSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): TableStore =
    new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-cent").toString)

  // deterministic corpus: ids 0-19 long docs (pass the length gate),
  // 20-29 short docs; token distributions differ by class
  private def doc(i: Int): (Long, String) =
    if (i < 20)
      (i.toLong, (0 until 60).map(j => s"alpha${(i + j) % 7} beta${j % 5}")
        .mkString(" ") + " the of and that")
    else (i.toLong, s"tiny${i} snippet")

  private val all: Seq[(Long, String)] = (0 until 30).map(doc)

  private def modelRows(store: TableStore, table: String): Set[(Int, Long, Long)] =
    store.read(StreamCentroid.modelName(table))
      .select(col("bucket"), col("sp"), col("sn"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet

  private def preds(store: TableStore, table: String,
      docs: DataFrame): Set[(Long, Int)] =
    StreamCentroid.classify(store, table, docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

  test("N micro-batches build the EXACT model one batch would; classify separates classes") {
    val streamed = freshStore()
    val oneShot = freshStore()
    val sinkS = StreamCentroid.centroidSink(streamed, "docs", "text", runId = "r1")
    val sinkO = StreamCentroid.centroidSink(oneShot, "docs", "text", runId = "r1")

    // three uneven micro-batches vs one shot over the union
    sinkS(all.take(7).toDF("id", "text"), 0L)
    sinkS(all.slice(7, 23).toDF("id", "text"), 1L)
    sinkS(all.drop(23).toDF("id", "text"), 2L)
    sinkO(all.toDF("id", "text"), 0L)
    assert(modelRows(streamed, "docs") === modelRows(oneShot, "docs"),
      "streamed merge diverged from the one-shot model — sums are not exact")

    // identical predictions from both, and the model actually works:
    // long docs classify +1, short docs −1 (the weak label it trained on)
    val df = all.toDF("id", "text")
    val p = preds(streamed, "docs", df)
    assert(p === preds(oneShot, "docs", df))
    val acc = p.count { case (id, pr) => (id < 20) == (pr == 1) }.toDouble / 30
    assert(acc >= 0.9, s"model failed to separate the classes: acc=$acc")
  }

  test("redelivered batches are skipped; a new run lineage merges on top") {
    val store = freshStore()
    val sink = StreamCentroid.centroidSink(store, "docs", "text", runId = "r1")
    sink(all.take(10).toDF("id", "text"), 0L)
    val after0 = modelRows(store, "docs")
    // redelivery of batch 0 (crash between store write and checkpoint
    // advance): the watermark skips it — no double-count
    sink(all.take(10).toDF("id", "text"), 0L)
    assert(modelRows(store, "docs") === after0, "redelivered batch double-counted")
    // fresh checkpoint lineage: batch ids restart at 0 but the run id
    // differs, so the merge proceeds on top of the carried model
    val sink2 = StreamCentroid.centroidSink(store, "docs", "text", runId = "r2")
    sink2(all.slice(10, 20).toDF("id", "text"), 0L)
    assert(modelRows(store, "docs") !== after0, "new-run batch was wrongly skipped")
    assert(graft.store.Doctor.check(store) === Seq.empty)
  }

  test("doctor names seeded model corruption instead of crashing") {
    val store = freshStore()
    val sink = StreamCentroid.centroidSink(store, "docs", "text", runId = "r1")
    sink(all.toDF("id", "text"), 0L)
    assert(graft.store.Doctor.check(store) === Seq.empty)
    val name = StreamCentroid.modelName("docs")
    val good = store.read(name).collect()

    // negative sums + a duplicated doc-count row (torn merge)
    store.overwrite(name,
      store.read(name).unionByName(
        Seq((-1, -5L, 2L, "r1", 0L)).toDF("bucket", "sp", "sn", "run_id", "batch_id")))
    val found = graft.store.Doctor.check(store)
      .filter(_.component == "centroid-model").map(_.problem).mkString("; ")
    assert(found.contains("doc-count") && found.contains("negative"), found)

    // missing watermark columns
    store.overwrite(name,
      Seq((0, 1L, 1L), (-1, 2L, 3L)).toDF("bucket", "sp", "sn"))
    assert(graft.store.Doctor.check(store)
      .exists(_.problem.contains("batch_id")))

    // not centroid-shaped at all → a named Issue, not a crash
    store.overwrite(name, Seq((1, "x")).toDF("a", "b"))
    assert(graft.store.Doctor.check(store)
      .exists(_.problem.contains("not centroid-shaped")))
  }
}
