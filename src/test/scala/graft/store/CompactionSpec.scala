package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TableStore.compact — the OPTIMIZE/bin-packing half of store
  * maintenance: fragmented tables (write parallelism × small batches)
  * rewrite to few files, preserving rows, Hive layout, and every
  * consumer's results; `sortBy` clusters rows within output files for
  * row-group pruning.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): TableStore =
    new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-compact").toString)

  test("flat table bin-packs to one file with identical rows") {
    val store = freshStore()
    val rows = (1L to 100L).map(i => (i, s"v$i"))
    store.overwrite("t", rows.toDF("id", "v").repartition(16))
    assert(store.fileStats("t")._1 > 4)
    assert(store.partitionColumnsOf("t") === Nil)

    val (before, after) = store.compact("t")
    assert(before > 4 && after === 1L)
    assert(store.read("t").as[(Long, String)].collect().sorted ===
      rows.sorted)
  }

  test("partitioned table keeps its layout; files collapse per partition") {
    val store = freshStore()
    val rows = (1L to 90L).map(i => (i, s"d${i % 3}", i * 7 % 100))
    store.overwrite("ev", rows.toDF("id", "day", "x").repartition(8),
      partitionBy = Seq("day"))
    assert(store.fileStats("ev")._1 > 3) // up to 8 per day dir

    val (_, after) = store.compact("ev")
    assert(store.partitionColumnsOf("ev") === Seq("day"))
    assert(after <= 3L) // ≤ one file per day partition
    assert(store.read("ev").select("id", "day", "x")
      .as[(Long, String, Long)].collect().sorted === rows.sorted)
  }

  test("sortBy clusters rows within each output file") {
    val store = freshStore()
    val rows = (1L to 200L).map(i => (i * 37 % 199, s"v$i"))
    store.overwrite("s", rows.toDF("id", "v").repartition(10))

    store.compact("s", sortBy = Seq("id"), targetBytes = 2048)
    // every physical file must be internally sorted by id — that is
    // what makes parquet row-group min/max stats selective
    val files = new java.io.File(
      new java.net.URI(store.read("s").inputFiles.head)).getParentFile
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val ids = spark.read.parquet(f.getPath)
        .select("id").as[Long].collect()
      assert(ids.toSeq === ids.sorted.toSeq, s"unsorted file ${f.getName}")
    }
  }

  test("compacting a bucketed FTS postings table changes no search result") {
    val store = freshStore()
    val docs = (1L to 40L).map(i =>
      (i, s"doc $i common${i % 5} token${i % 7} shared words here")).toSeq
    Fts.upsertWithIndex(store, "docs", docs.toDF("id", "text"),
      "id", "text", buckets = 4)
    val q = "shared AND common1"
    val beforeRows = Fts.search(spark, store, "docs", q)
      .orderBy("pk").collect().toSeq
    assert(beforeRows.nonEmpty)

    val idx = Fts.indexName("docs")
    assert(store.partitionColumnsOf(idx) === Seq("pk_bucket"))
    store.compact(idx, sortBy = Seq("token"))

    val afterRows = Fts.search(spark, store, "docs", q)
      .orderBy("pk").collect().toSeq
    assert(afterRows === beforeRows)
    assert(Doctor.check(store).isEmpty) // stats invariants survive
  }
}
