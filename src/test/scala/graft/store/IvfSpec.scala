package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persisted IVF index: trained centroids + cell-partitioned vectors.
  * Probing prunes the scan to nprobe cell directories, re-upserts
  * rewrite only touched cells (including the OLD cell of a vector
  * that moved), and search matches an inline recomputation over the
  * probed cells.
  */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8

  /** Two well-separated blobs (even ids ~ +axis, odd ids ~ -axis) so
    * 2 trained centroids land one per blob and assignment is stable.
    */
  private def corpus: DataFrame =
    (0 until 40).map { i =>
      val sign = if (i % 2 == 0) 1.0 else -1.0
      (i.toLong, (0 until dims).map(d =>
        sign * (10.0 + ((i * 7 + d) % 5) * 0.1)))
    }.toDF("vec_id", "e")

  private def freshStore(): (TableStore, String) = {
    val root = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    (new TableStore(spark, root), root)
  }

  test("probe prunes to nprobe cell partitions and matches inline rerank") {
    val (store, _) = freshStore()
    Ivf.buildIndex(store, "vectors", corpus, "vec_id", "e", k = 2, iters = 3)

    val queries = corpus.filter(col("vec_id") < 2)
    val got = Ivf.annTopK(store, "vectors", queries, "vec_id", "e",
      k = 3, nprobe = 1)
    val rows = got.collect()

    // with nprobe=1 and separated blobs, every result shares the
    // query's parity (same blob)
    rows.foreach { r =>
      assert(r.getLong(0) % 2 === r.getLong(2) % 2,
        s"candidate from the wrong blob: $r")
    }
    assert(rows.map(_.getLong(0)).distinct.sorted === Array(0L, 1L))
    assert(rows.count(_.getLong(0) == 0L) === 3)

    // the executed (adaptive) plan carries the cell predicate as a
    // PARTITION filter on the index scan, not a data filter
    val planStr = got.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") &&
      planStr.contains("cell"), planStr.take(2000))
    // and the exact scan shape annTopK builds — read + isin over the
    // partition column with long literals — prunes to one directory
    // for a single probed cell (filter-only plan, so the scan node is
    // directly inspectable)
    val cell0 = store.read(Ivf.mapName("vectors"))
      .filter(col("pk") === 0L).head.getLong(1)
    val cand = store.read(Ivf.indexName("vectors"))
      .filter(col("cell").isin(Seq(cell0): _*))
    val oneScan = cand.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(oneScan.metadata("PartitionFilters").contains("cell"))
    assert(oneScan.selectedPartitions.partitionCount === 1)

    // inline recomputation over the probed cells agrees exactly
    val cents = store.read(Ivf.centsName("vectors"))
    def dotC(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val assigned = corpus
      .withColumn("norm", sqrt(dotC(col("e"), col("e"))))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("e"), col("norm"), col("cent_id"),
        (dotC(col("e"), col("cent_e")) / (col("norm") * col("cent_norm"))).as("cs"))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("e"), col("norm"), col("cent_id").as("cell")),
        struct(col("cs"), (-col("cent_id")).as("nc"))).as("b"))
      .select(col("vec_id"), col("b.e").as("e"), col("b.norm").as("norm"),
        col("b.cell").as("cell"))
    val probes = assigned.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("e").as("qe"),
        col("norm").as("qnorm"), col("cell"))
    val inline = assigned.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        (dotC(col("qe"), col("e")) / (col("qnorm") * col("norm"))).as("cosine"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("cand_id"))).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("query_id"), col("rnk"), col("cand_id"), col("cosine"))
    assert(rows.toSet === inline.collect().toSet)
  }

  test("filtered search: parity predicate across the two blobs, probe-widening") {
    val (store, _) = freshStore()
    Ivf.buildIndex(store, "vectors", corpus, "vec_id", "e", k = 2, iters = 3)
    val queries = corpus.filter(col("vec_id") === 0) // even blob
    val allowed = corpus.filter(col("vec_id") % 2 === 1).select(col("vec_id"))
    // nprobe=1 reads only the even cell → none of the allowed odd ids
    assert(Ivf.annTopKFiltered(store, "vectors", queries,
      "vec_id", "e", k = 3, allowed, nprobe = 1).count() === 0L)
    // the filtered default covers both cells → k results, all odd
    val wide = Ivf.annTopKFiltered(store, "vectors", queries,
        "vec_id", "e", k = 3, allowed)
      .collect().map(_.getLong(2))
    assert(wide.length === 3 && wide.forall(_ % 2 == 1), wide.toSeq)
  }

  test("re-upsert moves a vector between cells without leaving a stale row") {
    val (store, root) = freshStore()
    Ivf.buildIndex(store, "vectors", corpus, "vec_id", "e", k = 2, iters = 2)

    val before = store.read(Ivf.mapName("vectors"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // move vector 1 (odd blob) onto vector 0's position (even blob)
    val moved = corpus.filter(col("vec_id") === 0)
      .select(lit(1L).as("vec_id"), col("e"))
    Ivf.upsertWithCells(store, "vectors", moved, "vec_id", "e")

    val after = store.read(Ivf.mapName("vectors"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after(1L) === after(0L)) // now in the even blob's cell
    assert(after(1L) !== before(1L)) // actually moved
    // the index holds exactly one row for vec 1, in the new cell
    val idxRows = store.read(Ivf.indexName("vectors"))
      .filter(col("pk") === 1L)
      .select(col("cell").cast("long")).collect().map(_.getLong(0))
    assert(idxRows.toSeq === Seq(after(1L)))
    // total row count unchanged (no duplicates anywhere)
    assert(store.read(Ivf.indexName("vectors")).count() === 40L)

    // a query at the moved position finds vec 1 as its top candidate
    val res = Ivf.annTopK(store, "vectors",
      corpus.filter(col("vec_id") === 0), "vec_id", "e", k = 1, nprobe = 1)
      .collect()
    assert(res.head.getLong(2) === 1L)
    assert(math.abs(res.head.getDouble(3) - 1.0) < 1e-12) // identical vectors
  }
}
