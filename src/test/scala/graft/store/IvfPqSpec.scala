package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Combined IVF+PQ persisted index: coarse cells partition the code
  * table, codes quantize cell residuals against shared trained books.
  * Search prunes to probed cell directories and must agree exactly
  * with an in-memory recomputation against the same persisted models;
  * incremental upserts (including cross-cell moves) must leave the
  * code table identical to a from-scratch encode of the merged corpus
  * against those models.
  */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8
  private val slices = 4
  private val subDim = 2

  /** Two well-separated blobs (even ids ~ +axis, odd ids ~ -axis) so
    * 2 trained cells land one per blob; per-id jitter gives residual
    * structure for the books to quantize.
    */
  private def corpus: DataFrame =
    (0 until 40).map { i =>
      val sign = if (i % 2 == 0) 1.0 else -1.0
      (i.toLong, (0 until dims).map(d =>
        sign * (10.0 + ((i * 7 + d) % 5) * 0.1)))
    }.toDF("vec_id", "e")

  private def freshStore(): TableStore =
    new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-ivfpq").toString)

  private def dotC(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Independent re-derivation of the assignment + residual step from
    * the persisted centroids (mirrors IvfSpec's inline recompute).
    */
  private def inlineResiduals(emb: DataFrame, cents: DataFrame): DataFrame =
    emb.withColumn("norm", sqrt(dotC(col("e"), col("e"))))
      .crossJoin(broadcast(cents))
      .select(col("vec_id").as("pk"), col("e"), col("cent_id"), col("cent_e"),
        (dotC(col("e"), col("cent_e")) / (col("norm") * col("cent_norm")))
          .as("cs"))
      .groupBy(col("pk"))
      .agg(max_by(struct(col("e"), col("cent_id").as("cell"), col("cent_e")),
        struct(col("cs"), (-col("cent_id")).as("nc"))).as("b"))
      .select(col("pk"), col("b.cell").as("cell"),
        zip_with(col("b.e"), col("b.cent_e"), (x, y) => x - y).as("r"))

  test("search prunes to probed cells and matches in-memory ADC exactly") {
    val store = freshStore()
    IvfPq.buildIndex(store, "vectors", corpus, "vec_id", "e",
      kCells = 2, slices = slices, subDim = subDim, kCodes = 4, iters = 2)

    val queries = corpus.filter(col("vec_id") < 2)
    val got = IvfPq.annTopK(store, "vectors", queries, "vec_id", "e",
      k = 3, nprobe = 1, slices = slices, subDim = subDim)
    val rows = got.collect()

    // nprobe=1 over separated blobs: every candidate shares the
    // query's parity (its blob)
    rows.foreach { r =>
      assert(r.getLong(0) % 2 === r.getLong(2) % 2,
        s"candidate from the wrong blob: $r")
    }
    assert(rows.map(_.getLong(0)).distinct.sorted === Array(0L, 1L))
    assert(rows.count(_.getLong(0) == 0L) === 3)

    // the code-table scan carries the probed cells as PARTITION
    // filters (directory pruning), not data filters
    val planStr = got.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("cell"),
      planStr.take(2000))

    // in-memory ADC against the same persisted models agrees exactly:
    // re-derive residuals/codes/LUT from cents+books without touching
    // the persisted code table or its pruning path
    val cents = store.read(IvfPq.centsName("vectors"))
    val books = store.read(IvfPq.booksName("vectors"))
    val resid = inlineResiduals(corpus, cents)
    val codes = Pq.encodeExploded(resid, books, "pk", "r", slices, subDim)
      .join(resid.select(col("pk"), col("cell")), Seq("pk"))
    val probeCells = inlineResiduals(corpus.filter(col("vec_id") < 2), cents)
      .select(col("pk").as("query_id"), col("cell"), col("r").as("qr"))
    val lut = Pq.subvectors(
        probeCells.select(
          struct(col("query_id"), col("cell")).as("qk"), col("qr")),
        "qk", "qr", slices, subDim)
      .join(broadcast(books), Seq("s"))
      .select(col("pk.query_id").as("query_id"), col("pk.cell").as("cell"),
        col("s"), col("cent_id").as("code"),
        floor(Pq.l2sq(col("sv"), col("ce")) * 1e6).cast("long").as("qd"))
    val inline = codes.join(lut, Seq("cell", "s", "code"))
      .filter(col("pk") =!= col("query_id"))
      .groupBy(col("query_id"), col("pk").as("cand_id"))
      .agg(sum(col("qd")).as("adist"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("adist"), col("cand_id"))).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("query_id"), col("rnk"), col("cand_id"), col("adist"))
    assert(rows.toSet === inline.collect().toSet)
  }

  test("filtered search: parity predicate across the two blobs, probe-widening") {
    val store = freshStore()
    IvfPq.buildIndex(store, "vectors", corpus, "vec_id", "e",
      kCells = 2, slices = slices, subDim = subDim, kCodes = 4, iters = 2)
    // query = even blob member; allowed = ODD ids (the other cell)
    val queries = corpus.filter(col("vec_id") === 0)
    val allowed = corpus.filter(col("vec_id") % 2 === 1).select(col("vec_id"))
    // nprobe=1: only the query's own (even) cell is read → no allowed
    val narrow = IvfPq.annTopKFiltered(store, "vectors", queries,
      "vec_id", "e", k = 3, allowed, nprobe = 1,
      slices = slices, subDim = subDim)
    assert(narrow.count() === 0L)
    // the filtered default (2× wider) covers both cells → k odd results
    val wide = IvfPq.annTopKFiltered(store, "vectors", queries,
        "vec_id", "e", k = 3, allowed,
        slices = slices, subDim = subDim)
      .collect().map(_.getLong(2))
    assert(wide.length === 3 && wide.forall(_ % 2 == 1), wide.toSeq)
  }

  test("an int-pk table indexes and searches (cells normalize to long)") {
    // cent_ids — and so cells — inherit the pk column's type; the
    // maintenance/probe paths collect cells driver-side and must not
    // ClassCastException when the pk is IntegerType
    val store = freshStore()
    val intCorpus = (0 until 40).map { i =>
      val sign = if (i % 2 == 0) 1.0 else -1.0
      (i, (0 until dims).map(d => sign * (10.0 + ((i * 7 + d) % 5) * 0.1)))
    }.toDF("vec_id", "e")
    IvfPq.buildIndex(store, "vectors", intCorpus, "vec_id", "e",
      kCells = 2, slices = slices, subDim = subDim, kCodes = 4, iters = 1)
    val res = IvfPq.annTopK(store, "vectors",
      intCorpus.filter(col("vec_id") === 0), "vec_id", "e",
      k = 2, nprobe = 1, slices = slices, subDim = subDim).collect()
    assert(res.length === 2)
    // incremental upsert over the int-pk table also survives
    IvfPq.upsertWithCodes(store, "vectors",
      intCorpus.filter(col("vec_id") === 3), "vec_id", "e",
      slices = slices, subDim = subDim)
    assert(store.read(IvfPq.codesName("vectors")).count() === 40L)
  }

  test("cross-cell move rewrites only its cells; incremental equals rebuild") {
    val store = freshStore()
    IvfPq.buildIndex(store, "vectors", corpus, "vec_id", "e",
      kCells = 2, slices = slices, subDim = subDim, kCodes = 4, iters = 2)

    val before = store.read(IvfPq.mapName("vectors"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // move vector 1 (odd blob) onto vector 0's position (even blob)
    val moved = corpus.filter(col("vec_id") === 0)
      .select(lit(1L).as("vec_id"), col("e"))
    IvfPq.upsertWithCodes(store, "vectors", moved, "vec_id", "e",
      slices = slices, subDim = subDim)

    val after = store.read(IvfPq.mapName("vectors"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after(1L) === after(0L)) // now in the even blob's cell
    assert(after(1L) !== before(1L)) // actually moved
    // exactly one code row for pk 1, in the new cell; no stale row
    val pk1 = store.read(IvfPq.codesName("vectors"))
      .filter(col("pk") === 1L)
      .select(col("cell").cast("long")).collect().map(_.getLong(0))
    assert(pk1.toSeq === Seq(after(1L)))
    assert(store.read(IvfPq.codesName("vectors")).count() === 40L)

    // a query at the moved position now sees pk 1 as its best
    // candidate: identical vector → identical cell and codes →
    // minimal ADC distance, tie-broken to the lowest cand_id (0 is
    // the query itself, excluded)
    val res = IvfPq.annTopK(store, "vectors",
      corpus.filter(col("vec_id") === 0), "vec_id", "e",
      k = 1, nprobe = 1, slices = slices, subDim = subDim)
      .collect()
    assert(res.head.getLong(2) === 1L)

    // incremental maintenance converged to exactly what a fresh
    // encode of the merged corpus against the SAME persisted models
    // would write
    val merged = corpus.filter(col("vec_id") =!= 1L)
      .unionByName(moved.select(col("vec_id"), col("e")))
    val cents = store.read(IvfPq.centsName("vectors"))
    val books = store.read(IvfPq.booksName("vectors"))
    val resid = inlineResiduals(merged, cents)
    val expect = Pq.encode(resid, books, "pk", "r", slices, subDim)
      .join(resid.select(col("pk"), col("cell")), Seq("pk"))
      .select(col("pk"), hex(col("codes")).as("codes"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    val gotRows = store.read(IvfPq.codesName("vectors"))
      .select(col("pk"), hex(col("codes")).as("codes"),
        col("cell").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(gotRows === expect)
  }
}
