package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Product-quantization store: joint per-subspace Lloyd training
  * strictly reduces quantization error vs the seed convention, the
  * persisted code table serves ADC search without re-encoding (the
  * plan reads `<table>_pq`, never the base embeddings), and code
  * maintenance is upsert-batch-shaped like the FTS postings.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val slices = 8
  private val subDim = 8
  private val dims = slices * subDim

  /** Deterministic spread-out corpus: 48 vectors × 64 dims. */
  private def corpus: DataFrame =
    (0 until 48).map { i =>
      (i.toLong, (0 until dims).map(d => ((i * 37 + d * 13) % 101) / 10.0))
    }.toDF("vec_id", "e")

  private def freshStore(): TableStore =
    new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-pq").toString)

  test("trained codebooks strictly reduce quantization error vs seed books") {
    val emb = corpus
    val seed = Pq.seedBooks(emb, "vec_id", "e", slices, subDim, k = 16)
    val trained = Pq.trainBooks(emb, "vec_id", "e", slices, subDim, k = 16, iters = 3)

    // schema: slices × k codewords of subDim dims each
    val byS = trained.collect()
      .groupBy(_.getInt(0)).view.mapValues(_.length).toMap
    assert(byS.keySet === (0 until slices).toSet)
    assert(byS.values.forall(_ === 16))
    assert(trained.select(size(col("ce"))).distinct().head.getInt(0) === subDim)

    val seedErr = Pq.quantizationError(emb, seed, "vec_id", "e", slices, subDim)
    val trainedErr = Pq.quantizationError(emb, trained, "vec_id", "e", slices, subDim)
    assert(trainedErr < seedErr,
      s"training must reduce quantization error: seed=$seedErr trained=$trainedErr")
  }

  test("persisted ADC search matches inline encoding and never reads embeddings") {
    val store = freshStore()
    val emb = corpus
    Pq.buildIndex(store, "vectors", emb, "vec_id", "e",
      slices, subDim, k = 16, iters = 2)

    val queries = emb.filter(col("vec_id") < 3)
    val got = Pq.annTopK(store, "vectors", queries, "vec_id", "e", k = 5,
      slices, subDim)

    // the search plan scans the code table, not the base embeddings
    val paths = got.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString).mkString(",")
        case _ => ""
      }
    }
    assert(paths.exists(_.contains("vectors_pq")), paths)
    assert(!paths.exists(p =>
      p.contains("/vectors") && !p.contains("vectors_pq")), paths)

    // inline path: encode the same corpus against the same books and
    // run the identical LUT-join/sum/top-k — results must match
    val books = store.read(Pq.booksName("vectors"))
    val inlineCodes = Pq.encodeExploded(emb, books, "vec_id", "e", slices, subDim)
      .select(col("pk").as("cand_id"), col("s"), col("code"))
    val l = Pq.lut(queries, books, "vec_id", "e", slices, subDim)
    val inline = inlineCodes.join(broadcast(l), Seq("s", "code"))
      .groupBy(col("query_id"), col("cand_id"))
      .agg(sum(col("qd")).as("adist"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("adist"), col("cand_id"))).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("query_id"), col("rnk"), col("cand_id"), col("adist"))

    assert(got.collect().toSet === inline.collect().toSet)
    // self-match sanity: each query's own codes give distance 0
    val top1 = got.filter(col("rnk") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(top1 === Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("filtered ADC search equals exhaustive-then-filter and fills k") {
    val store = freshStore()
    Pq.buildIndex(store, "vectors", corpus, "vec_id", "e",
      slices, subDim, k = 8, iters = 2)
    val queries = corpus.filter(col("vec_id") < 2)
    val allowed = corpus.filter(col("vec_id") % 4 === 3).select(col("vec_id"))
    val allowedSet = allowed.collect().map(_.getLong(0)).toSet
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val filtered = rows(Pq.annTopKFiltered(
      store, "vectors", queries, "vec_id", "e", k = 5, allowed, slices, subDim))
    val exhaustive = rows(Pq.annTopK(
        store, "vectors", queries, "vec_id", "e", k = 48, slices, subDim))
      .filter { case (_, _, cand) => allowedSet.contains(cand) }
      .groupBy(_._1).flatMap { case (q, rs) =>
        rs.sortBy(_._2).take(5).zipWithIndex
          .map { case ((_, _, cand), i) => (q, i + 1L, cand) }
      }.toSeq
    assert(filtered.sorted === exhaustive.sorted)
    assert(filtered.groupBy(_._1).forall(_._2.size == 5))
  }

  test("re-upsert re-encodes only the batch and search sees fresh codes") {
    val store = freshStore()
    Pq.buildIndex(store, "vectors", corpus, "vec_id", "e",
      slices, subDim, k = 16, iters = 1)

    // move vector 47 exactly onto vector 20's position: their codes
    // must now be identical
    val moved = corpus.filter(col("vec_id") === 20)
      .select(lit(47L).as("vec_id"), col("e"))
    Pq.upsertWithCodes(store, "vectors", moved, "vec_id", "e", slices, subDim)

    val codes = store.read(Pq.codesName("vectors"))
      .select(col("pk"), hex(col("codes")).as("cs"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(codes.size === 48) // still one row per vector
    assert(codes(47L) === codes(20L))

    // a query at that position now finds both at the same adist
    val q = corpus.filter(col("vec_id") === 20).limit(1)
    val res = Pq.annTopK(store, "vectors", q, "vec_id", "e", k = 2,
      slices, subDim).collect()
    assert(res.map(_.getLong(2)).toSet === Set(20L, 47L))
    assert(res.map(_.getLong(3)).distinct.length === 1) // equal adist
  }
}
