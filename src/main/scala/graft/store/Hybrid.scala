package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical + semantic retrieval — reciprocal-rank fusion (RRF)
  * over the two index families the store already maintains: BM25 from
  * the persisted FTS index ([[Fts.searchRanked]]) and cosine from the
  * quantized ANN ladder ([[Sq.annTopK]] / [[Sq.annTopKFiltered]]).
  * This is the serving shape RAG pipelines actually deploy: the
  * lexical leg nails exact terms/identifiers the embedding smooths
  * over, the semantic leg catches paraphrases with zero term overlap,
  * and RRF — `score(d) = Σ_legs 1/(K + rank_leg(d))`, Cormack et al.,
  * SIGIR'09 — fuses them on RANKS alone, so BM25's unbounded scores
  * and cosine's [-1,1] never need calibrating against each other.
  *
  * Scale shape: each leg already ends in a bounded top-`depth` list
  * (the FTS leg's scoring is posting-pruned, the ANN leg's scan is
  * code-packed + pre-filtered), so the fusion itself joins two ≤depth
  * row frames — driver-light, shuffle-trivial, independent of corpus
  * size. Reference analog: the delegated-SQL search surface
  * (`/root/reference/README.md` search examples) ranks lexically
  * only; fusion is the extension a trained-embedding corpus earns.
  */
object Hybrid {

  /** Generic RRF: fuse (id, rank) lists — rank 1 = best, each list
    * already truncated to its retrieval depth. Docs absent from a
    * list contribute nothing for it (the standard truncated-list
    * form). Returns (id, rrf, rank[, legNames...]) ordered
    * best-first; ties break on the lower id for engine-stable output.
    * Pass `legNames` (one per list) to carry each leg's rank column
    * through — null where a leg did not retrieve the doc — the "why
    * did this hit surface" columns a serving layer renders. One
    * fusion body for the generic and the served path, so the formula
    * cannot fork.
    */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, rankCol: String,
      k: Int = 60, legNames: Seq[String] = Nil): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranking")
    require(legNames.isEmpty || legNames.size == lists.size,
      s"legNames (${legNames.size}) must match lists (${lists.size})")
    val names =
      if (legNames.nonEmpty) legNames else lists.indices.map(i => s"__r$i")
    val legs = lists.zip(names).map { case (df, n) =>
      df.select(col(idCol), col(rankCol).cast("long").as(n))
    }
    val joined = legs.reduce(_.join(_, Seq(idCol), "full_outer"))
    val rrf = names
      .map(n => coalesce(lit(1.0) / (lit(k) + col(n)), lit(0.0)))
      .reduce(_ + _)
    val keep = if (legNames.nonEmpty) legNames.map(col) else Seq.empty
    joined
      .select(col(idCol) +: rrf.as("rrf") +: keep: _*)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf").desc, col(idCol))).cast("long"))
      .select(col(idCol) +: col("rrf") +: col("rank") +: keep: _*)
      .orderBy(col("rank"))
  }

  /** One hybrid query: BM25 over the FTS MATCH `query` + cosine of
    * `queryVec` over the SQ8 code index, each truncated to `depth`,
    * fused with RRF to the final top `k`. `allowed` (optional, one pk
    * column) pre-filters BOTH legs — the metadata-scoped serving
    * shape, selectivity-proportional on each side. Returns
    * (pk, rrf, hybrid_rank, bm25_rank, ann_rank), leg ranks null for
    * docs the leg did not retrieve.
    *
    * `table` must maintain both indexes ([[Fts.upsertWithIndex]] and
    * [[Sq.buildIndex]]/upsertWithCodes) over the same pk space.
    */
  def searchRrf(
      spark: SparkSession, store: TableStore, table: String,
      query: String, queryVec: Array[Double], k: Int,
      depth: Int = 50, rrfK: Int = 60,
      allowed: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._
    val lex0 = Fts.searchRanked(spark, store, table, query)
    val lex = allowed.fold(lex0)(a =>
      AnnFilter.semiJoinAllowed(lex0, a, "pk"))
      .orderBy(col("score").desc, col("pk"))
      .limit(depth)
      .withColumn("bm25_rank", row_number().over(
        Window.orderBy(col("score").desc, col("pk"))).cast("long"))
      .select(col("pk"), col("bm25_rank").as("rank"))
    val qdf = Seq((0L, queryVec.toSeq)).toDF("qid", "qe")
    val ann = (allowed match {
      case Some(a) => Sq.annTopKFiltered(store, table, qdf, "qid", "qe", depth, a)
      case None => Sq.annTopK(store, table, qdf, "qid", "qe", depth)
    }).select(col("cand_id").as("pk"), col("rnk").as("rank"))
    rrfFuse(Seq(lex.select(col("pk"), col("rank")), ann), "pk", "rank",
        rrfK, legNames = Seq("bm25_rank", "ann_rank"))
      .withColumnRenamed("rank", "hybrid_rank")
      .filter(col("hybrid_rank") <= k)
      .select(col("pk"), col("rrf"), col("hybrid_rank"),
        col("bm25_rank"), col("ann_rank"))
      .orderBy(col("hybrid_rank"))
  }
}
