package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hybrid RRF retrieval over the two persisted index families: the
  * fusion must beat EITHER single ranker's recall on a corpus where
  * relevance is split between the modalities — half the relevant docs
  * are lexical-only (exact terms, unrelated embedding: the
  * identifier/keyword case BM25 nails and embeddings smooth over),
  * half are semantic-only (paraphrases with zero term overlap: the
  * case BM25 cannot see at all). That split is WHY hybrid serving
  * exists; the spec pins it quantitatively.
  */
class HybridSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 32
  private val rnd = new scala.util.Random(1234)

  private def randVec(): Seq[Double] = Seq.fill(dims)(rnd.nextGaussian())
  private def near(v: Seq[Double], eps: Double): Seq[Double] =
    v.map(_ + eps * rnd.nextGaussian())

  // query: text "alpha beta", vector qv
  private val qv: Seq[Double] = randVec()

  // pks 1-5: lexical-only relevant (both query terms, far embedding)
  // pks 6-10: semantic-only relevant (no query terms, near-qv embedding)
  // pks 11-40: distractors (neither)
  private val relevant: Set[Long] = (1L to 10L).toSet
  private def corpus = {
    val lexical = (1 to 5).map(i =>
      (i.toLong, s"alpha beta " * i + "filler words here", randVec()))
    val semantic = (6 to 10).map(i =>
      (i.toLong, s"completely different paraphrase number $i", near(qv, 0.05)))
    val noise = (11 to 40).map(i =>
      (i.toLong, s"unrelated document $i about other topics", randVec()))
    (lexical ++ semantic ++ noise).toDF("pk", "text", "emb")
  }

  private def freshStore(): TableStore =
    new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-hybrid").toString)

  private def recallAt10(ids: Seq[Long]): Double =
    ids.take(10).count(relevant).toDouble / relevant.size

  test("RRF fusion beats either single ranker's recall on a split-relevance corpus") {
    val store = freshStore()
    val docs = corpus
    Fts.upsertWithIndex(store, "docs", docs, "pk", "text")
    Sq.buildIndex(store, "docs", docs, "pk", "emb")

    // single rankers at the same depth
    val lexIds = Fts.searchRanked(spark, store, "docs", "alpha beta")
      .select(col("pk").cast("long")).collect().map(_.getLong(0)).toSeq
    val qdf = Seq((0L, qv)).toDF("qid", "qe")
    val annIds = Sq.annTopK(store, "docs", qdf, "qid", "qe", 10)
      .select(col("cand_id").cast("long")).collect().map(_.getLong(0)).toSeq
    val lexRecall = recallAt10(lexIds)
    val annRecall = recallAt10(annIds)
    // each modality alone can only see its half
    assert(lexRecall <= 0.5, s"lexical leg saw too much: $lexRecall")
    assert(annRecall <= 0.6, s"semantic leg saw too much: $annRecall")

    val fused = Hybrid.searchRrf(spark, store, "docs", "alpha beta",
      qv.toArray, k = 10)
    assert(fused.columns.toSeq ===
      Seq("pk", "rrf", "hybrid_rank", "bm25_rank", "ann_rank"))
    // leg ranks explain each hit: lexical-only docs carry a bm25_rank
    // and a (possibly deep) ann_rank; a doc absent from a leg is null
    val byPk = fused.collect().map(r => r.getLong(0) -> r).toMap
    (1L to 5L).filter(byPk.contains).foreach(pk =>
      assert(!byPk(pk).isNullAt(3), s"lexical doc $pk missing bm25_rank"))
    val fusedIds = fused.select(col("pk").cast("long"))
      .collect().map(_.getLong(0)).toSeq
    val fusedRecall = recallAt10(fusedIds)
    assert(fusedRecall > math.max(lexRecall, annRecall),
      s"fusion ($fusedRecall) must beat lex ($lexRecall) and ann ($annRecall)")
    assert(fusedRecall >= 0.9, s"fusion recall only $fusedRecall")
    // output is rank-ordered with monotone non-increasing rrf
    val rrfs = fused.select(col("rrf")).collect().map(_.getDouble(0)).toSeq
    assert(rrfs === rrfs.sorted.reverse)
  }

  test("filtered hybrid: the allowed-set predicate scopes BOTH legs") {
    val store = freshStore()
    val docs = corpus
    Fts.upsertWithIndex(store, "docs", docs, "pk", "text")
    Sq.buildIndex(store, "docs", docs, "pk", "emb")
    // allow only even pks: every result must be even, and the legs
    // must not starve (pre-filter, not post-filter)
    val allowed = docs.filter(col("pk") % 2 === 0).select(col("pk"))
    val fused = Hybrid.searchRrf(spark, store, "docs", "alpha beta",
      qv.toArray, k = 10, allowed = Some(allowed))
    val ids = fused.select(col("pk").cast("long"))
      .collect().map(_.getLong(0)).toSeq
    assert(ids.nonEmpty)
    assert(ids.forall(_ % 2 == 0), s"predicate leaked: $ids")
    // the even relevant docs still surface
    assert(ids.count(relevant) >= 4, s"filtered fusion starved: $ids")
  }

  test("hybrid serving works over STREAM-maintained indexes (both families, same table)") {
    // both legs' indexes maintained by the streaming foreachBatch
    // sinks (the production shape: one ingest keeps FTS and SQ8 fresh
    // per micro-batch); fusion must surface relevant docs from BOTH
    // batches — including one only reachable through each modality
    val store = freshStore()
    val all = corpus.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getSeq[Double](2))).toSeq
    val (batch1, batch2) = all.partition(_._1 % 2 == 1)
    def df(rows: Seq[(Long, String, Seq[Double])]) = rows.toDF("pk", "text", "emb")
    // seed: scales must train once before the sq sink (its contract)
    Fts.upsertWithIndex(store, "docs", df(batch1), "pk", "text")
    Sq.buildIndex(store, "docs", df(batch1), "pk", "emb")
    // micro-batch 2 lands through the streaming sinks
    graft.streaming.StreamFts.indexSink(store, "docs", "pk", "text")(df(batch2), 1L)
    graft.streaming.StreamVectors.sqSink(store, "docs", "pk", "emb")(df(batch2), 1L)

    val fused = Hybrid.searchRrf(spark, store, "docs", "alpha beta",
      qv.toArray, k = 10)
    val ids = fused.select(col("pk").cast("long"))
      .collect().map(_.getLong(0)).toSeq
    assert(recallAt10(ids) >= 0.9, s"stream-maintained fusion recall: $ids")
    // relevance surfaced from BOTH batches and BOTH modalities
    assert(ids.exists(i => i % 2 == 1 && i <= 5) &&
      ids.exists(i => i % 2 == 0 && i <= 5), s"lexical legs missing: $ids")
    assert(ids.exists(i => i % 2 == 1 && i >= 6 && i <= 10) &&
      ids.exists(i => i % 2 == 0 && i >= 6 && i <= 10),
      s"semantic legs missing: $ids")
    assert(Doctor.check(store) === Seq.empty)
  }

  test("rrfFuse: truncated-list math, absent legs contribute zero") {
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rank")
    val b = Seq((3L, 1L), (4L, 2L)).toDF("id", "rank")
    val got = Hybrid.rrfFuse(Seq(a, b), "id", "rank", k = 60)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got(1L) === 1.0 / 61)
    assert(got(2L) === 1.0 / 62)
    assert(got(3L) === 1.0 / 63 + 1.0 / 61) // in both lists
    assert(got(4L) === 1.0 / 62)
    // doc 3 wins overall (two legs beat any single-leg score here)
    val first = Hybrid.rrfFuse(Seq(a, b), "id", "rank").head()
    assert(first.getLong(0) === 3L)
  }
}
