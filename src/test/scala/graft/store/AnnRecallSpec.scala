package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Catalog

/** Approximate-NN QUALITY measurement — the acceptance test a
  * production ANN rollout runs before trusting an index: recall@k of
  * the IVF probe search and the PQ/ADC search against the exact
  * brute-force ranking (matched metric: cosine for IVF, L2 for PQ),
  * on the driver-generated embeddings testdata.
  *
  * The assertions pin the recall/efficiency tradeoff:
  *  - IVF recall rises monotonically with nprobe and hits 1.0 when
  *    every cell is probed (nprobe = k ⇒ the scan is exhaustive and
  *    the ranking identical to brute force);
  *  - ADC recall clears a floor at top-k, and the production
  *    shortlist-then-rerank shape (ADC top-4k → exact rerank) clears
  *    a higher one — the measured numbers are printed so BENCH-side
  *    regressions in quality (not just speed) surface in CI.
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val K = 10
  private val nQueries = 20

  private lazy val emb: DataFrame =
    Catalog.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

  private lazy val queries: DataFrame = emb.filter(col("vec_id") < nQueries)

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Exact top-K ids per query under the given metric. */
  private def exactTopK(
      metric: String, qSet: DataFrame = queries, k: Int = K): Map[Long, Set[Long]] =
    exactTopKOn(emb, metric, qSet, k)

  private def exactTopKOn(
      corpus: DataFrame, metric: String, qSet: DataFrame,
      k: Int = K): Map[Long, Set[Long]] = {
    val q = qSet.select(col("vec_id").as("query_id"), col("e").as("qe"))
    val scored = corpus.crossJoin(q).filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        (metric match {
          case "cosine" => -dot(col("qe"), col("e")) /
            (sqrt(dot(col("qe"), col("qe"))) * sqrt(dot(col("e"), col("e"))))
          case "l2" => aggregate(zip_with(col("qe"), col("e"),
            (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
        }).as("d"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("d"), col("cand_id"))))
      .filter(col("rnk") <= k)
    scored.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q2, xs) => q2 -> xs.map(_._2).toSet }
  }

  private def recall(got: Map[Long, Set[Long]], exact: Map[Long, Set[Long]]): Double =
    exact.map { case (q, ex) =>
      got.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }.sum / exact.size

  private def resultSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select(col("query_id"), col("cand_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }

  test("IVF recall@10 rises with nprobe and is exact at nprobe = k") {
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-annr").toString)
    Ivf.buildIndex(store, "vectors", emb, "vec_id", "e", k = 16, iters = 3)
    val exact = exactTopK("cosine")

    val r = Seq(1, 4, 16).map { np =>
      np -> recall(resultSets(
        Ivf.annTopK(store, "vectors", queries, "vec_id", "e", K, nprobe = np)),
        exact)
    }.toMap
    info(s"IVF recall@$K by nprobe: $r")
    assert(r(1) <= r(4) + 1e-9 && r(4) <= r(16) + 1e-9,
      s"recall must not fall as nprobe grows: $r")
    assert(r(16) === 1.0, s"probing every cell must be exact: $r")
    assert(r(4) >= 0.5, s"nprobe=4/16 recall floor: $r")
  }

  test("FILTERED IVF recall@10 rises with nprobe and is exact at nprobe = k") {
    // the filtered-search acceptance curve: recall measured against
    // brute force OVER THE ALLOWED SUBSET — the quantity the
    // probe-widening default exists to protect (allowed rows in
    // unprobed cells are invisible, so filtered recall at a given
    // nprobe trails unfiltered recall until every cell is probed)
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-annrf").toString)
    Ivf.buildIndex(store, "vectors", emb, "vec_id", "e", k = 16, iters = 3)
    val allowedIds = Catalog.table(spark, sfDir, "embeddings")
      .filter(col("label") === 7).select(col("vec_id"))
    val exact = exactTopKOn(
      emb.join(allowedIds, Seq("vec_id"), "left_semi"), "cosine", queries)

    val r = Seq(1, 4, 16).map { np =>
      np -> recall(resultSets(
        Ivf.annTopKFiltered(store, "vectors", queries, "vec_id", "e", K,
          allowedIds, nprobe = np)),
        exact)
    }.toMap
    info(s"filtered IVF recall@$K by nprobe: $r")
    assert(r(1) <= r(4) + 1e-9 && r(4) <= r(16) + 1e-9,
      s"filtered recall must not fall as nprobe grows: $r")
    assert(r(16) === 1.0,
      s"probing every cell must be exhaustive over the allowed set: $r")
    // measured 0.45 at nprobe=4 vs unfiltered IVF's ~0.8 at the same
    // depth — the filtered-trails-unfiltered gap the widened default
    // narrows; floor pinned under the measured value
    assert(r(4) >= 0.4, s"filtered default-band recall floor: $r")
  }

  test("PQ/ADC recall@10 clears the floor; shortlist+exact-rerank clears a higher one") {
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-annr2").toString)
    // 64 codewords/subspace (6 bits) — still 4× coarser than the
    // production-standard 256 (8 bits), but enough for a meaningful
    // floor on 500 training vectors (16 codewords measured 0.27@10)
    Pq.buildIndex(store, "vectors", emb, "vec_id", "e",
      slices = 8, subDim = 8, k = 64, iters = 3)
    val exact = exactTopK("l2")

    val adc = recall(resultSets(
      Pq.annTopK(store, "vectors", queries, "vec_id", "e", K)), exact)
    // production shape: ADC shortlist of 4K, then the exact metric
    // re-ranks the shortlist (only |shortlist| embeddings are read)
    val short = recall(resultSets(
      Pq.annTopK(store, "vectors", queries, "vec_id", "e", 4 * K)), exact)
    info(s"ADC recall@$K: $adc; exact top-$K inside ADC top-${4 * K}: $short")
    // measured 0.37 / 0.74 on this corpus — the driver's embeddings
    // are near-isotropic synthetic vectors, the hardest case for PQ
    // (no low-dimensional structure for the codebooks to exploit);
    // real text/image embeddings sit far above these floors
    assert(adc >= 0.3, s"ADC recall@$K floor: $adc")
    assert(short >= adc - 1e-9, "a 4x shortlist can only help")
    assert(short >= 0.65, s"shortlist recall floor: $short")
  }

  test("SQ8 two-stage rerank: recall@10 rises with stage-1 depth (the serving knob)") {
    // the knob a 100-TB serving path actually tunes: stage 1 reads
    // int8 codes corpus-wide and shortlists `depth` candidates; stage
    // 2 reads ONLY those full-precision rows for the exact cosine.
    // Deeper stage-1 monotonically improves recall at fixed stage-2
    // cost growth — pinned here through the PERSISTED index, the same
    // path a production rollout would measure.
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-annr-sqr").toString)
    Sq.buildIndex(store, "vectors", emb, "vec_id", "e")
    val exact = exactTopK("cosine")

    def rerankRecall(depth: Int): Double = {
      val shortlist =
        Sq.annTopK(store, "vectors", queries, "vec_id", "e", depth)
          .filter(col("cand_id") =!= col("query_id"))
          .select(col("query_id"), col("cand_id"))
      val q = queries.select(col("vec_id").as("query_id"), col("e").as("qe"))
      val reranked = emb
        .select(col("vec_id").as("cand_id"), col("e").as("ce"))
        .join(broadcast(shortlist), Seq("cand_id"))
        .join(broadcast(q), Seq("query_id"))
        .select(col("query_id"), col("cand_id"),
          (dot(col("qe"), col("ce")) /
            (sqrt(dot(col("qe"), col("qe"))) * sqrt(dot(col("ce"), col("ce")))))
            .as("cos"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("cos").desc, col("cand_id"))))
        .filter(col("rnk") <= K)
      recall(resultSets(reranked), exact)
    }

    val shallow = rerankRecall(K + 2)
    val deep = rerankRecall(4 * K)
    info(f"SQ8 rerank recall@$K: depth ${K + 2} = $shallow%.3f, " +
      f"depth ${4 * K} = $deep%.3f")
    assert(deep >= shallow - 1e-9,
      s"deeper stage-1 must not lose recall: $shallow -> $deep")
    assert(deep >= 0.9, s"SQ8 rerank recall floor at depth ${4 * K}: $deep")
  }

  test("binary rerank: recall@10 rises with depth; 8-byte codes buy a real floor") {
    // the 1-bit/dim rung measured through the PERSISTED path: stage 1
    // reads 8-byte sign blobs (vs SQ8's 64 B, floats' 256 B at these
    // dims) and ranks by integer Hamming; stage 2 exact-reranks the
    // shortlist. Same serving knob as the SQ8 test above — the point
    // of pinning both is the byte-budget/recall tradeoff ACROSS rungs
    // stays visible in CI.
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-annr-bin").toString)
    Bin.buildIndex(store, "vectors", emb, "vec_id", "e")
    val exact = exactTopK("cosine")

    def rerankRecall(depth: Int): Double = {
      val shortlist =
        Bin.annTopK(store, "vectors", queries, "vec_id", "e", depth)
          .filter(col("cand_id") =!= col("query_id"))
          .select(col("query_id"), col("cand_id"))
      val q = queries.select(col("vec_id").as("query_id"), col("e").as("qe"))
      val reranked = emb
        .select(col("vec_id").as("cand_id"), col("e").as("ce"))
        .join(broadcast(shortlist), Seq("cand_id"))
        .join(broadcast(q), Seq("query_id"))
        .select(col("query_id"), col("cand_id"),
          (dot(col("qe"), col("ce")) /
            (sqrt(dot(col("qe"), col("qe"))) * sqrt(dot(col("ce"), col("ce")))))
            .as("cos"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("cos").desc, col("cand_id"))))
        .filter(col("rnk") <= K)
      recall(resultSets(reranked), exact)
    }

    val shallow = rerankRecall(K + 2)
    val mid = rerankRecall(4 * K)
    val deep = rerankRecall(8 * K)
    info(f"binary rerank recall@$K: depth ${K + 2} = $shallow%.3f, " +
      f"depth ${4 * K} = $mid%.3f, depth ${8 * K} = $deep%.3f")
    assert(mid >= shallow - 1e-9 && deep >= mid - 1e-9,
      s"deeper stage-1 must not lose recall: $shallow -> $mid -> $deep")
    // the near-isotropic testdata is the 1-bit code's WORST case (the
    // 64 sign bits are random hyperplane projections with no cluster
    // structure to exploit) — measured 0.54 at depth 40 / 0.6+ at 80,
    // which still beats IVF+PQ's 0.49 on the same corpus at 1/4 the
    // candidate bytes; floors pinned under the measured values. On
    // clustered corpora (BinSpec's planted neighborhoods) the same
    // path clears 0.8 at depth 40.
    assert(mid >= 0.45, s"binary rerank recall floor at depth ${4 * K}: $mid")
    assert(deep >= 0.55, s"binary rerank recall floor at depth ${8 * K}: $deep")
  }

  test("multi-probe LSH recall dominates single-probe on the same index") {
    // the inline oracle queries fix probes (vec_id < 8), k = 3, and a
    // 256-bucket space sized for the sf0.01 corpus (500 vectors ≈ 2
    // per bucket; this suite's sf0.001 would leave nearly every
    // bucket empty). Recall@3 against exact cosine over the same
    // probe/candidate split. Multi-probe candidates are a strict
    // superset (own bucket + 2 lowest-margin flips) re-ranked by
    // exact cosine, so its recall can never be lower.
    val sf01 = "/root/testdata/sf0.01"
    val emb01 = Catalog.table(spark, sf01, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val q01 = emb01.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("e").as("qe"))
    val exact = emb01.filter(col("vec_id") >= 8).crossJoin(q01)
      .select(col("query_id"), col("vec_id").as("cand_id"),
        (-dot(col("qe"), col("e")) /
          (sqrt(dot(col("qe"), col("qe"))) * sqrt(dot(col("e"), col("e")))))
          .as("d"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("d"), col("cand_id"))))
      .filter(col("rnk") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val single = recall(resultSets(
      graft.queries.SimilarityOps.annLshTopK(spark, sf01)), exact)
    val multi = recall(resultSets(
      graft.queries.SimilarityOps.annLshMultiprobe(spark, sf01)), exact)
    info(s"LSH recall@3: single-probe $single, multi-probe(+2 flips) $multi")
    // absolute sign-LSH recall on isotropic synthetic vectors is weak
    // by construction (true neighbors sit near cosine 0.4 and disagree
    // with the query on several planes — same caveat as the PQ floors
    // above); what the spec pins is the MECHANISM: the probe superset
    // strictly improves recall, deterministically (no RNG anywhere —
    // these exact values reproduce)
    assert(multi > single,
      s"flipping the 2 lowest-margin planes must find neighbors " +
        s"single-probe misses here: single=$single multi=$multi")
  }

  test("IVF+PQ recall@10 rises with nprobe; residual coding clears the ADC floor") {
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-annr3").toString)
    // same 64-codeword budget as the flat-PQ test so the floors are
    // comparable; 16 coarse cells on top
    IvfPq.buildIndex(store, "vectors", emb, "vec_id", "e",
      kCells = 16, slices = 8, subDim = 8, kCodes = 64, iters = 3)
    val exact = exactTopK("l2")

    val r = Seq(1, 4, 16).map { np =>
      np -> recall(resultSets(
        IvfPq.annTopK(store, "vectors", queries, "vec_id", "e", K,
          nprobe = np)), exact)
    }.toMap
    info(s"IVF+PQ recall@$K by nprobe: $r")
    assert(r(1) <= r(4) + 1e-9 && r(4) <= r(16) + 1e-9,
      s"recall must not fall as nprobe grows: $r")
    // probing every cell leaves only PQ quantization error — residual
    // coding must clear the flat-ADC floor on the same budget
    assert(r(16) >= 0.3, s"all-cells IVF+PQ recall floor: $r")
  }

  /** Planted-neighborhood corpus: `nClusters` deterministic seed
    * vectors, each with `perCluster` small-noise perturbations, so
    * every vector HAS genuine near neighbors (its cluster siblings).
    * The driver's uniform-random embeddings have no neighborhood
    * structure — every method's recall floors there sit near 0 and a
    * real recall regression is invisible. Queries get the lowest ids
    * (one member per cluster) to satisfy the probeMax convention.
    */
  private def plantedCorpus(
      nClusters: Int, perCluster: Int, dims: Int): DataFrame = {
    val rnd = new scala.util.Random(42) // fixed-seed LCG: deterministic
    val seeds = Array.fill(nClusters, dims)(rnd.nextDouble() - 0.5)
    val rows = for {
      c <- 0 until nClusters
      m <- 0 until perCluster
    } yield {
      val v = seeds(c).map(x => x + (rnd.nextDouble() - 0.5) * 0.08)
      val id =
        if (m == 0) c.toLong // queries: ids 0..nClusters-1
        else (nClusters + c * (perCluster - 1) + (m - 1)).toLong
      (id, v.toSeq)
    }
    rows.toDF("vec_id", "e")
  }

  test("planted neighborhoods: TRAINED indexes clear real recall floors") {
    // the production path end-to-end: persisted indexes built from
    // kmeans-trained centroids (Ivf), trained codebooks (Pq inside
    // IvfPq) — NOT the vec_id<16 seed convention the inline oracle
    // queries pin — searched with the same plans as the tests above,
    // on a corpus where neighbors exist to find
    val nClusters = 16
    val corpus = plantedCorpus(nClusters, 25, 64)
    val qs = corpus.filter(col("vec_id") < nClusters)
    val exactCos = exactTopKOn(corpus, "cosine", qs)
    val exactL2 = exactTopKOn(corpus, "l2", qs)

    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-annp").toString)
    Ivf.buildIndex(store, "pl", corpus, "vec_id", "e", k = nClusters, iters = 3)
    val ivf = recall(resultSets(
      Ivf.annTopK(store, "pl", qs, "vec_id", "e", K, nprobe = 2)), exactCos)
    info(s"planted IVF (trained cells) recall@$K at nprobe=2: $ivf")
    assert(ivf >= 0.5, s"planted IVF nprobe=2 recall floor: $ivf")

    IvfPq.buildIndex(store, "plq", corpus, "vec_id", "e",
      kCells = nClusters, slices = 8, subDim = 8, kCodes = 64, iters = 3)
    val ivfpq = recall(resultSets(
      IvfPq.annTopK(store, "plq", qs, "vec_id", "e", K, nprobe = 2)), exactL2)
    info(s"planted IVF+PQ (trained cells+books) recall@$K at nprobe=2: $ivfpq")
    assert(ivfpq >= 0.5, s"planted IVF+PQ nprobe=2 recall floor: $ivfpq")
  }

  test("planted neighborhoods: LSH multiprobe clears a real recall floor") {
    val nClusters = 16
    val corpus = plantedCorpus(nClusters, 25, 64)
    // exact ranking restricted to the candidate side of the probeMax
    // split (the search never returns other probes)
    val exact = exactTopKOn(
      corpus.filter(col("vec_id") >= nClusters), "cosine",
      corpus.filter(col("vec_id") < nClusters))
    val got = recall(resultSets(
      graft.queries.SimilarityOps.lshMultiprobeSearch(
        corpus, probeMax = nClusters.toLong, k = K)), exact)
    info(s"planted LSH multiprobe recall@$K: $got")
    assert(got >= 0.5, s"planted LSH multiprobe recall floor: $got")
  }

  test("JL sign projection: recall@10 rises with output dims and clears a floor") {
    // brute-force cosine in the PROJECTED space vs exact full-dim
    // cosine — the quality half of q_random_projection's cost story
    // (search 8-16 dims instead of 64). Deterministic end to end:
    // fixed sign matrix, fixed corpus, exact arithmetic.
    val exact = exactTopK("cosine")
    def projectedRecall(outDims: Int): Double = {
      val signs = graft.queries.SimilarityOps.signMatrix(outDims, 64)
      def proj(e: org.apache.spark.sql.Column) = array(
        (0 until outDims).map { j =>
          (0 until 64).map { d =>
            element_at(e, d + 1) * lit(signs(j)(d).toDouble)
          }.reduceLeft(_ + _)
        }: _*)
      val p = emb.select(col("vec_id"), proj(col("e")).as("e"))
      val q = p.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("e").as("qe"))
      val got = p.crossJoin(q).filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("cand_id"),
          (-dot(col("qe"), col("e")) /
            (sqrt(dot(col("qe"), col("qe"))) * sqrt(dot(col("e"), col("e")))))
            .as("d"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("query_id")).orderBy(col("d"), col("cand_id"))))
        .filter(col("rnk") <= K)
      recall(resultSets(got), exact)
    }
    val r8 = projectedRecall(8)
    val r16 = projectedRecall(16)
    info(s"JL projection recall@$K: 8 dims $r8, 16 dims $r16")
    // absolute recall is LOW on this corpus by construction: the
    // uniform-random embeddings have no neighborhood structure (all
    // pairwise cosines bunch together), which starves every
    // projection/hash method — the single-probe LSH test above
    // measures 0.0 on the same data. What the spec pins is the
    // MECHANISM (more dims ⇒ no worse recall) and the deterministic
    // measured floor (no RNG anywhere — these exact values reproduce)
    assert(r16 >= r8 - 1e-9,
      s"recall must not fall as projected dims grow: 8→$r8 16→$r16")
    assert(r8 >= 0.06, s"8-dim floor: $r8")
    assert(r16 >= 0.08, s"16-dim floor: $r16")
  }
}
