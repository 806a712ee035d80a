package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.MinHashSig

/** Persisted LSH band index: build/maintain the (pk, band_idx, band)
  * membership rows partitioned by band-hash bucket, and answer both
  * "all candidate pairs" and "what does this batch collide with?"
  * from the index — bit-identically to the inline signature pipeline,
  * with O(batch) maintenance and bucket-pruned probes.
  */
class LshSpec extends SparkSpec {
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta"

  private def corpus: DataFrame = Seq(
    0L -> base,
    1L -> base, // exact dup of 0: every band collides
    2L -> (base + " iota"), // near dup: some bands collide
    3L -> "one two three four five six",
    4L -> "one two three four five six", // dup pair
    5L -> "completely different words entirely here now",
    6L -> "" // too short to shingle: no bands, never pairs
  ).toDF("doc_id", "text")

  private def freshStore(): (TableStore, String) = {
    val root = java.nio.file.Files.createTempDirectory("graft-lsh").toString
    (new TableStore(spark, root), root)
  }

  /** The naive inline pair set under the same signature family — the
    * oracle the index-backed paths must reproduce exactly.
    */
  private def inlinePairs(
      docs: DataFrame, shingleSize: Int = 3, nHashes: Int = 4,
      bands: Int = 2): Set[(Long, Long)] = {
    val sig = MinHashSig.minhashSig(spark, col("text"), shingleSize, nHashes)
    val bandsArr = flatten(transform(
      filter(array(sig), s => s.isNotNull),
      s => MinHashSig.bandKeys(s, nHashes, bands)))
    val b = docs.select(col("doc_id"), explode(bandsArr).as("b"))
      .select(col("doc_id"), col("b.band_idx").as("band_idx"),
        col("b.band").as("band"))
    b.as("x").join(b.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band") === col("y.band") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def indexContent(store: TableStore, table: String): Set[(Long, Int, String, Long)] =
    store.read(Lsh.indexName(table))
      .select(col("pk"), col("band_idx"), col("band"),
        col("bucket").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSet

  test("build: store-backed candidates equal the inline pair set") {
    val (store, _) = freshStore()
    Lsh.buildIndex(store, "documents", corpus, "doc_id", "text")
    val expected = inlinePairs(corpus)
    assert(expected.contains((0L, 1L)) && expected.contains((3L, 4L)))
    assert(pairSet(Lsh.candidates(store, "documents")) === expected)
    // the base table rides along (Ivf/Fts buildIndex contract)
    assert(store.read("documents").count() === 7)
    assert(Lsh.params(store, "documents") === Some(Lsh.Params(3, 4, 2, 16)))
  }

  test("incremental upsert equals a wholesale rebuild; untouched bucket files stay put") {
    val (store, root) = freshStore()
    val initial = corpus.filter(col("doc_id") < 5)
    Lsh.buildIndex(store, "documents", initial, "doc_id", "text")
    Lsh.upsertWithBands(store, "documents", initial, "doc_id", "text")

    // snapshot per-bucket file listings before the batch
    def bucketFiles(): Map[String, Set[String]] = {
      val dir = java.nio.file.Paths.get(root, Lsh.indexName("documents"))
      val out = scala.collection.mutable.Map[String, Set[String]]()
      java.nio.file.Files.list(dir).forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("bucket=")) {
          val fs = java.nio.file.Files.list(p)
          try out(n) = {
            val it = fs.iterator(); val b = Set.newBuilder[String]
            while (it.hasNext) b += it.next().getFileName.toString
            b.result()
          } finally fs.close()
        }
      }
      out.toMap
    }
    val before = bucketFiles()

    // batch: doc 2's text changes, docs 5/6 arrive
    val batch = Seq(
      2L -> "totally rewritten content with new words",
      5L -> "completely different words entirely here now",
      6L -> "").toDF("doc_id", "text")
    Lsh.upsertWithBands(store, "documents", batch, "doc_id", "text")

    // equality with a from-scratch rebuild over the merged corpus
    val merged = corpus.filter(col("doc_id") =!= 2)
      .unionByName(batch.filter(col("doc_id") === 2))
    val (store2, _) = freshStore()
    Lsh.buildIndex(store2, "documents", merged, "doc_id", "text")
    assert(indexContent(store, "documents") === indexContent(store2, "documents"))
    assert(pairSet(Lsh.candidates(store, "documents")) === inlinePairs(merged))
    // the map agrees with the index
    val fromIdx = store.read(Lsh.indexName("documents"))
      .select(col("pk"), col("bucket").cast("long")).distinct()
    val mapRows = store.read(Lsh.mapName("documents"))
    assert(mapRows.count() === fromIdx.count())
    assert(mapRows.join(fromIdx, Seq("pk", "bucket")).count() === mapRows.count())
    // base table upserted alongside
    assert(store.read("documents").count() === 7)

    // buckets not touched by the batch kept their exact files
    val after = bucketFiles()
    val touched = store2.read(Lsh.indexName("documents"))
      .join(Seq(2L, 5L, 6L).toDF("pk"), Seq("pk"), "left_semi")
      .select(col("bucket").cast("long")).distinct()
      .collect().map("bucket=" + _.getLong(0)).toSet
    // doc 2's OLD buckets were touched too (stale-row clearing)
    val oldBuckets = {
      val (s3, _) = freshStore()
      Lsh.buildIndex(s3, "documents", initial, "doc_id", "text")
      s3.read(Lsh.indexName("documents")).filter(col("pk") === 2L)
        .select(col("bucket").cast("long")).distinct()
        .collect().map("bucket=" + _.getLong(0)).toSet
    }
    val allTouched = touched ++ oldBuckets
    before.keySet.filterNot(allTouched).foreach { b =>
      assert(after.get(b) === before.get(b), s"untouched $b was rewritten")
    }
  }

  test("re-upsert to empty text clears every stale band row") {
    val (store, _) = freshStore()
    Lsh.buildIndex(store, "documents", corpus, "doc_id", "text")
    Lsh.upsertWithBands(store, "documents",
      Seq(0L -> "").toDF("doc_id", "text"), "doc_id", "text")
    assert(store.read(Lsh.indexName("documents"))
      .filter(col("pk") === 0L).count() === 0L)
    assert(store.read(Lsh.mapName("documents"))
      .filter(col("pk") === 0L).count() === 0L)
    // doc 1 (0's twin) still pairs with doc 2, but no pair names 0
    val pairs = pairSet(Lsh.candidates(store, "documents"))
    assert(!pairs.exists(p => p._1 == 0L || p._2 == 0L))
    assert(pairs === inlinePairs(corpus.filter(col("doc_id") =!= 0)))
  }

  test("candidatesFor prunes the scan to probe buckets and matches the restricted full set") {
    val (store, _) = freshStore()
    Lsh.buildIndex(store, "documents", corpus, "doc_id", "text")
    val probes = Seq(3L).toDF("pk")
    val got = Lsh.candidatesFor(store, "documents", probes)
    val expected = inlinePairs(corpus).filter(p => p._1 == 3L || p._2 == 3L)
    assert(pairSet(got) === expected)
    assert(expected === Set((3L, 4L)))

    // the executed plan prunes the index scan to the probe's buckets
    val nBuckets = store.read(Lsh.indexName("documents"))
      .select(col("bucket")).distinct().count()
    val probeBuckets = store.read(Lsh.mapName("documents"))
      .filter(col("pk") === 3L).select(col("bucket")).distinct().count()
    assert(probeBuckets < nBuckets) // scenario really exercises pruning
    // the executed (adaptive) plan carries the bucket predicate as a
    // PARTITION filter, and the exact pruned-scan shape candidatesFor
    // builds — read + isin over the partition column — selects only
    // the probe's bucket directories (filter-only plan, so the scan
    // node is directly inspectable; AQE hides the join plan's scans
    // inside query stages)
    val planStr = got.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("bucket"),
      planStr.take(2000))
    val probeBucketVals = store.read(Lsh.mapName("documents"))
      .filter(col("pk") === 3L).select(col("bucket").cast("long"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val pruned = store.read(Lsh.indexName("documents"))
      .withColumn("bucket", col("bucket").cast("long"))
      .filter(col("bucket").isin(probeBucketVals: _*))
    val oneScan = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(oneScan.metadata("PartitionFilters").contains("bucket"))
    assert(oneScan.selectedPartitions.partitionCount === probeBucketVals.size)
  }

  test("filtered candidatesFor: predicate purity and no starvation (SqSpec's contract)") {
    val (store, _) = freshStore()
    Lsh.buildIndex(store, "documents", corpus, "doc_id", "text")
    val probes = Seq(0L).toDF("pk")
    // unfiltered: doc 0 collides with its exact dup 1 and near dup 2
    val unfiltered = pairSet(Lsh.candidatesFor(store, "documents", probes))
    assert(unfiltered === Set((0L, 1L), (0L, 2L)))
    // predicate excludes the STRONGEST collider (1) — the allowed
    // near dup (2) must still surface: pre-filter never starves
    val allowed = Seq(2L, 3L, 5L).toDF("pk")
    val got = pairSet(Lsh.candidatesForFiltered(
      store, "documents", probes, allowed))
    assert(got === Set((0L, 2L)))
    // purity: the non-probe side of every pair passes the predicate
    val allowedSet = Set(2L, 3L, 5L)
    got.foreach { case (a, b) =>
      val other = if (a == 0L) b else a
      assert(allowedSet(other), s"predicate leaked: ($a, $b)")
    }
    // equivalence: filtered == unfiltered restricted to allowed others
    assert(got === unfiltered.filter { case (a, b) =>
      allowedSet(if (a == 0L) b else a)
    })
    // empty predicate → empty result, not an error
    assert(pairSet(Lsh.candidatesForFiltered(store, "documents", probes,
      Seq.empty[Long].toDF("pk"))) === Set.empty)
  }

  test("filtered candidatesFor: probe-probe pairs follow the one-sided rule") {
    val (store, _) = freshStore()
    Lsh.buildIndex(store, "documents", corpus, "doc_id", "text")
    // both twins (3, 4) probe together; 4 passes the predicate, so
    // the (3, 4) pair surfaces exactly once via 3's probe
    val probes = Seq(3L, 4L).toDF("pk")
    val got = pairSet(Lsh.candidatesForFiltered(
      store, "documents", probes, Seq(4L).toDF("pk")))
    assert(got === Set((3L, 4L)))
    // neither twin allowed → no pair, even though both probe
    assert(pairSet(Lsh.candidatesForFiltered(
      store, "documents", probes, Seq(5L).toDF("pk"))) === Set.empty)
  }

  test("incremental maintenance == from-scratch index (any batch sequence, seeded)") {
    // the Lsh analog of FtsSpec's trigger-parity property: ANY
    // sequence of upsert batches leaves exactly the index (and map) a
    // from-scratch build of the final base table would produce
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    val rnd = new scala.util.Random(1717)
    (1 to 3).foreach { round =>
      val (store, _) = freshStore()
      (1 to 4).foreach { _ =>
        val batch = (1 to (1 + rnd.nextInt(5))).map { _ =>
          val id = rnd.nextInt(8).toLong
          // 0-2 tokens sometimes: exercises the no-bands path
          val text = Seq.fill(rnd.nextInt(8))(words(rnd.nextInt(words.size)))
            .mkString(" ")
          (id, text)
        }
        val dedup = batch.groupBy(_._1).map(_._2.last).toSeq
        Lsh.upsertWithBands(store, "docs",
          dedup.toDF("doc_id", "text"), "doc_id", "text", buckets = 4)
      }
      val (scratch, _) = freshStore()
      Lsh.buildIndex(scratch, "docs", store.read("docs"),
        "doc_id", "text", buckets = 4)
      assert(indexContent(store, "docs") === indexContent(scratch, "docs"),
        s"index diverged in round $round")
      def mapRows(s: TableStore) = s.read(Lsh.mapName("docs"))
        .select(col("pk"), col("bucket").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(mapRows(store) === mapRows(scratch), s"map diverged in round $round")
      assert(Doctor.check(store).filter(_.component == "lsh") === Seq.empty)
    }
  }

  test("parameter change rebuilds wholesale under the new banding") {
    val (store, _) = freshStore()
    Lsh.buildIndex(store, "documents", corpus, "doc_id", "text")
    Lsh.upsertWithBands(store, "documents",
      Seq(7L -> (base + " kappa")).toDF("doc_id", "text"),
      "doc_id", "text", nHashes = 8, bands = 4, buckets = 8)
    assert(Lsh.params(store, "documents") === Some(Lsh.Params(3, 8, 4, 8)))
    val idx = store.read(Lsh.indexName("documents"))
    assert(idx.select(col("band_idx")).distinct().count() === 4)
    val all = corpus.unionByName(Seq(7L -> (base + " kappa")).toDF("doc_id", "text"))
    assert(pairSet(Lsh.candidates(store, "documents")) ===
      inlinePairs(all, nHashes = 8, bands = 4))
  }
}
