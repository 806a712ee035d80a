package graft.store

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** The trigger contract, breadth-first: one SQL `INSERT INTO` against
  * a table carrying EVERY maintained index family refreshes them all
  * — one epoch when everything is governed, Doctor green, the new row
  * served by every search surface. Plus the degradation path: an
  * index whose provenance is missing (or recorded under a different
  * pk) is SKIPPED, the write still lands, and Doctor reports the gap.
  */
class IndexMaintainSpec extends SparkSpec {
  import spark.implicits._

  private def mountCatalog(): (String, TableStore) = {
    val root = java.nio.file.Files.createTempDirectory("graft-im").toString
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", root)
    (root, new TableStore(spark, root))
  }

  private val dims = 8
  private def corpus(n: Int) = (0 until n).map { i =>
    (i.toLong, s"common word$i text",
      (0 until dims).map(d => math.sin(i * dims + d) * 3.0))
  }.toDF("id", "full_text", "e")

  test("one SQL INSERT refreshes all ten index families in ONE epoch; " +
    "Doctor green; the new row served everywhere") {
    val (_, store) = mountCatalog()
    store.ensureBucketed("docs", Seq("id"), 4)
    val base = corpus(24)
    store.upsert("docs", base, Seq("id"))
    def vecs = store.read("docs")
      .select(col("id"), col("e").cast("array<double>").as("e"))

    Fts.upsertWithIndexCols(store, "docs", store.read("docs"), "id",
      Seq("full_text"), buckets = 4)
    Trigram.upsertWithIndex(store, "docs", store.read("docs"), "id",
      "full_text")
    Lsh.buildIndex(store, "docs", store.read("docs"), "id", "full_text")
    Sq.buildIndex(store, "docs", vecs, "id", "e")
    Pq.buildIndex(store, "docs", vecs, "id", "e", slices = 4, subDim = 2)
    Bin.buildIndex(store, "docs", vecs, "id", "e")
    Ivf.buildIndex(store, "docs", vecs, "id", "e", k = 4)
    IvfPq.buildIndex(store, "docs", vecs, "id", "e", kCells = 4,
      slices = 4, subDim = 2)
    IvfSq.buildIndex(store, "docs", vecs, "id", "e", kCells = 4)
    IvfBin.buildIndex(store, "docs", vecs, "id", "e", kCells = 4)

    val codeTables = Seq(
      Fts.indexName("docs"), Trigram.indexName("docs"),
      Lsh.indexName("docs"), Sq.codesName("docs"), Pq.codesName("docs"),
      Bin.codesName("docs"), Ivf.indexName("docs"),
      IvfPq.codesName("docs"), IvfSq.codesName("docs"),
      IvfBin.codesName("docs"))
    // govern the base and every table the refreshes write, so the
    // whole INSERT (base + ten refreshes) stages into one epoch
    store.ensureGoverned(Seq("docs",
      Fts.statsName("docs"), Lsh.mapName("docs"), Lsh.paramsName("docs"),
      Ivf.mapName("docs"), IvfPq.mapName("docs"), IvfSq.mapName("docs"),
      IvfBin.mapName("docs")) ++ codeTables)
    assert(Doctor.check(store) === Seq.empty, "pre-insert invariants")
    val e1 = store.snapshot().epoch

    val eight = (1 to dims).map(d => s"0.${d}D").mkString("array(", ", ", ")")
    spark.sql("INSERT INTO graft.docs VALUES " +
      s"(100L, 'zebra quagga unique text', $eight)")

    assert(store.snapshot().epoch === e1 + 1,
      "base + ten index refreshes must land as ONE epoch when " +
        "everything is governed")
    codeTables.foreach { idx =>
      assert(store.read(idx).filter(col("pk") === 100L).count() > 0,
        s"$idx must cover the inserted pk")
    }
    assert(Doctor.check(store) === Seq.empty,
      "every invariant must hold with no manual maintenance step")
    // served, not just stored: FTS term, trigram substring, SQ ANN
    assert(Fts.search(spark, store, "docs", "quagga")
      .select(col("pk").cast("long")).as[Long].collect().toSeq === Seq(100L))
    assert(Trigram.substringSearch(store, "docs", "id", "full_text",
      "ebra quag").select(col("id").cast("long")).as[Long]
      .collect().toSeq === Seq(100L))
    val probe = Seq((100L, (1 to dims).map(d => s"0.$d".toDouble)))
      .toDF("qid", "qe")
    val top = Sq.annTopK(store, "docs", probe, "qid", "qe", k = 1)
    assert(top.filter(col("cand_id") === 100L).count() === 1L,
      "the inserted vector must be its own nearest neighbor")
  }

  test("healDiverged closes pk-set divergence from provenance: ghosts " +
    "retract, missing vector rows re-encode; idempotent; SQL CALL too") {
    val (_, store) = mountCatalog()
    store.ensureBucketed("docs", Seq("id"), 4)
    store.upsert("docs", corpus(16), Seq("id"))
    def vecs = store.read("docs")
      .select(col("id"), col("e").cast("array<double>").as("e"))
    Sq.buildIndex(store, "docs", vecs, "id", "e")
    Ivf.buildIndex(store, "docs", vecs, "id", "e", k = 4)
    assert(Doctor.check(store) === Seq.empty)

    // diverge both ways OUT OF BAND: library-upsert new rows without
    // refresh (missing from both indexes), bare-delete others (ghosts
    // stay in both indexes)
    store.upsert("docs", corpus(20).filter(col("id") >= 16), Seq("id"))
    store.deleteByPk("docs", Seq(1L, 2L).toDF("id"), Seq("id"))
    assert(Doctor.check(store).nonEmpty, "divergence must be visible")

    val healed = Doctor.healCoverage(store)
    assert(healed.nonEmpty)
    assert(Doctor.check(store) === Seq.empty,
      "ghosts + missing vector rows must heal in one pass")
    assert(Doctor.healCoverage(store) === Seq.empty, "idempotent")

    // the SQL surface reaches the same verb
    store.upsert("docs", corpus(22).filter(col("id") >= 20), Seq("id"))
    val viaSql = spark.sql("CALL graft.system.heal_coverage()")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(viaSql.exists(_._2.startsWith("missing:")), viaSql.mkString(", "))
    assert(Doctor.check(store) === Seq.empty)
  }

  test("missing or pk-mismatched provenance skips that family (write " +
    "still lands; Doctor names the divergence)") {
    val (_, store) = mountCatalog()
    store.ensureBucketed("t", Seq("id"), 2)
    val base = corpus(8).toDF("id", "full_text", "e")
    store.upsert("t", base, Seq("id"))
    Sq.buildIndex(store, "t",
      store.read("t").select(col("id"), col("e").cast("array<double>")
        .as("e")), "id", "e")
    // simulate a pre-provenance build: wrong pk in the recorded meta
    IvfDrift.recordTraining(store, Sq.codesName("t"),
      Map("table" -> "t", "family" -> "sq", "pk" -> "other", "emb" -> "e"))

    val (refreshed, skipped) = IndexMaintain.upsertMaintained(store, "t",
      Seq((50L, "fresh row", (0 until dims).map(_.toDouble)))
        .toDF("id", "full_text", "e"), Seq("id"))
    assert(refreshed === Seq.empty)
    assert(skipped === Seq("sq"))
    assert(store.read("t").filter(col("id") === 50L).count() === 1L,
      "the base write must land even when every family is skipped")
    assert(store.read(Sq.codesName("t")).filter(col("pk") === 50L).isEmpty)
    assert(Doctor.check(store).exists(_.table == "t"),
      "Doctor must name the coverage gap the skip left")
  }

  test("healWindow re-refreshes exactly the change feed's upserted pks: " +
    "a bypassed write's content-stale and missing index rows heal to a " +
    "from-scratch rebuild, at O(window) cost") {
    val (root, store) = mountCatalog()
    store.ensureBucketed("t", Seq("id"), 2)
    val base = corpus(8).toDF("id", "full_text", "e")
    store.upsert("t", base, Seq("id"))
    Fts.upsertWithIndexCols(store, "t", store.read("t").drop(store.BucketCol),
      "id", Seq("full_text"), buckets = 2)
    // buildIndex's frame IS the base upsert batch (replace semantics —
    // a projection would null-fill the other columns): pass full rows
    Sq.buildIndex(store, "t", store.read("t").drop(store.BucketCol),
      "id", "e")
    store.ensureGoverned(Seq("t"))
    val e1 = store.snapshot().epoch

    // a write that BYPASSES index maintenance: one changed doc
    // (content-stale postings) and one new doc (missing everywhere)
    store.upsert("t",
      Seq((3L, "totally rewritten text", (0 until dims).map(_ * 1.0)),
        (50L, "brand new doc", (0 until dims).map(_ * 2.0)))
        .toDF("id", "full_text", "e"), Seq("id"))
    val e2 = store.snapshot().epoch
    assert(store.read(Fts.indexName("t"))
      .filter(col("pk") === 3L && col("token") === "rewritten").isEmpty,
      "fixture: the bypassed write must have left the postings stale")

    val healed = IndexMaintain.healWindow(store, "t", e1, Some(e2))
    assert(healed.toMap.get("fts").contains(2L), s"got $healed")
    assert(healed.toMap.get("sq").contains(2L), s"got $healed")

    // postings now match a from-scratch rebuild of the same corpus
    val refStore = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft-imref").toString)
    Fts.upsertWithIndexCols(refStore, "ref",
      store.read("t").drop(store.BucketCol), "id", Seq("full_text"),
      buckets = 2)
    def postings(s: TableStore, idx: String) =
      s.read(idx).select(col("pk").cast("long"), col("token"), col("tf"),
        col("dl")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
    assert(postings(store, Fts.indexName("t")) ===
      postings(refStore, Fts.indexName("ref")),
      "healed postings must equal a from-scratch rebuild")
    assert(store.read(Sq.codesName("t")).filter(col("pk") === 50L)
      .count() === 1L, "the missing vector row re-encoded")
    assert(Doctor.check(store) === Seq.empty)

    // re-running is idempotent in effect; SQL surface works too
    spark.sql(s"CALL graft.system.heal_window('t', $e1, $e2)")
    assert(postings(store, Fts.indexName("t")) ===
      postings(refStore, Fts.indexName("ref")))
  }

  test("healWindow refuses LOUDLY on composite-pk and unbucketed " +
    "tables — 'nothing to do' would misreport both; CALL heal_window " +
    "surfaces the same error") {
    val (_, store) = mountCatalog()
    store.ensureBucketed("comp", Seq("a", "b"), 2)
    store.upsert("comp", Seq((1L, 2L, "v")).toDF("a", "b", "v"),
      Seq("a", "b"))
    store.ensureGoverned(Seq("comp"))
    val e = store.snapshot().epoch
    val err = intercept[IllegalArgumentException](
      IndexMaintain.healWindow(store, "comp", e - 1, Some(e)))
    assert(err.getMessage.contains("composite"), err.getMessage)
    val sqlErr = intercept[Exception](
      spark.sql(s"CALL graft.system.heal_window('comp', ${e - 1}, $e)")
        .collect())
    assert(sqlErr.getMessage.contains("composite") ||
      Option(sqlErr.getCause).exists(_.getMessage.contains("composite")),
      sqlErr.getMessage)

    store.overwrite("flat", Seq((1L, "v")).toDF("id", "v"))
    val err2 = intercept[IllegalArgumentException](
      IndexMaintain.healWindow(store, "flat", 0L, Some(e)))
    assert(err2.getMessage.contains("no declared bucket layout"),
      err2.getMessage)
  }

  test("FTS enforces the same pk-provenance rule as the _meta families: " +
    "an index built under a different key than the declared bucket pk " +
    "is skipped, never refreshed with the declared pk") {
    val (_, store) = mountCatalog()
    // index built while the table keyed on `alt` — the FTS stats row
    // records that pk
    val rows = (0 until 6).map(i => (i.toLong, i.toLong + 100L, s"word$i body"))
      .toDF("id", "alt", "full_text")
    store.overwrite("t", rows)
    Fts.upsertWithIndexCols(store, "t", rows, "alt", Seq("full_text"),
      buckets = 2)
    // the table is then bucketed on a DIFFERENT column
    store.bucketize("t", Seq("id"), 2)

    val before = store.read(Fts.indexName("t")).count()
    val (refreshed, skipped) = IndexMaintain.upsertMaintained(store, "t",
      Seq((50L, 150L, "fresh row")).toDF("id", "alt", "full_text"), Seq("id"))
    assert(!refreshed.contains("fts"),
      "an FTS index keyed on another column must not refresh under the " +
        "declared bucket pk — that mixes key domains in the postings")
    assert(skipped.contains("fts"))
    assert(store.read(Fts.indexName("t")).count() === before,
      "the skipped index must be untouched")
    assert(store.read("t").filter(col("id") === 50L).count() === 1L)

    // re-built under the declared pk, the family re-enrolls
    Fts.upsertWithIndexCols(store, "t", store.read("t").drop(store.BucketCol),
      "id", Seq("full_text"), buckets = 2)
    val (refreshed2, _) = IndexMaintain.upsertMaintained(store, "t",
      Seq((51L, 151L, "another row")).toDF("id", "alt", "full_text"),
      Seq("id"))
    assert(refreshed2.contains("fts"))
    assert(store.read(Fts.indexName("t"))
      .filter(col("pk") === 51L).count() > 0L)
  }

  test("LEGACY FTS stats (predating pk capture) adopt the declared pk " +
    "after a one-time postings⊆base verification — pre-upgrade indexes " +
    "keep refreshing on SQL writes; a mismatched key domain stays " +
    "skipped") {
    val (_, store) = mountCatalog()
    store.ensureBucketed("t", Seq("id"), 2)
    val rows = (0 until 6).map(i => (i.toLong, s"word$i body"))
      .toDF("id", "full_text")
    store.upsert("t", rows, Seq("id"))
    Fts.upsertWithIndexCols(store, "t", store.read("t").drop(store.BucketCol),
      "id", Seq("full_text"), buckets = 2)
    // simulate a pre-upgrade store: strip the pk column from the
    // stats row (the exact shape every index built before pk capture
    // carries)
    store.overwrite(Fts.statsName("t"),
      store.read(Fts.statsName("t")).drop("pk"))
    assert(Fts.statsProvenance(store, "t")._2.isEmpty, "fixture: legacy")

    val (refreshed, skipped) = IndexMaintain.upsertMaintained(store, "t",
      Seq((50L, "fresh zebra row")).toDF("id", "full_text"), Seq("id"))
    assert(refreshed.contains("fts"),
      s"a legacy index whose postings match the declared key domain " +
        s"must keep refreshing (skipped=$skipped)")
    assert(store.read(Fts.indexName("t"))
      .filter(col("pk") === 50L && col("token") === "zebra").count() === 1L)
    assert(Fts.statsProvenance(store, "t")._2.contains("id"),
      "adoption must STAMP the stats row so the O(index) check runs once")

    // mismatched key domain: postings keyed on values outside the
    // declared pk's value set must NOT adopt
    val (_, store2) = mountCatalog()
    val rows2 = (0 until 6).map(i => (i.toLong, i.toLong + 100L, s"word$i x"))
      .toDF("id", "alt", "full_text")
    store2.overwrite("t2", rows2)
    Fts.upsertWithIndexCols(store2, "t2", rows2, "alt", Seq("full_text"),
      buckets = 2)
    store2.overwrite(Fts.statsName("t2"),
      store2.read(Fts.statsName("t2")).drop("pk"))
    store2.bucketize("t2", Seq("id"), 2)
    val before = store2.read(Fts.indexName("t2")).count()
    val (refreshed2, skipped2) = IndexMaintain.upsertMaintained(store2, "t2",
      Seq((50L, 150L, "fresh row")).toDF("id", "alt", "full_text"), Seq("id"))
    assert(!refreshed2.contains("fts") && skipped2.contains("fts"),
      "an alien key domain must never adopt the declared pk")
    assert(store2.read(Fts.indexName("t2")).count() === before)
    assert(Fts.statsProvenance(store2, "t2")._2
      .contains(Fts.PkMismatchSentinel),
      "a failed verification stamps the mismatch sentinel so the " +
        "O(index) check never re-runs per write")
    // stamped failure keeps skipping (now at O(1)) ...
    val (refreshed3, skipped3) = IndexMaintain.upsertMaintained(store2, "t2",
      Seq((51L, 151L, "next row")).toDF("id", "alt", "full_text"), Seq("id"))
    assert(!refreshed3.contains("fts") && skipped3.contains("fts"))
    // ... and a rebuild under the RIGHT key overwrites the sentinel
    Fts.upsertWithIndexCols(store2, "t2",
      store2.read("t2").drop(store2.BucketCol), "id", Seq("full_text"),
      buckets = 2)
    assert(Fts.statsProvenance(store2, "t2")._2.contains("id"))
  }

  test("LEGACY adoption refuses an OVERLAPPING alien key domain — the " +
    "postings⊆base subset check alone cannot see it, the sampled " +
    "content check must (two integer surrogates both starting at 0)") {
    val (_, store) = mountCatalog()
    // id and alt share the exact value domain 0..5 (the common two-
    // surrogate-keys shape), but each value names a DIFFERENT row —
    // an index built under alt passes the subset check under id
    // trivially, yet the base row AT id=k carries different text than
    // the row the index keyed at alt=k
    val rows = (0 until 6).map(i =>
      (i.toLong, ((i + 3) % 6).toLong, s"word$i body$i"))
      .toDF("id", "alt", "full_text")
    store.overwrite("t3", rows)
    Fts.upsertWithIndexCols(store, "t3", rows, "alt", Seq("full_text"),
      buckets = 2)
    store.overwrite(Fts.statsName("t3"),
      store.read(Fts.statsName("t3")).drop("pk"))
    store.bucketize("t3", Seq("id"), 2)
    val before = store.read(Fts.indexName("t3")).count()
    val (refreshed, skipped) = IndexMaintain.upsertMaintained(store, "t3",
      Seq((50L, 150L, "fresh row")).toDF("id", "alt", "full_text"),
      Seq("id"))
    assert(!refreshed.contains("fts") && skipped.contains("fts"),
      "an overlapping-but-wrong key domain must never adopt — mixing " +
        "key domains in the postings is what the guard exists to prevent")
    assert(store.read(Fts.indexName("t3")).count() === before,
      "a refused adoption must not touch the postings")
    assert(Fts.statsProvenance(store, "t3")._2
      .contains(Fts.PkMismatchSentinel))
  }

  test("LEGACY adoption refuses an INCOMPLETE index — a base row the " +
    "index never saw is visible because the sample draws from BASE " +
    "pks, not the index's own") {
    val (_, store) = mountCatalog()
    store.ensureBucketed("t5", Seq("id"), 2)
    val rows = (0 until 6).map(i => (i.toLong, s"word$i body"))
      .toDF("id", "full_text")
    store.upsert("t5", rows, Seq("id"))
    Fts.upsertWithIndexCols(store, "t5",
      store.read("t5").drop(store.BucketCol), "id", Seq("full_text"),
      buckets = 2)
    store.overwrite(Fts.statsName("t5"),
      store.read(Fts.statsName("t5")).drop("pk"))
    // a bypassing write INSERTS a new row the skipped index never
    // indexed — a sample drawn from the index's own pks could never
    // see it; the base-driven sample must
    store.upsert("t5", Seq((50L, "unindexed zebra tokens"))
      .toDF("id", "full_text"), Seq("id"))
    val before = store.read(Fts.indexName("t5")).count()
    val (refreshed, skipped) = IndexMaintain.upsertMaintained(store, "t5",
      Seq((60L, "fresh row")).toDF("id", "full_text"), Seq("id"))
    assert(!refreshed.contains("fts") && skipped.contains("fts"),
      "a base row entirely missing from the index must refuse adoption")
    assert(store.read(Fts.indexName("t5")).count() === before)
    assert(Fts.statsProvenance(store, "t5")._2
      .contains(Fts.PkMismatchSentinel))
  }

  test("LEGACY adoption refuses a CONTENT-STALE index (right key, rows " +
    "upserted while it was skipped) — adopting would leave those rows " +
    "permanently wrong; the rebuild path heals wholesale") {
    val (_, store) = mountCatalog()
    store.ensureBucketed("t4", Seq("id"), 2)
    val rows = (0 until 6).map(i => (i.toLong, s"word$i body"))
      .toDF("id", "full_text")
    store.upsert("t4", rows, Seq("id"))
    Fts.upsertWithIndexCols(store, "t4",
      store.read("t4").drop(store.BucketCol), "id", Seq("full_text"),
      buckets = 2)
    store.overwrite(Fts.statsName("t4"),
      store.read(Fts.statsName("t4")).drop("pk"))
    // a bypassing write changes base content the skipped index missed
    store.upsert("t4", Seq((2L, "replaced different text"))
      .toDF("id", "full_text"), Seq("id"))
    val (refreshed, skipped) = IndexMaintain.upsertMaintained(store, "t4",
      Seq((50L, "fresh row")).toDF("id", "full_text"), Seq("id"))
    assert(!refreshed.contains("fts") && skipped.contains("fts"),
      "stale content must refuse adoption, not adopt-and-stay-wrong")
    assert(Fts.statsProvenance(store, "t4")._2
      .contains(Fts.PkMismatchSentinel))
  }
}
