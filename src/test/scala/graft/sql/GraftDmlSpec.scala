package graft.sql

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.store.{Doctor, Fts, Retract, Sq, TableStore}

/** SQL UPDATE and MERGE INTO through the extensions seam
  * ([[GraftDml]] via `graft.functions.GraftExtensions`, which the
  * shared test session is built with — the same config users are told
  * to set): the analyzed plans route through the store's upsert /
  * retraction verbs, with the guardrail surface pinned alongside the
  * happy paths.
  */
class GraftDmlSpec extends SparkSpec {
  import spark.implicits._

  private def mountCatalog(): (String, TableStore) = {
    val root = java.nio.file.Files.createTempDirectory("graft-dml").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", root)
    (root, new TableStore(spark, root))
  }

  test("SQL UPDATE on a bucketed table: matched rows upsert by pk in one " +
    "epoch; prior epochs still time-travel; NULL predicates keep rows") {
    val (_, store) = mountCatalog()
    store.ensureBucketed("t", Seq("id"), 4)
    store.ensureGoverned(Seq("t"))
    store.upsert("t",
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, null, 40L))
        .toDF("id", "v", "n"), Seq("id"))
    val e1 = store.snapshot().epoch

    spark.sql("UPDATE graft.t SET n = n + 100 WHERE v = 'a'")

    val e2 = store.snapshot().epoch
    assert(e2 === e1 + 1, "a bucketed UPDATE is one upsert = one epoch")
    assert(spark.sql("SELECT id, n FROM graft.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 110L), (2L, 120L), (3L, 30L), (4L, 40L)),
      "only v='a' rows update; the NULL-v row keeps SQL three-valued " +
        "WHERE semantics")
    assert(spark.sql(
      s"SELECT sum(n) FROM graft.t VERSION AS OF $e1")
      .collect().head.getLong(0) === 100L,
      "time travel must serve the pre-UPDATE rows")

    // expressions over several columns + builtin functions work (the
    // assignment is the analyzed expression, not a re-parse)
    spark.sql("UPDATE graft.t SET v = concat(coalesce(v, '?'), " +
      "cast(n as string)) WHERE id >= 3")
    assert(spark.sql("SELECT v FROM graft.t WHERE id = 4")
      .collect().head.getString(0) === "?40")
  }

  test("UPDATE guardrails: pk assignment and flat-but-indexed refused " +
    "loudly and never write; literals ride Spark's assignment coercion") {
    val (_, store) = mountCatalog()
    store.ensureBucketed("t", Seq("id"), 4)
    store.ensureGoverned(Seq("t"))
    store.upsert("t", Seq((1L, "a", 10L)).toDF("id", "v", "n"), Seq("id"))
    val e1 = store.snapshot().epoch

    val pkErr = intercept[Exception](
      spark.sql("UPDATE graft.t SET id = id + 1 WHERE v = 'a'"))
    assert(pkErr.getMessage.contains("pk"), pkErr.getMessage)

    assert(store.snapshot().epoch === e1, "failed UPDATEs must not write")
    assert(spark.sql("SELECT v, n FROM graft.t").collect().map(r =>
      (r.getString(0), r.getLong(1))).toSeq === Seq(("a", 10L)))

    // a cross-type literal rides Spark's own assignment coercion (the
    // analyzer inserts the cast before the rule ever sees the plan);
    // the engine's lossless-cast guard stays as defense-in-depth for
    // assignments the analyzer leaves uncast
    spark.sql("UPDATE graft.t SET v = 42 WHERE id = 1")
    assert(spark.sql("SELECT v FROM graft.t WHERE id = 1")
      .collect().head.getString(0) === "42")

    // flat table with a maintained per-pk index: no declared key to
    // upsert by — refused with the library pointer (same rule as DELETE)
    store.overwrite("flat", (0 until 6).map(i => (i.toLong, s"word$i body"))
      .toDF("id", "full_text"))
    Fts.upsertWithIndexCols(store, "flat", store.read("flat"), "id",
      Seq("full_text"), buckets = 2)
    val refuse = intercept[Exception](
      spark.sql("UPDATE graft.flat SET full_text = 'x' WHERE id = 1"))
    assert(refuse.getMessage.contains("index"), refuse.getMessage)
    assert(Retract.indexTablesOf(store, "flat").nonEmpty)
  }

  test("UPDATE on a flat un-indexed table: whole-table rewrite through " +
    "one swap; unmatched and NULL-predicate rows ride through unchanged") {
    val (_, store) = mountCatalog()
    store.ensureGoverned(Seq("plain"))
    store.overwrite("plain", Seq((1L, "x", 1L), (2L, "y", 2L), (3L, null, 3L))
      .toDF("id", "v", "n"))
    val e1 = store.snapshot().epoch
    spark.sql("UPDATE graft.plain SET n = -n WHERE v = 'x'")
    assert(store.snapshot().epoch === e1 + 1)
    assert(spark.sql("SELECT id, n FROM graft.plain ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, -1L), (2L, 2L), (3L, 3L)))
  }

  test("MERGE INTO, full clause surface on an indexed governed table: " +
    "deletes cascade and upserts REFRESH every index (the trigger " +
    "contract) — the whole merge is ONE epoch, Doctor green throughout") {
    val (_, store) = mountCatalog()
    val dims = 8
    store.ensureBucketed("docs", Seq("id"), 4)
    store.upsert("docs", (0 until 24).map { i =>
      (i.toLong, s"common word$i text",
        (0 until dims).map(d => math.sin(i * dims + d) * 3.0))
    }.toDF("id", "full_text", "e"), Seq("id"))
    Fts.upsertWithIndexCols(store, "docs", store.read("docs"), "id",
      Seq("full_text"), buckets = 4)
    Sq.buildIndex(store, "docs", store.read("docs"), "id", "e")
    store.ensureGoverned(Seq("docs", Fts.indexName("docs"),
      Fts.statsName("docs"), Sq.codesName("docs")))
    val e1 = store.snapshot().epoch

    val eight = "array(0.1D, 0.2D, 0.3D, 0.4D, 0.5D, 0.6D, 0.7D, 0.8D)"
    spark.sql(
      s"""MERGE INTO graft.docs t
        |USING (
        |  SELECT 3L AS id, 'rewritten text three' AS full_text, $eight AS e
        |  UNION ALL SELECT 7L, 'irrelevant', $eight
        |  UNION ALL SELECT 100L, 'fresh inserted row', $eight
        |) s
        |ON t.id = s.id
        |WHEN MATCHED AND s.id = 7 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET full_text = s.full_text
        |WHEN NOT MATCHED THEN INSERT (id, full_text, e)
        |  VALUES (s.id, s.full_text, s.e)
        |WHEN NOT MATCHED BY SOURCE AND t.id = 11 THEN DELETE
        |""".stripMargin)

    val e2 = store.snapshot().epoch
    assert(e2 === e1 + 1,
      "a fully-governed MERGE (deletes + upserts) must be ONE epoch")
    // 24 - deleted(7, 11) + inserted(100)
    assert(spark.sql("SELECT count(*) FROM graft.docs")
      .collect().head.getLong(0) === 23L)
    assert(spark.sql("SELECT full_text FROM graft.docs WHERE id = 3")
      .collect().head.getString(0) === "rewritten text three")
    assert(spark.sql("SELECT e[0] FROM graft.docs WHERE id = 100")
      .collect().head.getDouble(0) === 0.1)
    // deleted pks retracted from EVERY index (the cascade), atomically
    // with the base
    Seq(Fts.indexName("docs"), Sq.codesName("docs")).foreach { idx =>
      assert(store.read(idx).filter(col("pk").isin(7L, 11L)).isEmpty,
        s"$idx still ranks merged-away pks")
    }
    // time travel serves the pre-merge state
    assert(spark.sql(
      s"SELECT count(*) FROM graft.docs VERSION AS OF $e1 " +
        "WHERE id IN (7, 11)").collect().head.getLong(0) === 2L)

    // updated/inserted rows refreshed their postings and codes IN the
    // merge (IndexMaintain — the reference's FTS-trigger contract,
    // generalized): every Doctor invariant holds with no manual step,
    // and the refresh landed in the SAME epoch as the base rows (the
    // e2 === e1 + 1 assertion above already proved that)
    assert(Doctor.check(store) === Seq.empty,
      "MERGE must leave base + every index consistent on its own")
    // the new row is SERVED: FTS finds the inserted text, the SQ codes
    // cover the inserted vector
    assert(Fts.search(spark, store, "docs", "fresh").select(col("pk").cast("long"))
      .as[Long].collect().toSeq === Seq(100L),
      "the inserted row must be searchable immediately")
    assert(store.read(Sq.codesName("docs"))
      .filter(col("pk").isin(3L, 100L)).count() === 2L)
    // the updated text replaced its postings (old tokens retract)
    assert(Fts.search(spark, store, "docs", "word3").isEmpty,
      "the updated row's STALE postings must be gone")
    // the change feed still names exactly the merged rows
    val ch = store.readChangesSince("docs", e1, e2, Seq("id"))
    val touched = ch.filter(col("_change_type") =!= "delete")
      .select(col("id").cast("long")).as[Long].collect().toSeq.sorted
    assert(touched === Seq(3L, 100L))
  }

  test("MERGE guardrails: cardinality violation, duplicate-pk batch, " +
    "unsupported schema evolution — refused; nothing writes") {
    val (_, store) = mountCatalog()
    store.ensureBucketed("t", Seq("id"), 4)
    store.ensureGoverned(Seq("t"))
    store.upsert("t", Seq((1L, 10L), (2L, 20L)).toDF("id", "n"), Seq("id"))
    val e1 = store.snapshot().epoch

    // two source rows hit target id=1 with a matched clause present
    val card = intercept[Exception](spark.sql(
      """MERGE INTO graft.t USING
        |(SELECT 1L AS id, 1L AS n UNION ALL SELECT 1L, 2L) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET n = s.n""".stripMargin))
    assert(card.getMessage.toLowerCase.contains("cardinality"),
      card.getMessage)

    // a non-pk ON condition that would insert the same pk twice
    val dup = intercept[Exception](spark.sql(
      """MERGE INTO graft.t USING
        |(SELECT 9L AS id, 100L AS n UNION ALL SELECT 9L, 200L) s
        |ON t.n = s.n
        |WHEN NOT MATCHED THEN INSERT (id, n) VALUES (s.id, s.n)""".stripMargin))
    assert(dup.getMessage.toLowerCase.contains("duplicate"), dup.getMessage)

    assert(store.snapshot().epoch === e1, "failed MERGEs must not write")
    assert(spark.sql("SELECT sum(n) FROM graft.t")
      .collect().head.getLong(0) === 30L)
  }

  test("MERGE UPDATE SET * / INSERT * on a bucketed table: the pk " +
    "assignment is provably the ON join key — exempt, not refused") {
    val (_, store) = mountCatalog()
    store.ensureBucketed("t", Seq("id"), 4)
    store.ensureGoverned(Seq("t"))
    store.upsert("t", Seq((1L, "a", 10L), (2L, "b", 20L))
      .toDF("id", "v", "n"), Seq("id"))
    spark.sql(
      """MERGE INTO graft.t t
        |USING (SELECT 2L AS id, 'B' AS v, 99L AS n
        |       UNION ALL SELECT 9L, 'z', 1L) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql("SELECT id, v, n FROM graft.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq === Seq((1L, "a", 10L), (2L, "B", 99L), (9L, "z", 1L)))
    // an ACTUAL pk reassignment still refuses
    val err = intercept[Exception](spark.sql(
      """MERGE INTO graft.t t USING (SELECT 2L AS id) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET id = s.id + 1""".stripMargin))
    assert(err.getMessage.contains("pk"), err.getMessage)
  }

  test("DML on a declared-but-empty table: CTAS'd schema serves the " +
    "target, a no-match UPDATE is a no-op, MERGE seeds the first rows") {
    val (_, store) = mountCatalog()
    spark.sql("CREATE TABLE graft.kv (id BIGINT, v STRING) " +
      "TBLPROPERTIES('pk'='id','buckets'='2')")

    spark.sql("UPDATE graft.kv SET v = 'x' WHERE id = 1") // zero rows match
    assert(spark.sql("SELECT count(*) FROM graft.kv")
      .collect().head.getLong(0) === 0L)

    spark.sql(
      """MERGE INTO graft.kv t
        |USING (SELECT 1L AS id, 'a' AS v UNION ALL SELECT 2L, 'b') s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql("SELECT id, v FROM graft.kv ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (2L, "b")),
      "MERGE must seed an empty declared table through its insert clause")
    assert(store.bucketLayoutOf("kv") === Some((2, Seq("id"))))
  }

  test("struct-field assignment: UPDATE SET s.x patches the field in " +
    "place; sibling fields survive; guardrails hold") {
    val (_, store) = mountCatalog()
    store.ensureBucketed("t", Seq("id"), 2)
    store.ensureGoverned(Seq("t"))
    store.upsert("t", spark.sql(
      "SELECT * FROM VALUES (1L, named_struct('v', 'a', 'k', 10L), 1L), " +
        "(2L, named_struct('v', 'b', 'k', 20L), 2L) AS t(id, s, n)"),
      Seq("id"))

    spark.sql("UPDATE graft.t SET s.v = 'A', n = n + 1 WHERE id = 1")
    val r = spark.sql("SELECT s.v, s.k, n FROM graft.t WHERE id = 1")
      .collect().head
    assert((r.getString(0), r.getLong(1), r.getLong(2)) === ("A", 10L, 2L),
      "the named field patches; its sibling and the other column hold")

    // MERGE updates patch fields too
    spark.sql(
      """MERGE INTO graft.t t USING (SELECT 2L AS id, 99L AS k2) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.s.k = s.k2""".stripMargin)
    assert(spark.sql("SELECT s.v, s.k FROM graft.t WHERE id = 2")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("b", 99L)))

    // mixing whole-column and field assignment to one column refuses
    val mix = intercept[Exception](spark.sql(
      "UPDATE graft.t SET s = named_struct('v', 'x', 'k', 1L), " +
        "s.k = 2 WHERE id = 1"))
    assert(mix.getMessage.toLowerCase.contains("mix") ||
      mix.getMessage.toLowerCase.contains("conflict"), mix.getMessage)
  }

  test("subqueries and catalog tables compose: UPDATE WHERE IN " +
    "(SELECT ...), MERGE USING graft.<table> — the captured analyzed " +
    "plans carry their subtrees") {
    val (_, store) = mountCatalog()
    store.ensureBucketed("t", Seq("id"), 2)
    store.ensureGoverned(Seq("t", "allow"))
    store.upsert("t", Seq((1L, 10L), (2L, 20L), (3L, 30L))
      .toDF("id", "n"), Seq("id"))
    store.upsert("allow", Seq(Tuple1(2L), Tuple1(3L)).toDF("id"), Seq("id"))

    spark.sql(
      "UPDATE graft.t SET n = n * 2 WHERE id IN (SELECT id FROM graft.allow)")
    assert(spark.sql("SELECT id, n FROM graft.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 10L), (2L, 40L), (3L, 60L)))

    spark.sql(
      "MERGE INTO graft.t t USING graft.allow s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET n = t.n + 1")
    assert(spark.sql("SELECT sum(n) FROM graft.t")
      .collect().head.getLong(0) === 112L)
  }

  test("composite-pk tables: UPDATE upserts by both keys; MERGE deletes " +
    "ride the bucketed deleteByPk; pk assignment still refused") {
    val (_, store) = mountCatalog()
    store.ensureBucketed("c", Seq("a", "b"), 2)
    store.ensureGoverned(Seq("c"))
    store.upsert("c",
      Seq((1L, 1L, 10L), (1L, 2L, 20L), (2L, 1L, 30L))
        .toDF("a", "b", "n"), Seq("a", "b"))

    spark.sql("UPDATE graft.c SET n = n + 1 WHERE a = 1")
    assert(spark.sql("SELECT sum(n) FROM graft.c")
      .collect().head.getLong(0) === 62L)

    val e1 = store.snapshot().epoch
    spark.sql(
      """MERGE INTO graft.c t
        |USING (SELECT 1L AS a, 2L AS b, 99L AS n
        |       UNION ALL SELECT 3L, 3L, 7L) s
        |ON t.a = s.a AND t.b = s.b
        |WHEN MATCHED THEN DELETE
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(store.snapshot().epoch === e1 + 1,
      "composite-pk merge (delete + insert) is one governed epoch")
    assert(spark.sql("SELECT a, b, n FROM graft.c ORDER BY a, b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      === Seq((1L, 1L, 11L), (2L, 1L, 30L), (3L, 3L, 7L)))

    val pkErr = intercept[Exception](spark.sql(
      "UPDATE graft.c SET b = b + 1 WHERE a = 2"))
    assert(pkErr.getMessage.contains("pk"), pkErr.getMessage)
  }

  test("MERGE on a flat un-indexed table: single-swap full rebuild with " +
    "first-matching-clause-wins semantics") {
    val (_, store) = mountCatalog()
    store.ensureGoverned(Seq("plain"))
    store.overwrite("plain",
      Seq((1L, "keep"), (2L, "update-me"), (3L, "delete-me"))
        .toDF("id", "v"))
    val e1 = store.snapshot().epoch
    spark.sql(
      """MERGE INTO graft.plain t
        |USING (SELECT 2L AS id, 'updated' AS v
        |       UNION ALL SELECT 3L, 'x'
        |       UNION ALL SELECT 4L, 'inserted') s
        |ON t.id = s.id
        |WHEN MATCHED AND t.id = 3 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(store.snapshot().epoch === e1 + 1)
    assert(spark.sql("SELECT id, v FROM graft.plain ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "keep"), (2L, "updated"), (4L, "inserted")))
  }

  test("MERGE WITH SCHEMA EVOLUTION: a source-only column evolves the " +
    "table through the catalog's ALTER hook; old epochs keep the old " +
    "shape; the CDC feed serves the union schema; indexes unaffected") {
    import graft.store.Fts
    val (_, store) = mountCatalog()
    store.ensureBucketed("t", Seq("id"), 2)
    store.upsert("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"), Seq("id"))
    Fts.upsertWithIndexCols(store, "t",
      store.read("t").drop(store.BucketCol).withColumn("v", col("v")),
      "id", Seq("v"), buckets = 2)
    store.ensureGoverned(Seq("t", Fts.indexName("t"), Fts.statsName("t")))
    val e1 = store.snapshot().epoch

    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO graft.t t
        |USING (SELECT 2L AS id, 'B' AS v, 7L AS score
        |       UNION ALL SELECT 9L, 'z', 3L) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

    assert(spark.sql("SELECT id, v, score FROM graft.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq ===
      Seq((1L, "a", -1L), (2L, "B", 7L), (9L, "z", 3L)),
      "the source-only column lands; untouched rows null-fill")
    // the pre-evolution epoch time-travels with the OLD shape
    assert(!spark.sql(s"SELECT * FROM graft.t VERSION AS OF $e1")
      .columns.contains("score"))
    // the CDC feed serves the union schema across the evolution
    val e2 = store.snapshot().epoch
    val feed = store.readChangesSince("t", e1, e2, Seq("id"))
    assert(feed.columns.contains("score"))
    assert(feed.filter(col("id") === 9L).select("score")
      .collect().head.getLong(0) === 3L)
    // the FTS index refreshed with the merge and is untouched by the
    // new column
    assert(store.read(Fts.indexName("t"))
      .filter(col("pk") === 9L).count() > 0L)
    // a second evolving merge is idempotent on the schema (the column
    // now exists — no further ALTER)
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO graft.t t
        |USING (SELECT 1L AS id, 'A' AS v, 5L AS score) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(spark.sql("SELECT score FROM graft.t WHERE id = 1")
      .collect().head.getLong(0) === 5L)
  }

  test("flat MERGE with ONLY not-matched clauses: a target row matched " +
    "by several source rows survives exactly once (no silent duplication); " +
    "with matched clauses present the cardinality rule still refuses") {
    val (_, store) = mountCatalog()
    store.ensureGoverned(Seq("plain"))
    store.overwrite("plain", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))

    // id=1 appears twice in the source; standard MERGE with only a
    // NOT MATCHED clause leaves the matched target row untouched —
    // once, not once per match
    spark.sql(
      """MERGE INTO graft.plain t
        |USING (SELECT 1L AS id, 'x' AS v
        |       UNION ALL SELECT 1L, 'y'
        |       UNION ALL SELECT 9L, 'new') s
        |ON t.id = s.id
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql("SELECT id, v FROM graft.plain ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (2L, "b"), (9L, "new")),
      "the doubly-matched row must appear exactly once, unchanged")

    // the flat path enforces the same cardinality rule as the
    // bucketed one when matched clauses DO exist
    val card = intercept[Exception](spark.sql(
      """MERGE INTO graft.plain t
        |USING (SELECT 2L AS id, 'p' AS v UNION ALL SELECT 2L, 'q') s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin))
    assert(card.getMessage.toLowerCase.contains("cardinality"),
      card.getMessage)
    assert(spark.sql("SELECT count(*) FROM graft.plain")
      .collect().head.getLong(0) === 3L, "failed MERGEs must not write")
  }
}
