package graft.sql

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.store.TableStore

/** Governed tables through `spark.sql`: the V2 catalog resolves names,
  * serves epoch time travel (`VERSION AS OF`), and routes INSERT
  * through the store's own write discipline.
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  // Spark caches the catalog INSTANCE on first reference; the catalog
  // re-reads its root from the live conf per call (tested below), so a
  // fresh root per test is just a conf set
  private def mountCatalog(): (String, TableStore) = {
    val root = java.nio.file.Files.createTempDirectory("graft-cat").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", root)
    (root, new TableStore(spark, root))
  }

  test("re-rooting: a conf change points the cached catalog at a new store") {
    val (_, a) = mountCatalog()
    a.ensureGoverned(Seq("t"))
    a.upsert("t", Seq((1L, "A")).toDF("id", "v"), Seq("id"))
    assert(spark.sql("SELECT v FROM graft.t").collect().head.getString(0)
      === "A")
    val (_, b) = mountCatalog() // same catalog name, new root
    b.ensureGoverned(Seq("t"))
    b.upsert("t", Seq((1L, "B")).toDF("id", "v"), Seq("id"))
    assert(spark.sql("SELECT v FROM graft.t").collect().head.getString(0)
      === "B",
      "the cached catalog instance must follow the live conf root")
  }

  test("SELECT by name: projection, filter, aggregate over a governed table") {
    val (_, store) = mountCatalog()
    store.ensureBucketed("docs", Seq("id"), 4)
    store.ensureGoverned(Seq("docs"))
    store.upsert("docs",
      (0 until 20).map(i => (i.toLong, s"v$i", i % 3)).toDF("id", "v", "g"),
      Seq("id"))

    val rows = spark.sql(
      "SELECT id, v FROM graft.docs WHERE g = 1 AND id < 10 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq === Seq(1L, 4L, 7L).map(i => (i, s"v$i")))

    val agg = spark.sql(
      "SELECT g, count(*) AS n FROM graft.docs GROUP BY g ORDER BY g")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(agg.toSeq === Seq((0, 7L), (1, 7L), (2, 6L)))

    val tables = spark.sql("SHOW TABLES IN graft")
      .collect().map(_.getString(1)).toSet
    assert(tables.contains("docs"))

    // zero-column projection (the scan's keep-one-column fallback)
    assert(spark.sql("SELECT count(*) FROM graft.docs")
      .collect().head.getLong(0) === 20L)
  }

  test("VERSION AS OF maps to epochs: time travel across an upsert and a delete") {
    val (_, store) = mountCatalog()
    store.ensureGoverned(Seq("t"))
    store.upsert("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"), Seq("id"))
    val e1 = store.snapshot().epoch
    store.upsert("t", Seq((2L, "b2"), (3L, "c")).toDF("id", "v"), Seq("id"))
    store.deleteByPk("t", Seq(1L).toDF("id"), Seq("id"))

    def rowsAt(clause: String): Set[(Long, String)] =
      spark.sql(s"SELECT id, v FROM graft.t $clause")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    assert(rowsAt(s"VERSION AS OF $e1") === Set((1L, "a"), (2L, "b")),
      "time travel must serve the pinned epoch's rows")
    assert(rowsAt("") === Set((2L, "b2"), (3L, "c")))

    // a TAG is a named epoch — usable wherever a version goes
    store.tagEpoch("tt-rel", Some(e1))
    assert(rowsAt("VERSION AS OF 'tt-rel'") === Set((1L, "a"), (2L, "b")),
      "tag-name time travel must resolve through the release tags")
  }

  test("INSERT INTO: bucketed upsert-by-pk, flat merge, flat OVERWRITE") {
    val (_, store) = mountCatalog()
    store.ensureBucketed("b", Seq("id"), 4)
    store.ensureGoverned(Seq("b", "f"))
    store.upsert("b", Seq((1L, "x")).toDF("id", "v"), Seq("id"))
    store.overwrite("f", Seq((1L, "x")).toDF("id", "v"))
    val e0 = store.snapshot().epoch

    // bucketed: INSERT is the store's upsert — same pk replaces
    spark.sql("INSERT INTO graft.b VALUES (1, 'x2'), (2, 'y')")
    assert(store.read("b").select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
      === Set((1L, "x2"), (2L, "y")))

    // flat: INSERT merges (append semantics on the swap table)
    spark.sql("INSERT INTO graft.f VALUES (2, 'y')")
    assert(store.read("f").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSet === Set((1L, "x"), (2L, "y")))

    // flat: INSERT OVERWRITE replaces
    spark.sql("INSERT OVERWRITE graft.f VALUES (9, 'z')")
    assert(store.read("f").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSet === Set((9L, "z")))

    // writes through SQL are ordinary commits: the change feed sees them
    val feed = store.readChangesSince("b", e0, store.snapshot().epoch,
      Seq("id")).collect()
    assert(feed.nonEmpty)
  }

  test("SQL join over a small governed dim table broadcasts (AQE runtime)") {
    val (_, store) = mountCatalog()
    store.ensureGoverned(Seq("dim", "fact"))
    store.overwrite("dim", Seq((0L, "x"), (1L, "y")).toDF("k", "label"))
    store.overwrite("fact",
      (0 until 5000).map(i => (i.toLong, i.toLong % 2)).toDF("id", "k"))

    // static CBO cannot see through V1ScanWrapper (see GraftV1Scan's
    // estimateStatistics note) — the broadcast decision is AQE's,
    // from measured shuffle sizes, so assert the EXECUTED final plan
    val q = spark.sql(
      "SELECT f.id, d.label FROM graft.fact f JOIN graft.dim d ON f.k = d.k")
    assert(q.collect().length === 5000)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small governed table did not broadcast at runtime:\n$plan")
  }

  test("metadata tables: $history ops, $files manifest, $tags, $cursors") {
    val (_, store) = mountCatalog()
    store.ensureBucketed("m", Seq("id"), 4)
    store.ensureGoverned(Seq("m"))
    store.upsert("m", Seq((1L, "a"), (2L, "b")).toDF("id", "v"), Seq("id"))
    store.compact("m")
    store.refreshFileStats("m") // opt into the manifest-backed $files
    store.tagEpoch("m-release")
    graft.store.EpochFollower.consumeNew(store, "m", "meta-spec")(_ => ())

    val hist = spark.sql(
      "SELECT epoch, op FROM graft.`m$history` ORDER BY epoch")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(hist.map(_._2).contains("upsert"))
    assert(hist.map(_._2).contains("compact"))
    assert(hist.map(_._1).distinct.length === hist.length,
      "history must carry one row per changing commit")

    val files = spark.sql("SELECT file FROM graft.`m$files`")
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("/m/")))

    val tags = spark.sql("SELECT tag, epoch FROM graft.`m$tags`")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tags.contains("m-release"))

    val cursors = spark.sql(
      "SELECT consumer, epoch FROM graft.`m$cursors`")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cursors.contains("meta-spec"))
  }

  test("VERSION AS OF on every table = consistent multi-table snapshot") {
    val (_, store) = mountCatalog()
    store.ensureGoverned(Seq("u", "p"))
    // one transact: both tables land at ONE epoch
    store.transact {
      store.upsert("u", Seq((1L, "u1")).toDF("id", "v"), Seq("id"))
      store.upsert("p", Seq((1L, "p1")).toDF("id", "v"), Seq("id"))
    }
    val e = store.snapshot().epoch
    // later writers move both tables on
    store.transact {
      store.upsert("u", Seq((1L, "u2")).toDF("id", "v"), Seq("id"))
      store.upsert("p", Seq((1L, "p2")).toDF("id", "v"), Seq("id"))
    }
    // the pinned join serves the joint-commit view, not a mix
    val rows = spark.sql(
      s"""SELECT u.v AS uv, p.v AS pv
         |FROM graft.u VERSION AS OF $e u
         |JOIN graft.p VERSION AS OF $e p ON u.id = p.id""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq === Seq(("u1", "p1")))
  }

  test("graft-changes reader format: the CDC window through spark.read") {
    val (root, store) = mountCatalog()
    store.ensureGoverned(Seq("c"))
    store.upsert("c", Seq((1L, "a"), (2L, "b")).toDF("id", "v"), Seq("id"))
    val e1 = store.snapshot().epoch
    store.upsert("c", Seq((2L, "b2"), (3L, "x")).toDF("id", "v"), Seq("id"))
    store.deleteByPk("c", Seq(1L).toDF("id"), Seq("id"))

    val got = spark.read.format("graft-changes")
      .option("root", root).option("table", "c").option("pk", "id")
      .option("fromEpoch", e1.toString)
      .load()
      .select(col("id").cast("long"), col("v"), col("_change_type"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    assert(got === Set((2L, "b2", "insert"), (3L, "x", "insert"),
      (1L, "a", "delete")))

    // bounded window: toEpoch caps at the first upsert — no delete yet
    val mid = spark.read.format("graft-changes")
      .option("root", root).option("table", "c").option("pk", "id")
      .option("fromEpoch", e1.toString).option("toEpoch", (e1 + 1).toString)
      .load()
      .select(col("_change_type")).collect().map(_.getString(0))
    assert(mid.nonEmpty && mid.forall(_ == "insert"))

    // the release-diff form: tags name the window's endpoints
    store.tagEpoch("diff-a", Some(e1))
    store.tagEpoch("diff-b", Some(e1 + 1))
    val byTag = spark.read.format("graft-changes")
      .option("root", root).option("table", "c").option("pk", "id")
      .option("fromTag", "diff-a").option("toTag", "diff-b")
      .load().select(col("_change_type")).collect().map(_.getString(0))
    assert(byTag.toSeq === mid.toSeq.sorted || byTag.sorted.toSeq === mid.sorted.toSeq,
      "tag-named window must equal the epoch-named window")
  }

  test("unsupported DDL fails loudly; unknown table is NoSuchTable") {
    val (_, store) = mountCatalog()
    store.ensureGoverned(Seq("t"))
    store.upsert("t", Seq((1L, "a")).toDF("id", "v"), Seq("id"))
    val e = intercept[Exception](
      spark.sql("CREATE TABLE graft.nope (id BIGINT) USING parquet"))
    assert(e.getMessage.toLowerCase.contains("ensure") ||
      e.getMessage.toLowerCase.contains("support"))
    val missing = intercept[Exception](
      spark.sql("SELECT * FROM graft.never_was").collect())
    assert(missing.getMessage.toLowerCase.contains("table") ||
      missing.getMessage.toLowerCase.contains("not found"))
  }
}
