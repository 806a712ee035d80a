package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.store.TableStore

/** The SQL DML surface (UPDATE / MERGE INTO through the
  * [[graft.sql.GraftDml]] extensions seam) promoted into the ORACLE
  * inventory: each query runs the REAL DML statement against a
  * scratch governed copy of a testdata table and returns the table's
  * END STATE, which the DuckDB oracle expresses over the same source
  * parquet in plain ANSI SQL (CASE projection for UPDATE; left-join +
  * filter + union for MERGE's update/delete/insert clauses). This is
  * the difference between "spec-tested" and "oracle-checked": the
  * whole path — catalog resolution, the analyzer rule, the planner
  * strategy, the store's bucketed upsert/retraction, the epoch commit
  * — must produce exactly the rows an independent engine computes.
  *
  * Scale shape: the scratch build is one bucketed upsert of the
  * source table; the UPDATE re-projects only matching rows (O(matched
  * + touched buckets)); the MERGE's one right-outer join is
  * source-batch-sized. Nothing here collects to the driver.
  */
object DmlOps {

  // per-JVM disambiguator so concurrent JVMs never share scratch roots
  private lazy val scratchEra: String =
    java.util.UUID.randomUUID().toString.take(8)

  /** Scratch store per QUERY NAME, mounted as the `graftdml` catalog
    * (the catalog re-reads its root from the live conf per call, so
    * re-pointing it is one conf set — same contract the CLI uses).
    * The root is REUSED across invocations of the same query and
    * wiped at mount, so repeated bench passes keep at most one live
    * scratch copy per query instead of leaking a governed store per
    * run (each prior pass's end-state frame has been consumed by the
    * time its dir is wiped). Requires the session to be built with
    * `spark.sql.extensions=graft.functions.GraftExtensions` (Verify /
    * Bench / the test harness all are).
    */
  private def mountScratch(spark: SparkSession, tag: String): TableStore = {
    val root = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft-dmlop-$scratchEra-$tag")
    if (root.exists()) {
      import java.nio.file.{Files, Path}
      import scala.jdk.CollectionConverters._
      Files.walk(root.toPath).iterator().asScala.toSeq.reverse
        .foreach((p: Path) => Files.deleteIfExists(p))
    }
    root.mkdirs()
    spark.conf.set("spark.sql.catalog.graftdml",
      classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftdml.root", root.toString)
    new TableStore(spark, root.toString)
  }

  // ---------------------------------------------------------------------
  // q_update_where — SQL UPDATE on a bucketed governed table: matching
  // rows re-project and upsert by pk in one epoch; the end state is
  // the CASE projection the oracle writes directly.
  def updateWhere(spark: SparkSession, sfDir: String): DataFrame = {
    val store = mountScratch(spark, "upd")
    store.ensureBucketed("cust", Seq("c_custkey"), 4)
    store.ensureGoverned(Seq("cust"))
    store.upsert("cust", Catalog.table(spark, sfDir, "customer"),
      Seq("c_custkey"))
    spark.sql(
      "UPDATE graftdml.cust SET c_acctbal = c_acctbal + 100.0 " +
        "WHERE c_mktsegment = 'BUILDING'")
    spark.sql(
      "SELECT c_custkey, c_name, c_acctbal FROM graftdml.cust " +
        "ORDER BY c_custkey")
  }

  val updateWhereSql: String =
    """SELECT c_custkey, c_name,
      |  CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal + 100.0
      |       ELSE c_acctbal END AS c_acctbal
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // q_merge_upsert — SQL MERGE with the full clause surface against a
  // bucketed governed copy of customer, sourced from an orders
  // aggregate: heavy customers (≥15 orders) DELETE (the cascade
  // path), the rest UPDATE (acctbal += order count), and a shifted
  // key range INSERTs as new rows (offset 1e9: disjoint from the live
  // key range up to sf ~6000, so no scale factor can make a shifted
  // key MATCH a real customer and diverge from the oracle). End state = left-join CASE +
  // anti-filter + union in the oracle.
  def mergeUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val store = mountScratch(spark, "mrg")
    store.ensureBucketed("cust", Seq("c_custkey"), 4)
    store.ensureGoverned(Seq("cust"))
    store.upsert("cust", Catalog.table(spark, sfDir, "customer"),
      Seq("c_custkey"))
    Catalog.table(spark, sfDir, "orders")
      .createOrReplaceTempView("dml_orders_src")
    // ONE orders aggregation, fanned to both key ranges by a 2-row
    // cross join (offset 0 = the matched range, offset 1e9 = the
    // insert range) — row-for-row the same (k, n) multiset as the
    // former UNION ALL of two identical GROUP BYs, which scanned and
    // aggregated orders twice (Spark has no cross-branch subtree
    // reuse; guide §2.4 / §1.2 step 1: don't compute things twice).
    // Types unchanged: o_custkey BIGINT + offs BIGINT = BIGINT, same
    // as o_custkey + 1000000000. Equivalence proved against the
    // unchanged DuckDB oracle (row-order exact) before adoption.
    spark.sql(
      """MERGE INTO graftdml.cust t
        |USING (
        |  SELECT o_custkey + offs AS k, n
        |  FROM (
        |    SELECT o_custkey, COUNT(*) AS n
        |    FROM dml_orders_src GROUP BY o_custkey
        |  )
        |  CROSS JOIN (VALUES (CAST(0 AS BIGINT)),
        |                     (CAST(1000000000 AS BIGINT))) AS offsets(offs)
        |) s
        |ON t.c_custkey = s.k
        |WHEN MATCHED AND s.n >= 15 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET c_acctbal = t.c_acctbal + s.n
        |WHEN NOT MATCHED THEN INSERT
        |  (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
        |  VALUES (s.k, 'merged', 0, CAST(s.n AS DOUBLE), 'NEW')
        |""".stripMargin)
    spark.sql(
      "SELECT c_custkey, c_name, c_acctbal, c_mktsegment " +
        "FROM graftdml.cust ORDER BY c_custkey")
  }

  val mergeUpsertSql: String =
    """WITH src AS (
      |  SELECT o_custkey AS k, COUNT(*) AS n FROM orders GROUP BY o_custkey
      |)
      |SELECT c.c_custkey, c.c_name,
      |  CASE WHEN s.k IS NOT NULL THEN c.c_acctbal + s.n
      |       ELSE c.c_acctbal END AS c_acctbal,
      |  c.c_mktsegment
      |FROM customer c LEFT JOIN src s ON c.c_custkey = s.k
      |WHERE s.k IS NULL OR s.n < 15
      |UNION ALL
      |SELECT k + 1000000000, 'merged', CAST(n AS DOUBLE), 'NEW' FROM src
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // q_delete_where — SQL DELETE through SupportsDelete: the condition
  // arrives as pushed source filters, the matching keys feed the
  // single-pk retraction cascade, and the end state is the oracle's
  // negated-predicate filter.
  def deleteWhere(spark: SparkSession, sfDir: String): DataFrame = {
    val store = mountScratch(spark, "del")
    store.ensureBucketed("cust", Seq("c_custkey"), 4)
    store.ensureGoverned(Seq("cust"))
    store.upsert("cust", Catalog.table(spark, sfDir, "customer"),
      Seq("c_custkey"))
    spark.sql(
      "DELETE FROM graftdml.cust " +
        "WHERE c_mktsegment = 'MACHINERY' AND c_acctbal < 5000.0")
    spark.sql(
      "SELECT c_custkey, c_name, c_acctbal, c_mktsegment " +
        "FROM graftdml.cust ORDER BY c_custkey")
  }

  val deleteWhereSql: String =
    """SELECT c_custkey, c_name, c_acctbal, c_mktsegment
      |FROM customer
      |WHERE NOT (c_mktsegment = 'MACHINERY' AND c_acctbal < 5000.0)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // q_cdc_multi — transactionally-consistent MULTI-TABLE CDC, oracle-
  // checked: two governed tables, ONE transact upserting changed
  // images into both, one `graft-changes` read over the global window
  // returning the `_table`-tagged union. The never-torn pairing is
  // structural (one epoch window for every member); the oracle
  // recomputes each member's expected change set directly from the
  // source parquet and unions them — the feed must emit EXACTLY the
  // changed rows (carried rows in rewritten buckets never appear), so
  // the row sets match 1:1. Members null-fill each other's columns.
  def cdcMulti(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val store = mountScratch(spark, "cdcm")
    store.ensureBucketed("cust", Seq("c_custkey"), 4)
    store.ensureBucketed("supp", Seq("s_suppkey"), 2)
    store.ensureGoverned(Seq("cust", "supp"))
    val cust = Catalog.table(spark, sfDir, "customer")
    val supp = Catalog.table(spark, sfDir, "supplier")
    store.transact {
      store.upsert("cust", cust, Seq("c_custkey"))
      store.upsert("supp", supp, Seq("s_suppkey"))
    }
    val from = store.currentEpochIfAny.get
    // ONE joint transact: genuinely-changed images in both members
    // (the feed is content-exact — an identical re-upsert would
    // contribute nothing)
    store.transact {
      store.upsert("cust",
        cust.filter(col("c_mktsegment") === "BUILDING")
          .withColumn("c_acctbal", col("c_acctbal") + lit(1.0)),
        Seq("c_custkey"))
      store.upsert("supp",
        supp.withColumn("s_acctbal", col("s_acctbal") + lit(1.0)),
        Seq("s_suppkey"))
    }
    spark.read.format("graft-changes")
      .option("root", store.root).option("tables", "cust,supp")
      .option("pk.cust", "c_custkey").option("pk.supp", "s_suppkey")
      .option("fromEpoch", from.toString)
      .load()
      .select(col("_table"), col("_change_type"),
        col("c_custkey"), col("c_acctbal"),
        col("s_suppkey"), col("s_acctbal"))
      .orderBy(col("_table"), col("c_custkey"), col("s_suppkey"))
  }

  // within each _table group the member's own key is total (the other
  // key is constant NULL), so Spark-vs-DuckDB NULL-ordering rules
  // cannot reorder rows
  val cdcMultiSql: String =
    """SELECT * FROM (
      |  SELECT 'cust' AS _table, 'insert' AS _change_type,
      |    c_custkey, c_acctbal + 1.0 AS c_acctbal,
      |    CAST(NULL AS BIGINT) AS s_suppkey,
      |    CAST(NULL AS DOUBLE) AS s_acctbal
      |  FROM customer WHERE c_mktsegment = 'BUILDING'
      |  UNION ALL
      |  SELECT 'supp', 'insert', NULL, NULL, s_suppkey, s_acctbal + 1.0
      |  FROM supplier
      |)
      |ORDER BY _table, c_custkey, s_suppkey""".stripMargin

  // ---------------------------------------------------------------------
  // q_fts_sql — COMPOSABLE SQL MATCH, oracle-checked end to end: CTAS
  // a governed table WITH its FTS index (index-from-birth,
  // TBLPROPERTIES('fts'=...)), then run a MATCH-in-subquery semi-join
  // + facet ENTIRELY through spark.sql — the graft_fts table function
  // is a real distributed relation (the reference's `*_fts` MATCH
  // subqueries are ordinary SQL composed into larger statements,
  // README.md:212,222-259), not a driver-local CALL result. The
  // oracle states the same MATCH as word-boundary regexes over the
  // source parquet (equivalent to token AND — the q_fts_match
  // equivalence) and recomputes the facet.
  def ftsSql(spark: SparkSession, sfDir: String): DataFrame = {
    mountScratch(spark, "fts")
    Catalog.table(spark, sfDir, "documents")
      .createOrReplaceTempView("fts_docs_src")
    spark.sql(
      "CREATE TABLE graftdml.docs " +
        "TBLPROPERTIES('pk'='doc_id', 'buckets'='4', 'fts'='text') " +
        "AS SELECT doc_id, lang, text FROM fts_docs_src")
    spark.sql(
      """SELECT d.lang, count(*) AS n_docs
        |FROM graftdml.docs d
        |WHERE d.doc_id IN
        |  (SELECT pk FROM graft_fts('graftdml', 'docs', 'spark AND vector'))
        |GROUP BY d.lang
        |ORDER BY d.lang""".stripMargin)
  }

  val ftsSqlSql: String =
    """SELECT lang, COUNT(*) AS n_docs FROM documents
      |WHERE regexp_matches(lower(text), '\bspark\b')
      |  AND regexp_matches(lower(text), '\bvector\b')
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** The WRITE-PATH pins: each invocation builds a governed scratch
    * store and commits epochs — heavy enough (GC, shuffle-dir and FS
    * cache churn) to measurably perturb the next few READ queries'
    * sub-second timings when interleaved. The bench schedules these
    * after every read query (measured: with them interleaved,
    * q_mixture_temperature and friends read ~2× their steady-state;
    * excluded, they return to it exactly).
    */
  def ops: Seq[Op] = Seq(
    Op("q_update_where", updateWhere, Some(updateWhereSql)),
    Op("q_merge_upsert", mergeUpsert, Some(mergeUpsertSql)),
    Op("q_delete_where", deleteWhere, Some(deleteWhereSql)),
    Op("q_cdc_multi", cdcMulti, Some(cdcMultiSql)),
    Op("q_fts_sql", ftsSql, Some(ftsSqlSql)))

  /** Derived, not restated: every DML oracle row IS a write pin — a
    * future fourth row joins the bench's write-last phase
    * automatically instead of silently re-interleaving into the read
    * queries.
    */
  lazy val writePins: Set[String] = ops.map(_.name).toSet
}
